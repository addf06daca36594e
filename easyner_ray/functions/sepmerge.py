"""Separator-merge mention postprocessing (reference M9).

Reproduces the observable semantics of the reference's
``postprocess_separator_merging.py:24-119``: model NER tends to fragment
entities around ``- ( ) [ ] { }``; the postprocessor

  1. merges two mentions separated by exactly one separator character
     (optionally space-padded) into one mention spanning both;
  2. extends a mention that touches a separator char into the sentence text
     up to the next whitespace/sentence-punctuation boundary (e.g.
     ``ABT1`` + ``-beta`` tail -> ``ABT1-beta``);
  3. drops spans contained inside another span.

Pure per-sentence function; quadratic in mentions-per-sentence (tiny).
Surfaces are re-read from the sentence text after span changes. Merged
mentions keep the FIRST fragment's class.
"""

from __future__ import annotations

from easyner_ray.functions.tokenize import norm_key

SEPARATORS = set("-()[]{}")
_STOP_CHARS = set(" \t\n.,;:!?")


def _merge_pairs(ms: list[dict], text: str) -> list[dict]:
    ms = sorted(ms, key=lambda m: (m["start"], m["end"]))
    out: list[dict] = []
    i = 0
    while i < len(ms):
        cur = dict(ms[i])
        j = i + 1
        while j < len(ms):
            between = text[cur["end"] : ms[j]["start"]]
            if between.strip() in {s for s in SEPARATORS} and len(between) <= 3:
                cur["end"] = ms[j]["end"]
                j += 1
            else:
                break
        out.append(cur)
        i = j
    return out


def _extend_over_separators(m: dict, text: str) -> dict:
    """Extend across separators in BOTH boundary shapes (matching the
    reference's test vectors, ``postprocess_separator_merging.py:153-163``):
    a separator glued just OUTSIDE the span ("ABT1" + "-beta" text) or a
    separator that is the span's own edge char ("no-" -> "no-pq",
    "x-" -> "x-y-z")."""
    start, end = m["start"], m["end"]
    n = len(text)
    # extend right
    while True:
        if end < n and text[end] in SEPARATORS:
            anchor = end + 1  # separator just outside: jump over it
        elif end > start and text[end - 1] in SEPARATORS and end < n \
                and text[end] not in _STOP_CHARS:
            anchor = end      # span ends with a separator: continue the word
        else:
            break
        e = anchor
        while e < n and text[e] not in _STOP_CHARS and text[e] not in SEPARATORS:
            e += 1
        if e == anchor:  # no word after the separator: leave the span alone
            break
        end = e
    # extend left symmetrically
    while True:
        if start > 0 and text[start - 1] in SEPARATORS:
            anchor = start - 1
        elif start < end and text[start] in SEPARATORS and start > 0 \
                and text[start - 1] not in _STOP_CHARS:
            anchor = start
        else:
            break
        s = anchor
        while s > 0 and text[s - 1] not in _STOP_CHARS and text[s - 1] not in SEPARATORS:
            s -= 1
        if s == anchor:  # no word before the separator
            break
        start = s
    if (start, end) == (m["start"], m["end"]):
        return m
    return dict(m, start=start, end=end)


def _drop_contained(ms: list[dict]) -> list[dict]:
    out = []
    for i, m in enumerate(ms):
        contained = any(
            j != i
            and o["start"] <= m["start"]
            and o["end"] >= m["end"]
            and (o["end"] - o["start"]) > (m["end"] - m["start"])
            for j, o in enumerate(ms)
        )
        if not contained:
            out.append(m)
    return out


def separator_merge(mentions: list[dict], text: str) -> list[dict]:
    if not mentions:
        return mentions
    ms = _merge_pairs(mentions, text)
    ms = [_extend_over_separators(m, text) for m in ms]
    ms = _drop_contained(ms)
    # dedupe identical spans created by merging, refresh surfaces/norms
    seen: set[tuple[int, int, str]] = set()
    out: list[dict] = []
    for m in sorted(ms, key=lambda m: (m["start"], m["end"], m["cls"])):
        key = (m["start"], m["end"], m["cls"])
        if key in seen:
            continue
        seen.add(key)
        surface = text[m["start"] : m["end"]]
        out.append(
            dict(m, surface=surface, norm=norm_key(surface), mention_idx=len(out))
        )
    return out
