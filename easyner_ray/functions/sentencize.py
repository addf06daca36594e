"""Rule-based sentence boundary detection with exact char spans.

Replaces the reference's spaCy/NLTK sentence splitters (``splitter.py:13-26``
in the reference) with a deterministic, dependency-free sentencizer whose
spans *tile* the input text: every character of the turn belongs to exactly
one sentence span, so per-turn text equality holds by construction
(``text == "".join(text[s:e] for s, e in spans)``).

Boundary rule: a sentence ends after a run of ``. ! ?`` (plus any closing
quotes/brackets) that is followed by whitespace — the next sentence may
start with ANY non-space character (biomedical prose regularly opens
sentences with lowercase entities: "… inflammation. mTOR primarily …";
requiring an uppercase start cost 2.6% boundary recall against the spaCy
gold, tests/test_golden_reference.py). A period attached to a known
abbreviation or a single capital initial ("Dr.", "e.g.", "J. Smith") does
not split; the initial rule applies only when the single letter is a
whole token — embedded letter-runs ("PI3K.", "NF-κB.") end sentences
normally. Trailing whitespace is attached to the *preceding* sentence
span.

The stored sentence ``text`` column is the span text with trailing
whitespace stripped (what spaCy's ``sent.text`` gives the reference,
``splitter.py:51-67``); ``char_start`` keeps the exact offset into the turn
so reassembly is lossless regardless of inter-sentence whitespace.
"""

from __future__ import annotations

import re

# Sentence-terminating punctuation run, optional closers, then whitespace.
_BOUNDARY_RE = re.compile(r"[.!?]+[\"'”’)\]]*\s+")

ABBREVIATIONS = frozenset(
    {
        "dr", "mr", "mrs", "ms", "prof", "sr", "jr", "st",
        "vs", "etc", "e.g", "i.e", "cf", "al", "fig", "eq",
        "no", "vol", "approx", "dept", "est", "inc", "ltd",
    }
)

_WORD_BEFORE_RE = re.compile(r"([A-Za-z][A-Za-z.]*)\.$")

# longest abbreviation is 6 chars; a 64-char window around the candidate
# period bounds the backwards scan (the old full-prefix regex search made
# every boundary check O(text length))
_ABBR_WINDOW = 64


def _is_abbreviation(text: str, dot_pos: int) -> bool:
    """True if the word ending at ``text[dot_pos] == '.'`` is an
    abbreviation or a single-letter initial. Only the final contiguous
    word is examined (same result as the anchored-regex form: the leftmost
    letter whose letter/dot run reaches the period)."""
    lo = max(0, dot_pos - _ABBR_WINDOW)
    # last WHITESPACE (any kind — text that skipped newline normalization
    # may separate words with \t or \n, not just space) before the period
    sp = max(text.rfind(c, lo, dot_pos) for c in " \t\n\r\x0b\f")
    if sp < 0 and lo > 0:
        return False  # final word longer than any abbreviation
    word_start = sp + 1 if sp >= 0 else lo
    m = _WORD_BEFORE_RE.search(text, word_start, dot_pos + 1)
    if m is None:
        return False
    if m.start() > word_start:
        # the letter run is EMBEDDED in a larger token ("PI3K.", "NF-κB.":
        # digits / non-ASCII before the run) — not an initial, and no
        # abbreviation in the list contains such characters
        return False
    word = m.group(1)
    if len(word) == 1:  # single capital initial: "J. Smith"
        return True
    return word.lower().rstrip(".") in ABBREVIATIONS


def sentencize_spans(text: str) -> list[tuple[int, int]]:
    """Return (start, end) spans tiling ``text`` (end-exclusive).

    Empty / all-whitespace text yields a single span covering it (the
    reference keeps empty abstracts as zero-sentence docs only when the
    loader filtered them; here the filter is a separate stage).
    """
    n = len(text)
    if n == 0:
        return []
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _BOUNDARY_RE.finditer(text):
        end = m.end()  # includes trailing whitespace
        if end >= n:
            break
        if text[m.start()] == "." and _is_abbreviation(text, m.start()):
            continue
        spans.append((start, end))
        start = end
    spans.append((start, n))
    return spans


def sentencize(text: str) -> list[tuple[int, str]]:
    """Return [(char_start, sentence_text)] with trailing whitespace
    stripped from each sentence text. Zero-length sentences are dropped."""
    out: list[tuple[int, str]] = []
    for s, e in sentencize_spans(text):
        sent = text[s:e].rstrip()
        if sent:
            out.append((s, sent))
    return out


def reassemble(sent_texts: list[str], char_starts: list[int], total_len: int | None = None) -> str:
    """Lossless inverse of :func:`sentencize` given char offsets: place each
    sentence at its recorded offset, filling gaps with spaces. When offsets
    are unavailable, callers fall back to the reference's ``" ".join`` rule
    (``convert_easyner_output_json_to_pubtator.py:34-57`` in the reference).
    """
    if not sent_texts:
        return ""
    end = total_len
    if end is None:
        end = char_starts[-1] + len(sent_texts[-1])
    buf = [" "] * end
    for start, sent in zip(char_starts, sent_texts):
        buf[start : start + len(sent)] = sent
    return "".join(buf).rstrip() if total_len is None else "".join(buf)
