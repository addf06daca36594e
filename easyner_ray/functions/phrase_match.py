"""Token-sequence phrase matcher — the engine's dictionary NER core.

Semantics mirror the reference's spaCy PhraseMatcher usage (reference
``ner_main.py:35-86``): case-insensitive (``attr="LOWER"``) token-sequence
matching that returns **all** matches, including overlapping ones, with char
spans into the (cased) sentence text and surfaces taken from the sentence.

Differences from the reference, by design (SURVEY.md §2.7):
  * spans here are end-EXCLUSIVE ``[start, end)`` — the engine's single
    canonical convention. The reference's dictionary path stores inclusive
    ``(start, end_char-1)`` (``ner_main.py:79-81``); use
    :func:`to_inclusive_spans` when emitting reference-shaped artifacts.
  * tokenization is the engine tokenizer (functions.tokenize), not spaCy's.

The matcher is plain-Python but index-pruned: per token position only the
terms whose first token matches are compared, so cost is
O(tokens x avg_candidates) per sentence. It is built ONCE per actor
(``stages.dict_ner``), never per batch.
"""

from __future__ import annotations

from collections.abc import Iterable

from easyner_ray.functions.tokenize import norm_key, tokenize, tokenize_with_offsets


class PhraseMatcher:
    def __init__(self, terms: Iterable[tuple[str, str]]):
        """``terms``: iterable of (surface_term, cls).

        Besides the span-producing :meth:`find`, the matcher registers each
        distinct (token-sequence, cls) under an integer ``term_id`` with
        precomputed ``term_norm`` / ``term_cls`` arrays — the
        count-only fast path (:meth:`find_term_ids`) used by the
        single-pass KG build, which needs WHICH terms occur (with
        multiplicity) but not where."""
        index: dict[str, list[tuple[tuple[str, ...], int, str, int]]] = {}
        seen: set[tuple[tuple[str, ...], str]] = set()
        self.term_norm: list[str] = []
        self.term_cls: list[str] = []
        for term, cls in terms:
            toks = tuple(t.lower() for t in tokenize(term))
            if not toks:
                continue
            key = (toks, cls)
            if key in seen:
                continue
            seen.add(key)
            tid = len(self.term_norm)
            self.term_norm.append(norm_key(term))
            self.term_cls.append(cls)
            index.setdefault(toks[0], []).append((toks, len(toks), cls, tid))
        # longest-first within a bucket gives (start, end) sorted output cheaply
        for bucket in index.values():
            bucket.sort(key=lambda t: -t[1])
        self._index = index

    def find_term_ids(self, low_tokens: list[str]) -> list[int]:
        """term_ids of all matches (with multiplicity, incl. overlapping)
        in an already-lowercased token list. No offsets, no slicing — the
        hot kernel of the single-pass KG build. The norm a term_id maps to
        is ``norm_key(term)`` (the DICTIONARY term, not the sentence
        slice): identical whenever the sentence separators match the
        term's, and the stabler canonicalization key either way."""
        n = len(low_tokens)
        out: list[int] = []
        index = self._index
        for i, tok in enumerate(low_tokens):
            bucket = index.get(tok)
            if bucket is None:
                continue
            for toks, k, _cls, tid in bucket:
                if i + k > n:
                    continue
                if k == 1 or tuple(low_tokens[i : i + k]) == toks:
                    out.append(tid)
        return out

    def find(self, text: str) -> list[tuple[int, int, str, str]]:
        """All matches in ``text`` as (start, end, surface, cls),
        sorted by (start, end, cls); end-exclusive char offsets."""
        # lowercase the WHOLE text once (C speed) and tokenize the lowered
        # copy — kills the per-token .lower() calls. Offsets stay valid
        # because .lower() is length-preserving for all but a handful of
        # exotic codepoints; the rare length-changing text falls back.
        low_text = text.lower()
        if len(low_text) == len(text):
            low, offsets = tokenize_with_offsets(low_text)
            tokens = low
        else:  # pragma: no cover - e.g. 'İ' expands under .lower()
            tokens, offsets = tokenize_with_offsets(text)
            low = [t.lower() for t in tokens]
        n = len(low)
        index = self._index
        out: list[tuple[int, int, str, str]] = []
        for i, tok in enumerate(low):
            bucket = index.get(tok)
            if bucket is None:
                continue
            for toks, k, cls, _tid in bucket:
                if i + k > n:
                    continue
                if k == 1 or tuple(low[i : i + k]) == toks:
                    start = offsets[i]
                    end = offsets[i + k - 1] + len(tokens[i + k - 1])
                    out.append((start, end, text[start:end], cls))
        out.sort(key=lambda m: (m[0], m[1], m[3]))
        return out


def to_inclusive_spans(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """End-exclusive -> the reference dictionary path's inclusive convention
    (reference ``ner_main.py:79-81``)."""
    return [(s, e - 1) for s, e in spans]


def mention_rows(text: str, matcher: PhraseMatcher) -> list[tuple[int, str, str, str, int, int]]:
    """(mention_idx, surface, norm, cls, start, end) for one sentence."""
    return [
        (idx, surf, norm_key(surf), cls, s, e)
        for idx, (s, e, surf, cls) in enumerate(matcher.find(text))
    ]
