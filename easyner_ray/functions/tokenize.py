"""Deterministic tokenizer shared by the sentencizer, the phrase matcher and
the gold-fixture generator.

Token definition (engine spec constant): a maximal run of word characters
``[A-Za-z0-9_]+`` or a single non-space, non-word character. This mirrors the
granularity spaCy's tokenizer gives the reference's PhraseMatcher
(``ner_main.py:35-50`` in the reference) closely enough that token-sequence
phrase matching has the same observable semantics on the fixture corpora.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")


def tokenize_with_offsets(text: str) -> tuple[list[str], list[int]]:
    """Return (tokens, char_start_offsets) for ``text``.

    Offsets index into ``text``; token i covers
    ``text[offsets[i] : offsets[i] + len(tokens[i])]``.
    """
    tokens: list[str] = []
    offsets: list[int] = []
    for m in TOKEN_RE.finditer(text):
        tokens.append(m.group())
        offsets.append(m.start())
    return tokens, offsets


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text)


WHITESPACE_RE = re.compile(r"\s+")


def norm_key(surface: str) -> str:
    """Normalization key for entity canonicalization (SURVEY.md §2.7):
    casefold + whitespace collapse + strip. The reference's merge keys are
    lowercase comparisons (PhraseMatcher ``attr="LOWER"``; eval remap
    ``.lower()``)."""
    return WHITESPACE_RE.sub(" ", surface.casefold()).strip()


# Entity-class remap (reference §2.7: evaluate_ner_pubtatorformat.py:125-158,
# preprocess_pubtatorformat.py:26-70): corpus-specific labels normalized to
# the engine's canonical five classes.
CLASS_REMAP = {
    "molecule": "chemical", "drug": "chemical", "chemical": "chemical",
    "cellline": "cell", "cell_line": "cell", "cell": "cell",
    "protein": "gene", "gene": "gene", "gene_or_protein": "gene",
    "organism": "species", "taxon": "species", "species": "species",
    "disease": "disease", "phenotype": "disease",
}


def remap_class(cls: str) -> str:
    """Lowercased dictionary remap; unknown labels pass through lowercased
    (the reference keeps unmapped labels as-is after ``.lower()``)."""
    low = cls.lower()
    return CLASS_REMAP.get(low, low)
