"""Deterministic synthetic entity vocabulary.

The reference ships dictionary term lists (``dictionaries/*.txt``: 807 + 802
+ 5330 terms, multi-word and hyphenated — see reference ``ner_main.py:35-50``)
used by its PhraseMatcher NER. This module *programmatically* builds an
equivalent-shaped vocabulary — multiword terms, hyphenated terms, terms that
are token-prefixes of longer terms (overlap cases), one deliberately hot
entity for skew testing — without copying any reference data.

Everything is a pure function of nothing (module constants), so fixtures,
gold oracles and the engine all see the identical vocabulary.
"""

from __future__ import annotations

from functools import lru_cache

from easyner_ray.functions.tokenize import tokenize, norm_key

CLASSES = ("chemical", "disease", "gene", "species", "cell")

# Entity-class priority for overlap conflict resolution, mirroring the
# reference's priority map (reference entity_merger2.py:116:
# chemical < disease < species < gene < cell — higher wins).
CLASS_PRIORITY = {"chemical": 1, "disease": 2, "species": 3, "gene": 4, "cell": 5}

# The hot entity: appears in a large fraction of conversations (skew anchor,
# cf. the reference's sample analysis where the top chemical hits 1,057
# mentions across 614/999 articles).
HOT_ENTITY = ("zetamycin", "chemical")

_CHEM_PRE = ["acto", "bela", "corti", "dexa", "ergo", "fluvo", "gabo",
             "halo", "ibro", "keto", "lumi", "mira", "novo", "oxa", "pexi"]
_CHEM_SUF = ["zine", "prim", "mab", "cillin", "profen", "statin", "zole",
             "mycin", "sartan", "dipine"]
_DIS_STEM = ["arvel", "brenck", "cortal", "dravin", "elmor", "fessan",
             "grelto", "hollit", "ivrane", "jalkon", "kresp", "lovatt",
             "mendic", "norvel", "ostrin", "pellav", "quorin", "rastol",
             "selvin", "tornel"]
_DIS_KIND = ["syndrome", "fever", "deficiency", "carcinoma"]
_GENE_A = ["ABT", "BRX", "CDL", "DPF", "EGT", "FOXQ", "GRK", "HOXV",
           "IKZ", "JAKL", "KRAV", "LMNX", "MYCQ", "NRAS2", "PTGZ"]
_SPEC_GENUS = ["arvicola", "bromus", "candidula", "drosomya", "erignatha",
               "fulvia", "gastrina", "helvola"]
_SPEC_EPI = ["borealis", "domestica", "minor", "vulgaris", "sylvestris"]
_CELL_STEM = ["astrocyte", "basophil", "chondrocyte", "dendrocyte",
              "ependymal", "fibrocyte", "granulocyte", "histiocyte"]


@lru_cache(maxsize=1)
def vocabulary() -> list[tuple[str, str]]:
    """[(surface_term, cls)] — ~600 terms, deterministic order."""
    terms: list[tuple[str, str]] = [HOT_ENTITY]

    for p in _CHEM_PRE:
        for s in _CHEM_SUF:
            terms.append((p + s, "chemical"))
    # multiword / overlap chemicals: "<chem> acid" contains token-prefix <chem>
    for p in _CHEM_PRE[:8]:
        terms.append((p + _CHEM_SUF[0] + " acid", "chemical"))
    terms.append(("sodium ketozole", "chemical"))

    for st in _DIS_STEM:
        for k in _DIS_KIND:
            terms.append((f"{st} {k}", "disease"))
    # chronic variants: token-suffix overlap with the base disease term
    for st in _DIS_STEM[:10]:
        terms.append((f"chronic {st} syndrome", "disease"))

    for a in _GENE_A:
        for i in (1, 2, 7):
            terms.append((f"{a}{i}", "gene"))
    # hyphenated genes (exercise separator semantics, reference
    # postprocess_separator_merging.py:24-119)
    for a in _GENE_A[:10]:
        terms.append((f"{a}1-beta", "gene"))

    for g in _SPEC_GENUS:
        for e in _SPEC_EPI:
            terms.append((f"{g} {e}", "species"))

    for c in _CELL_STEM:
        terms.append((c, "cell"))
        terms.append((f"{c} cell", "cell"))  # token-prefix overlap with bare stem

    return terms


@lru_cache(maxsize=1)
def token_index() -> dict[str, list[tuple[tuple[str, ...], str, str]]]:
    """first_lower_token -> [(lower_token_tuple, surface_term, cls)]."""
    idx: dict[str, list[tuple[tuple[str, ...], str, str]]] = {}
    for term, cls in vocabulary():
        toks = tuple(t.lower() for t in tokenize(term))
        idx.setdefault(toks[0], []).append((toks, term, cls))
    return idx


@lru_cache(maxsize=1)
def vocab_token_set() -> frozenset[str]:
    """All lowercase tokens that appear in any vocabulary term (used by the
    fixture generator to pick filler words that can never form a term)."""
    toks: set[str] = set()
    for term, _ in vocabulary():
        toks.update(t.lower() for t in tokenize(term))
    return frozenset(toks)


@lru_cache(maxsize=1)
def subterm_table() -> dict[str, list[tuple[int, int, str, str]]]:
    """For each vocabulary term: every vocabulary term that occurs as a
    contiguous token-subsequence of it (including itself).

    Returns term -> [(char_start_in_term, char_end_in_term, sub_surface_as_in_term, sub_cls)].
    Used by the gold-fixture oracle: planting a term implies matches for all
    of its vocabulary subterms (the matcher returns all, possibly
    overlapping, matches — reference PhraseMatcher semantics).
    """
    from easyner_ray.functions.tokenize import tokenize_with_offsets

    by_tokens: dict[tuple[str, ...], list[str]] = {}
    cls_of: dict[str, str] = {}
    for term, cls in vocabulary():
        toks = tuple(t.lower() for t in tokenize(term))
        by_tokens.setdefault(toks, []).append(term)
        cls_of[term] = cls

    table: dict[str, list[tuple[int, int, str, str]]] = {}
    for term, cls in vocabulary():
        toks, offs = tokenize_with_offsets(term)
        low = [t.lower() for t in toks]
        hits: list[tuple[int, int, str, str]] = []
        n = len(low)
        for i in range(n):
            for j in range(i + 1, n + 1):
                sub = tuple(low[i:j])
                if sub in by_tokens:
                    start = offs[i]
                    end = offs[j - 1] + len(toks[j - 1])
                    for match_term in by_tokens[sub]:
                        hits.append((start, end, term[start:end], cls_of[match_term]))
        # dedupe (several vocab entries may share a token tuple)
        hits = sorted(set(hits))
        table[term] = hits
    return table


@lru_cache(maxsize=1)
def alias_table() -> list[tuple[str, str]]:
    """Synthetic NEL alias table: (norm_term, canonical_id).

    Mirrors the reference's TSV term->ID exact-match lookup
    (``nel.py:7-37``): ~70%% of terms mapped, some terms mapped to TWO ids
    (the reference extends *all* matching ids), the rest absent.
    """
    rows: list[tuple[str, str]] = []
    for i, (term, _cls) in enumerate(vocabulary()):
        key = norm_key(term)
        if i % 10 in (3, 7):  # ~20% unmapped
            continue
        rows.append((key, f"K{i:06d}"))
        if i % 17 == 0:  # ambiguous terms with two ids
            rows.append((key, f"K9{i:05d}"))
    return rows
