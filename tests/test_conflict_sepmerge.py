from easyner_ray.functions.conflict import resolve_conflicts
from easyner_ray.functions.sepmerge import separator_merge


def _m(start, end, cls="gene", surface=None, idx=0):
    surface = surface or "x" * (end - start)
    return {
        "mention_idx": idx,
        "surface": surface,
        "norm": surface.lower(),
        "cls": cls,
        "start": start,
        "end": end,
    }


def test_identical_span_priority():
    # cell > gene > species > disease > chemical (reference entity_merger2.py:116)
    kept = resolve_conflicts([_m(0, 5, "chemical"), _m(0, 5, "cell")])
    assert len(kept) == 1 and kept[0]["cls"] == "cell"


def test_contained_span_dropped():
    kept = resolve_conflicts([_m(0, 13, "chemical"), _m(0, 8, "chemical")])
    assert len(kept) == 1 and kept[0]["end"] == 13


def test_partial_overlap_shorter_dropped():
    kept = resolve_conflicts([_m(0, 6, "gene"), _m(4, 12, "gene")])
    assert len(kept) == 1 and (kept[0]["start"], kept[0]["end"]) == (4, 12)


def test_disjoint_all_kept_and_reindexed():
    kept = resolve_conflicts([_m(10, 14, idx=7), _m(0, 4, idx=9)])
    assert [(m["start"], m["mention_idx"]) for m in kept] == [(0, 0), (10, 1)]


def test_sepmerge_fragments_joined():
    text = "saw ABT1-beta today"
    ms = [_m(4, 8, "gene", "ABT1"), _m(9, 13, "gene", "beta")]
    out = separator_merge(ms, text)
    assert len(out) == 1
    assert (out[0]["start"], out[0]["end"], out[0]["surface"]) == (4, 13, "ABT1-beta")


def test_sepmerge_extends_over_separator_tail():
    text = "saw ABT1-beta today"
    out = separator_merge([_m(4, 8, "gene", "ABT1")], text)
    assert (out[0]["start"], out[0]["end"], out[0]["surface"]) == (4, 13, "ABT1-beta")


def test_sepmerge_containment_drop():
    text = "alpha beta gamma"
    out = separator_merge([_m(0, 16, "gene"), _m(6, 10, "gene")], text)
    assert len(out) == 1 and out[0]["end"] == 16


def test_sepmerge_idempotent():
    text = "saw ABT1-beta today"
    once = separator_merge([_m(4, 8, "gene", "ABT1"), _m(9, 13, "gene", "beta")], text)
    twice = separator_merge(once, text)
    assert once == twice


def test_sepmerge_reference_vectors():
    """The reference's own inline test vectors
    (postprocess_separator_merging.py:153-163): fragment groups around
    - ( ) [ ] { } resolve to the full joined entities."""
    from easyner_ray.functions.sepmerge import separator_merge

    text2 = ("Co-immunoprecipitation analysis and glutathione-S-transferase "
             "(GST) pull down assay were conducted to analyze the association "
             "between EZH2 and H2BY37ph .")
    ms = [
        {"mention_idx": 0, "surface": "glutathione", "norm": "glutathione",
         "cls": "c", "start": 36, "end": 47},
        {"mention_idx": 1, "surface": "-", "norm": "-", "cls": "c",
         "start": 47, "end": 48},
    ]
    out = separator_merge(ms, text2)
    assert [(m["start"], m["end"], m["surface"]) for m in out] == \
        [(36, 61, "glutathione-S-transferase")]

    text = "ab(de fg]hi jk{lm no-pq rs-tu, vw x-y-z a-b-c. abc d-e-f; gh-ij-kl"
    frags = [("ab", 0, 2), ("(de", 2, 5), ("no-", 18, 21), ("x-", 34, 36),
             ("-z", 37, 39), ("a-", 40, 42), ("-e-", 52, 55), ("gh", 58, 60),
             ("ij-", 61, 64)]
    ms1 = [{"mention_idx": i, "surface": s, "norm": s, "cls": "g",
            "start": a, "end": b} for i, (s, a, b) in enumerate(frags)]
    got = [(m["start"], m["end"], m["surface"]) for m in separator_merge(ms1, text)]
    assert got == [(0, 5, "ab(de"), (18, 23, "no-pq"), (34, 39, "x-y-z"),
                   (40, 45, "a-b-c"), (51, 56, "d-e-f"), (58, 66, "gh-ij-kl")]


def test_wordpiece_detokenize_and_extract():
    """M10/M11 parity with reference entity_parser.py:4-53: X-label
    continuations merge (stripping the ## marker), BIO walk builds
    entities with the separator fixes, trailing open entities drop, text
    reassembles with the punctuation fix table."""
    from easyner_ray.functions.wordpiece import detokenize, extract_entities

    pairs = [
        ("gsk", "B"), ("##1", "X"), ("-", "I"), ("3", "I"), ("binds", "O"),
        ("tsc", "B"), ("##2", "X"), (".", "O"),
    ]
    lw = detokenize(pairs)
    assert lw == [("B", "gsk1"), ("I", "-"), ("I", "3"), ("O", "binds"),
                  ("B", "tsc2"), ("O", ".")]

    out = extract_entities(lw)
    assert out["entities"] == ["gsk1-3", "tsc2"]  # ' - ' -> '-' fix applied
    assert out["has_co_occurrence"] is True
    assert out["text"] == "gsk1-3 binds tsc2."  # ' - '->'-' and ' .'->'.'

    # trailing open entity is dropped (reference walk closes only on 'O')
    out2 = extract_entities([("O", "x"), ("B", "abc"), ("I", "def")])
    assert out2["entities"] == []
    assert out2["has_co_occurrence"] is False

    # single entity -> no co-occurrence
    out3 = extract_entities([("B", "abc"), ("O", "end")])
    assert out3["entities"] == ["abc"]
    assert out3["has_co_occurrence"] is False
