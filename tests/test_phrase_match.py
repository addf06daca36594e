from easyner_ray.functions.phrase_match import PhraseMatcher, to_inclusive_spans
from easyner_ray.functions.tokenize import norm_key, tokenize_with_offsets


def test_overlapping_matches_all_returned():
    m = PhraseMatcher([("actozine", "chemical"), ("actozine acid", "chemical")])
    found = m.find("Dose of actozine acid rose.")
    assert [(s, e, surf) for s, e, surf, _ in found] == [
        (8, 16, "actozine"),
        (8, 21, "actozine acid"),
    ]


def test_case_insensitive_surface_cased():
    m = PhraseMatcher([("abt1", "gene")])
    found = m.find("Gene ABT1 was up.")
    assert found == [(5, 9, "ABT1", "gene")]


def test_hyphenated_term():
    m = PhraseMatcher([("ABT1-beta", "gene"), ("ABT1", "gene")])
    found = m.find("saw ABT1-beta today")
    assert [(s, e) for s, e, _, _ in found] == [(4, 8), (4, 13)]


def test_same_tuple_two_classes():
    m = PhraseMatcher([("alpha", "gene"), ("alpha", "chemical")])
    found = m.find("alpha here")
    assert {f[3] for f in found} == {"gene", "chemical"}
    assert len(found) == 2


def test_inclusive_span_conversion():
    # reference dictionary path stores inclusive (start, end_char-1)
    assert to_inclusive_spans([(8, 16)]) == [(8, 15)]


def test_tokenize_offsets():
    toks, offs = tokenize_with_offsets("ABT1-beta rose.")
    assert toks == ["ABT1", "-", "beta", "rose", "."]
    assert offs == [0, 4, 5, 10, 14]


def test_norm_key():
    assert norm_key("  Chronic   Arvel  SYNDROME ") == "chronic arvel syndrome"
