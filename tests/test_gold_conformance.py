"""The analytic gold (subterm-table derived) must equal an INDEPENDENT
brute-force char-level scan, and the engine matcher must equal the gold —
this is the basis of the triple/mention P/R>=0.95 gate."""

from easyner_ray.functions.phrase_match import PhraseMatcher
from easyner_ray.sources import vocab
from easyner_ray.sources.synthetic import generate_conversation


def brute_force_matches(text: str):
    """Char-level scan: every vocab term, case-insensitive, at positions
    where both ends sit on non-word boundaries. Independent of the
    token-index matcher implementation."""
    low = text.lower()
    hits = set()
    for term, cls in vocab.vocabulary():
        t = term.lower()
        k = len(t)
        i = low.find(t)
        while i != -1:
            before_ok = i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_")
            j = i + k
            after_ok = j >= len(low) or not (low[j].isalnum() or low[j] == "_")
            if before_ok and after_ok:
                hits.add((i, j, cls))
            i = low.find(t, i + 1)
    return hits


def test_analytic_gold_equals_brute_force_and_matcher():
    matcher = PhraseMatcher(vocab.vocabulary())
    n_sent = 0
    for conv_idx in range(24):
        _, sents, ments = generate_conversation(seed=7, conv_idx=conv_idx)
        gold_by_sent = {}
        for cid, ti, si, midx, surf, norm, cls, s, e in ments:
            gold_by_sent.setdefault((ti, si), set()).add((s, e, cls))
        for cid, ti, si, text, _cs in sents:
            n_sent += 1
            gold = gold_by_sent.get((ti, si), set())
            assert brute_force_matches(text) == gold, (conv_idx, ti, si, text)
            engine = {(s, e, cls) for s, e, _surf, cls in matcher.find(text)}
            assert engine == gold, (conv_idx, ti, si, text)
    assert n_sent > 200
