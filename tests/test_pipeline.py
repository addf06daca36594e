"""End-to-end conformance on the tiny corpus: mentions/triples vs gold,
per-turn text equality, node/edge aggregates vs pandas recomputation."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from easyner_ray.pipelines.kg import build_kg, drop_empty_turns, read_transcripts
from easyner_ray.stages.dict_ner import explode_mentions, tag_mentions
from easyner_ray.stages.nel import link_mentions
from easyner_ray.stages.search import search_sentences
from easyner_ray.stages.splitter import reassemble_turns, split_sentences
from easyner_ray.stages.triples import window_triples
from easyner_ray.sources import vocab


@pytest.fixture(scope="module")
def kg(ray_session, tiny_corpus):
    ts = read_transcripts(tiny_corpus + "/transcripts.parquet")
    return tiny_corpus, build_kg(ts, checkpoint="memory")


def test_sentences_match_gold(ray_session, tiny_corpus):
    ts = read_transcripts(tiny_corpus + "/transcripts.parquet")
    got = split_sentences(drop_empty_turns(ts)).to_pandas()
    gold = pq.read_table(tiny_corpus + "/gold_sentences.parquet").to_pandas()
    key = ["conv_id", "turn_idx", "sent_idx", "text", "char_start"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    gold_s = gold[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, gold_s, check_dtype=False)


def test_per_turn_text_equality(ray_session, tiny_corpus):
    """North-rule invariant: reassembling split sentences in (turn, sent)
    order reproduces every non-empty turn's text exactly."""
    ts = read_transcripts(tiny_corpus + "/transcripts.parquet")
    sentences = split_sentences(drop_empty_turns(ts))
    rebuilt = reassemble_turns(sentences).to_pandas()
    orig = pq.read_table(tiny_corpus + "/transcripts.parquet").to_pandas()
    orig = orig[orig.text != ""][["conv_id", "turn_idx", "text"]]
    merged = orig.merge(rebuilt, on=["conv_id", "turn_idx"], suffixes=("_orig", "_re"))
    assert len(merged) == len(orig)
    assert (merged.text_orig == merged.text_re).all()


def test_mentions_match_gold(kg):
    tiny_corpus, res = kg
    eng = res["mentions"].to_pandas()
    gold = pq.read_table(tiny_corpus + "/gold_mentions.parquet").to_pandas()
    cols = ["conv_id", "turn_idx", "sent_idx", "mention_idx", "surface", "norm", "cls", "start", "end"]
    ke = set(map(tuple, eng[cols].itertuples(index=False)))
    kgold = set(map(tuple, gold[cols].itertuples(index=False)))
    assert ke == kgold


def test_triples_match_gold(kg):
    tiny_corpus, res = kg
    gold_m = pq.read_table(tiny_corpus + "/gold_mentions.parquet").to_pandas()
    expected = set()
    for (cid, ti, si), g in gold_m.groupby(["conv_id", "turn_idx", "sent_idx"]):
        uniq = sorted(set(g["norm"]))
        for a in uniq:
            for b in uniq:
                if a != b:
                    expected.add((a, "co_occurs_with", b, cid, ti, si))
    eng = res["triples"].to_pandas()
    got = set(map(tuple, eng.itertuples(index=False)))
    inter = got & expected
    assert len(inter) / max(1, len(got)) >= 0.95  # precision (is 1.0)
    assert len(inter) / max(1, len(expected)) >= 0.95  # recall (is 1.0)
    assert got == expected


def test_nodes_match_pandas_recompute(kg):
    tiny_corpus, res = kg
    gold_m = pq.read_table(tiny_corpus + "/gold_mentions.parquet").to_pandas()
    exp = (
        gold_m.groupby(["norm", "cls"])
        .agg(n_mentions=("surface", "size"))
        .reset_index()
    )
    nodes = res["nodes"].to_pandas()
    merged = exp.merge(nodes, on=["norm", "cls"], suffixes=("_e", "_g"))
    assert len(merged) == len(exp) == len(nodes)
    assert (merged.n_mentions_e == merged.n_mentions_g).all()
    # aliases contain the observed surfaces
    row = nodes[nodes.norm == nodes.norm.iloc[0]].iloc[0]
    assert isinstance(list(row.aliases), list)


def test_edges_match_pandas_recompute(kg):
    tiny_corpus, res = kg
    triples = res["triples"].to_pandas()
    exp = triples.groupby(["subj", "pred", "obj"]).size().rename("weight").reset_index()
    edges = res["edges"].to_pandas()
    merged = exp.merge(edges, on=["subj", "pred", "obj"], suffixes=("_e", "_g"))
    assert len(merged) == len(exp) == len(edges)
    assert (merged.weight_e == merged.weight_g).all()
    assert edges.subj_id.str.len().eq(16).all()


def test_nel_all_ids_taken_and_empty_for_unmatched(kg):
    tiny_corpus, res = kg
    alias = pq.read_table(tiny_corpus + "/alias.parquet").to_pandas()
    pairs = list(alias.itertuples(index=False))
    linked = link_mentions(res["mentions"], pairs).to_pandas()
    gold_m = pq.read_table(tiny_corpus + "/gold_mentions.parquet").to_pandas()
    exp = gold_m.merge(alias, left_on="norm", right_on="term", how="left")
    exp["entity_id"] = exp["id"].fillna("")
    assert len(linked) == len(exp)
    assert sorted(linked.entity_id) == sorted(exp.entity_id)
    assert (linked.entity_id == "").any()  # some unmatched
    amb = linked.groupby(["conv_id", "turn_idx", "sent_idx", "mention_idx"]).size()
    assert (amb > 1).any()  # some ambiguous terms yield several rows


def test_search_watchlist(kg):
    tiny_corpus, res = kg
    hot = vocab.HOT_ENTITY[0]
    found = search_sentences(res["sentence_mentions"], [hot]).to_pandas()
    gold_m = pq.read_table(tiny_corpus + "/gold_mentions.parquet").to_pandas()
    exp = gold_m[gold_m.norm == hot].groupby(["conv_id", "turn_idx", "sent_idx"]).size()
    assert len(found) == len(exp)
    assert found.n_watch_mentions.sum() == exp.sum()


def test_window_triples_small(ray_session, tiny_corpus):
    ts = read_transcripts(tiny_corpus + "/transcripts.parquet")
    sm = tag_mentions(split_sentences(drop_empty_turns(ts)), vocab.vocabulary())
    mentions = explode_mentions(sm)
    wt = window_triples(mentions, window=1).to_pandas()
    # recompute expected on pandas
    m = mentions.to_pandas()
    expected = set()
    for cid, g in m.groupby("conv_id"):
        turn_norms = {int(ti): set(sub["norm"]) for ti, sub in g.groupby("turn_idx")}
        for ti in turn_norms:
            for tj in turn_norms:
                if ti <= tj <= ti + 1:
                    for a in turn_norms[ti]:
                        for b in turn_norms[tj]:
                            if a != b:
                                expected.add((a, b, cid, ti))
    got = set(map(tuple, wt[["subj", "obj", "conv_id", "turn_idx"]].itertuples(index=False)))
    assert got == expected


def test_model_ner_error_policy(ray_session):
    """Reference ner_main.py:104-108: a per-row inference error yields an
    EMPTY prediction for that row, never a failed task."""
    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.stages.dict_ner import explode_mentions
    from easyner_ray.stages.model_ner import StubModelNER, tag_mentions_model

    class Poisoned(StubModelNER):
        def _predict(self, text):
            if "poison" in text:
                raise RuntimeError("model exploded")
            return super()._predict(text)

    sents = rd.from_arrow(pa.table({
        "conv_id": ["a", "b"], "turn_idx": pa.array([0, 0], pa.int32()),
        "sent_idx": pa.array([0, 0], pa.int32()),
        "text": ["zetamycin is fine", "poison zetamycin row"],
        "char_start": pa.array([0, 0], pa.int32()),
    }))
    sm = sents.map_batches(
        Poisoned, fn_constructor_kwargs={"terms": [("zetamycin", "chemical")]},
        batch_format="pyarrow", batch_size=1, concurrency=(1, 2),
    )
    out = explode_mentions(sm).to_pandas()
    assert sorted(out["conv_id"]) == ["a"]  # poisoned row -> empty, no crash


def test_hot_key_skew_bounded(ray_session):
    """Skew drill (SURVEY.md §4): ONE entity in ~90% of sentences must not
    concentrate the aggregation — the per-batch partial collapse bounds a
    hot key's shuffle rows by the batch count, so nodes/edges stay exact
    and the job completes without a straggler task."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.stages.canonicalize import aggregate_edges, canonical_nodes
    from easyner_ray.stages.dict_ner import explode_mentions, tag_mentions
    from easyner_ray.stages.triples import sentence_triples

    rng = np.random.RandomState(3)
    n = 60_000
    others = [f"othergene{i}" for i in range(50)]
    texts = []
    for i in range(n):
        parts = ["filler", "words", "here"]
        if rng.rand() < 0.9:
            parts.insert(1, "hotentity")          # the skew anchor
        parts.insert(2, others[rng.randint(50)])
        texts.append(" ".join(parts))
    sents = rd.from_arrow(pa.table({
        "conv_id": [f"c{i % 997}" for i in range(n)],
        "turn_idx": pa.array([i // 997 for i in range(n)], pa.int32()),
        "sent_idx": pa.array([0] * n, pa.int32()),
        "text": texts,
        "char_start": pa.array([0] * n, pa.int32()),
    }))
    terms = [("hotentity", "chemical")] + [(o, "gene") for o in others]
    sm = tag_mentions(sents, terms)
    mentions = explode_mentions(sm)
    nodes = canonical_nodes(mentions).to_pandas()
    hot = nodes[nodes["norm"] == "hotentity"]
    assert len(hot) == 1
    total_hot = int(hot["n_mentions"].iloc[0])
    assert 0.88 * n < total_hot < 0.92 * n  # exact count survived the skew
    edges = aggregate_edges(sentence_triples(sm)).to_pandas()
    hot_edges = edges[edges["subj"] == "hotentity"]
    assert len(hot_edges) == 50  # hot entity pairs with every other entity
    assert hot_edges["weight"].sum() == total_hot  # every co-occurrence kept


def test_edge_node_referential_integrity(kg):
    """Every edge endpoint id resolves to a real node (the 'edges resolve
    endpoints by hashing, no join' contract, canonicalize.py)."""
    tiny_corpus, res = kg
    nodes = res["nodes"].to_pandas()
    edges = res["edges"].to_pandas()
    ids = set(nodes.node_id)
    assert set(edges.subj_id) <= ids
    assert set(edges.obj_id) <= ids


def test_vocab_norm_cls_unique():
    """cls_of_norm_map relies on a unique norm->cls in the vocabulary; a
    conflict would make edge endpoint classes ambiguous."""
    from easyner_ray.functions.tokenize import norm_key
    from easyner_ray.sources.vocab import vocabulary

    seen = {}
    for term, cls in vocabulary():
        n = norm_key(term)
        assert seen.setdefault(n, cls) == cls, f"norm {n!r} has classes {seen[n]}, {cls}"


def test_single_pass_referential_integrity(ray_session, tiny_corpus):
    from easyner_ray.pipelines.kg import build_kg_single_pass

    ts = read_transcripts(tiny_corpus + "/transcripts.parquet")
    res = build_kg_single_pass(ts, ner_concurrency=(1, 2))
    nodes = res["nodes"].to_pandas()
    edges = res["edges"].to_pandas()
    ids = set(nodes.node_id)
    assert set(edges.subj_id) <= ids
    assert set(edges.obj_id) <= ids


def test_single_pass_combine_modes_identical(ray_session, tiny_corpus):
    """The tree-reduce final (closed keyspace) and the bucket-shuffle final
    (open keyspace) must produce byte-identical graphs."""
    from easyner_ray.pipelines.kg import build_kg_single_pass

    def frames(res):
        n = res["nodes"].to_pandas().sort_values(["norm", "cls"]).reset_index(drop=True)
        e = res["edges"].to_pandas().sort_values(["subj", "obj"]).reset_index(drop=True)
        return n, e

    ts = read_transcripts(tiny_corpus + "/transcripts.parquet")
    tn, te = frames(build_kg_single_pass(ts, combine="tree"))
    ts2 = read_transcripts(tiny_corpus + "/transcripts.parquet")
    sn, se = frames(build_kg_single_pass(ts2, combine="shuffle"))
    assert tn.equals(sn)
    assert te.equals(se)


def test_single_pass_merges_norm_colliding_terms(ray_session):
    """Two DISTINCT vocabulary terms whose token sequences differ but whose
    norm keys casefold identically ('µM' U+00B5 vs 'μM' U+03BC -> 'μm')
    must produce ONE node row per (norm, cls) with summed n_mentions — in
    BOTH combine modes — matching the staged build's group-by-(norm, cls)
    (round-2 ADVICE, kg.py node partials were keyed by term_id)."""
    import pyarrow as pa

    from easyner_ray.pipelines.kg import build_kg, build_kg_single_pass

    terms = [("µM", "chemical"), ("μM", "chemical"), ("aspirin", "chemical")]
    tbl = pa.table({
        "conv_id": pa.array(["c1"] * 4, pa.string()),
        "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
        "text": pa.array(
            ["Dose was 5 µM here.", "Then 10 μM with aspirin.",
             "Another 2 µM reading.", "No entities at all."], pa.string()),
    })
    ts = rd.from_arrow(tbl)

    for mode in ("tree", "shuffle"):
        res = build_kg_single_pass(rd.from_arrow(tbl), [terms], combine=mode)
        nodes = res["nodes"].to_pandas().sort_values("norm").reset_index(drop=True)
        um = nodes[nodes.norm == "μm"]
        assert len(um) == 1, f"{mode}: duplicate (norm, cls) node rows:\n{nodes}"
        assert int(um.n_mentions.iloc[0]) == 3
        assert len(nodes) == 2  # μm + aspirin

    staged = build_kg(ts, [terms])["nodes"].to_pandas()
    sp = build_kg_single_pass(rd.from_arrow(tbl), [terms])["nodes"].to_pandas()
    a = staged[["norm", "cls", "n_mentions"]].sort_values(["norm", "cls"]).reset_index(drop=True)
    b = sp[["norm", "cls", "n_mentions"]].sort_values(["norm", "cls"]).reset_index(drop=True)
    assert a.equals(b)


def test_window_triples_wide_turn_indices(ray_session):
    """Turn indices past the 20-bit packing limit must take the widening
    np.unique(axis=0) fallback and produce the same triples the packed
    path would (VERDICT r2 #6 — was an assert that aborted the job)."""
    import pyarrow as pa

    base = 1 << 20  # past the packed path's turn_idx range
    rows = [
        ("c1", base + 0, "aspirin"),
        ("c1", base + 0, "ibuprofen"),
        ("c1", base + 1, "aspirin"),
        ("c1", base + 3, "ibuprofen"),  # outside window=2 of turn 0
    ]
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "norm": pa.array([r[2] for r in rows], pa.string()),
    })
    wt = window_triples(rd.from_arrow(tbl), window=2).to_pandas()
    got = set(map(tuple, wt[["subj", "obj", "turn_idx"]].itertuples(index=False)))
    expected = {
        ("aspirin", "ibuprofen", base + 0),   # within turn 0; and 0 -> 1 pair
        ("ibuprofen", "aspirin", base + 0),
        ("aspirin", "ibuprofen", base + 1),   # turn 1 aspirin x turn 3 ibuprofen
    }
    assert got == expected


def test_entity_frequency_batches_max_set_cap(ray_session):
    """max_set bounds the articles_set string (the 100-TB switch) while
    every count stays exact."""
    import pyarrow as pa

    from easyner_ray.stages.analysis import entity_frequency_batches

    convs = [f"conv-{i:07d}" for i in range(6)]
    tbl = pa.table({
        "conv_id": pa.array(convs * 2, pa.string()),
        "norm": pa.array(["tsc1"] * 12, pa.string()),
        "part_id": pa.array([0, 1] * 6, pa.int32()),
    })
    exact = entity_frequency_batches(rd.from_arrow(tbl)).to_pandas()
    capped = entity_frequency_batches(rd.from_arrow(tbl), max_set=3).to_pandas()
    assert exact.articles_set.iloc[0] == ",".join(sorted(convs))
    assert capped.articles_set.iloc[0] == ",".join(sorted(convs)[:3])
    for col in ("total_count", "convs_spanned", "batches_spanned",
                "freq_per_conv", "freq_per_batch"):
        assert capped[col].iloc[0] == exact[col].iloc[0]
