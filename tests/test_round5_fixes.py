"""Round-5 regression tests for the ADVICE findings: empty-corpus
unigram_logprob, stratified_sample negative-id guard, NPMI degenerate
corpus (a pair in every sentence), and cumsum precision under a large
global prefix."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_unigram_logprob_empty_corpus(ray_session):
    """Empty input (or all-empty text) used to hit pa.concat_tables([])
    — ArrowInvalid — on the broadcast path; must return a typed empty
    result instead (SQL parity: no tokens, no groups)."""
    from easyner_ray.ops.textstats import unigram_logprob

    empty = _ds(pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())}))
    out = unigram_logprob(empty)
    assert out.count() == 0
    assert set(out.schema().base_schema.names) == {"doc_id", "n_tokens",
                                                   "logprob"}
    assert out.schema().base_schema.field("doc_id").type == pa.int64()

    # all-whitespace docs: rows exist but the corpus has zero tokens
    blank = _ds(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                          "text": pa.array(["   ", ""], pa.string())}))
    assert unigram_logprob(blank).count() == 0


def test_curate_logprob_filter_empty_upstream(ray_session):
    """The curate logprob_filter step's empty-corpus fallback (return ds
    unchanged) must actually be reachable — upstream steps dropping every
    document used to crash inside unigram_logprob instead."""
    from easyner_ray.pipelines.curate import _step_logprob_filter

    empty = _ds(pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())}))
    assert _step_logprob_filter(empty).count() == 0


def test_stratified_sample_negative_ids_dropped(ray_session):
    """Negative ids are dropped, not wrapped by the uint64 cast (the SQL
    oracle's % keeps the sign; wrapping silently diverges)."""
    from easyner_ray.ops.relational import stratified_sample

    t = pa.table({
        "g": ["a"] * 4 + ["b"] * 4,
        "id": pa.array([1, 2, -3, 4, 5, -6, 7, None], pa.int64()),
    })
    rows = stratified_sample(_ds(t), ["g"], 10, id_col="id").take_all()
    ids = sorted(r["id"] for r in rows)
    assert ids == [1, 2, 4, 5, 7]  # negatives and NULL excluded


def test_npmi_pair_in_every_sentence(ray_session):
    """c_ab == n_sentences makes the NPMI denominator ln(n/c_ab) = 0;
    the engine must emit the defined limit 1.0, not NaN."""
    from easyner_ray import schemas
    from easyner_ray.stages.cooc import npmi_edges

    def m(norm, i):
        return {"mention_idx": i, "surface": norm, "norm": norm,
                "cls": "x", "start": 0, "end": 1}

    tagged = pa.Table.from_pylist([
        {"conv_id": "c0", "turn_idx": 0, "sent_idx": 0,
         "mentions": [m("alpha", 0), m("beta", 1)]},
        {"conv_id": "c0", "turn_idx": 1, "sent_idx": 0,
         "mentions": [m("alpha", 0), m("beta", 1)]},
    ], schema=schemas.SENTENCE_MENTIONS)
    out = {(r["norm_a"], r["norm_b"]): r["npmi"]
           for r in npmi_edges(_ds(tagged), 2).take_all()}
    assert out[("alpha", "beta")] == 1.0


def test_merge_bern2_annotations(tmp_path):
    """BERN2 bare annotation blocks re-attach to gold PubTator text docs
    in order (reference preprocess_BERN2_into_evaluation_ready_format
    notebook); count mismatch raises instead of silently misaligning."""
    from easyner_ray.sources.loaders import merge_bern2_annotations

    gold = tmp_path / "gold.txt"
    gold.write_text("1|t|Title one.\n1|a|Abstract one.\n\n"
                    "2|t|Title two.\n2|a|Abstract two.\n\n",
                    encoding="utf8")
    bern = tmp_path / "bern.txt"
    bern.write_text("1\t0\t5\tTitle\tgene\tG1\n\n"
                    "2\t3\t8\ttwo\tchemical\tC7\n2\t9\t12\tfoo\tgene\tG9\n\n",
                    encoding="utf8")
    out = tmp_path / "merged.txt"
    assert merge_bern2_annotations(str(bern), str(gold), str(out)) == 2
    got = out.read_text(encoding="utf8")
    assert got == ("1|t|Title one.\n1|a|Abstract one.\n"
                   "1\t0\t5\tTitle\tgene\tG1\n\n"
                   "2|t|Title two.\n2|a|Abstract two.\n"
                   "2\t3\t8\ttwo\tchemical\tC7\n2\t9\t12\tfoo\tgene\tG9\n\n")

    import pytest

    short = tmp_path / "short.txt"
    short.write_text("1\t0\t5\tT\tgene\tG1\n\n", encoding="utf8")
    with pytest.raises(ValueError, match="block count"):
        merge_bern2_annotations(str(short), str(gold), str(out))


def test_strip_biored_relations(tmp_path):
    """Relation/NEL lines (non-numeric second field) drop; text lines,
    blank separators and mention lines survive (reference
    remove_NEL_from_biored notebook)."""
    from easyner_ray.sources.loaders import strip_biored_relations

    src = tmp_path / "biored.txt"
    src.write_text(
        "10|t|A title.\n"
        "10|a|An abstract.\n"
        "10\t2\t7\ttitle\tGeneOrGeneProduct\t1017\n"
        "10\tPositive_Correlation\tD007980\tD012964\tNo\n"  # relation: drop
        "10\tAssociation\t1017\tD012964\tNo\n"              # relation: drop
        "\n",
        encoding="utf8")
    out = tmp_path / "clean.txt"
    assert strip_biored_relations(str(src), str(out)) == 4
    assert out.read_text(encoding="utf8") == (
        "10|t|A title.\n10|a|An abstract.\n"
        "10\t2\t7\ttitle\tGeneOrGeneProduct\t1017\n\n")


def test_model_ner_gpu_wiring():
    """The N1 actor-pool spec must forward num_gpus / num_cpus /
    concurrency / batch_size to map_batches verbatim — asserted against a
    recording stub so the GPU path can't silently rot in this CPU-only
    sandbox (map_batches with num_gpus=1/k + concurrency=k is the
    documented per-node GPU sizing)."""
    from easyner_ray.stages.model_ner import StubModelNER, tag_mentions_model

    class RecordingDS:
        def __init__(self):
            self.calls = []

        def map_batches(self, fn, **kw):
            self.calls.append((fn, kw))
            return "sentinel"

    ds = RecordingDS()
    out = tag_mentions_model(ds, model="stub", terms={"gene": ["tp53"]},
                             concurrency=4, batch_size=128,
                             num_cpus=0.5, num_gpus=0.25)
    assert out == "sentinel"
    fn, kw = ds.calls[0]
    assert fn is StubModelNER
    assert kw["num_gpus"] == 0.25 and kw["num_cpus"] == 0.5
    assert kw["concurrency"] == 4 and kw["batch_size"] == 128
    assert kw["batch_format"] == "pyarrow"

    # CPU-only default: num_gpus must be 0, not absent-and-defaulted-weird
    ds2 = RecordingDS()
    tag_mentions_model(ds2, model="stub", terms={})
    assert ds2.calls[0][1]["num_gpus"] == 0


def test_exact_quantiles_cont(ray_session):
    """percentile_cont semantics: matches numpy's linear interpolation
    (the same (n-1)*q rule DuckDB quantile_cont uses), incl. exact-rank
    hits, plus the constant/empty edges."""
    from easyner_ray.ops.sketch import exact_quantiles_cont

    rng = np.random.RandomState(5)
    vals = rng.gamma(2.0, 10.0, 5001)
    ds = _ds(pa.table({"v": pa.array(vals, pa.float64())}))
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = exact_quantiles_cont(ds.repartition(7), "v", qs)
    for q in qs:
        want = float(np.quantile(vals, q))  # linear interpolation
        assert abs(got[q] - want) < 1e-9, (q, got[q], want)

    const = _ds(pa.table({"v": pa.array([3.5] * 10, pa.float64())}))
    assert exact_quantiles_cont(const, "v", [0.5])[0.5] == 3.5
    empty = _ds(pa.table({"v": pa.array([], pa.float64())}))
    assert exact_quantiles_cont(empty, "v", [0.5])[0.5] is None


def test_exact_dedup_incremental(ray_session, tmp_path):
    """Snapshot-side digest index + anti-join probe: a new shard keeps
    only texts the snapshot never saw, with exact_dedup's (min-id rep,
    n_copies) semantics inside the shard."""
    from easyner_ray.ops.dedup import (build_digest_index, exact_dedup,
                                       exact_dedup_incremental)

    old = _ds(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["alpha text", "beta text", "gamma text"],
    }))
    idx = str(tmp_path / "digest_idx")
    build_digest_index(old, idx)

    new = _ds(pa.table({
        "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "text": ["alpha text",      # already in snapshot -> dropped
                 "delta text",      # fresh
                 "delta text",      # in-shard dup of 11
                 "beta text",       # already in snapshot -> dropped
                 "epsilon text"],   # fresh
    }))
    got = sorted((r["doc_id"], r["n_copies"])
                 for r in exact_dedup_incremental(new, idx).take_all())
    assert got == [(11, 2), (14, 1)]

    # empty snapshot == plain exact_dedup
    empty_idx = str(tmp_path / "empty_idx")
    build_digest_index(_ds(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())})), empty_idx)
    inc = sorted((r["doc_id"], r["n_copies"])
                 for r in exact_dedup_incremental(new, empty_idx).take_all())
    plain = sorted((r["doc_id"], r["n_copies"])
                   for r in exact_dedup(new).take_all())
    assert inc == plain


def test_grouped_quantiles_cont(ray_session):
    """Per-group percentile_cont matches numpy per group; empty/all-null
    groups keep value=NULL; constant group short-circuits."""
    from easyner_ray.ops.sketch import grouped_quantiles_cont

    rng = np.random.RandomState(9)
    a, b = rng.rand(501) * 10, rng.rand(260) * 3 + 50
    t = pa.table({
        "g": ["a"] * 501 + ["b"] * 260 + ["null_grp"] * 3 + ["const"] * 5,
        "v": pa.array(list(a) + list(b) + [None, None, float("nan")]
                      + [7.0] * 5, pa.float64()),
    })
    out = grouped_quantiles_cont(_ds(t).repartition(5), "v", [0.5, 0.9],
                                 by="g")
    got = {(r["g"], r["q"]): r["value"] for r in out.to_pylist()}
    for g, vals in (("a", a), ("b", b)):
        for q in (0.5, 0.9):
            assert abs(got[(g, q)] - float(np.quantile(vals, q))) < 1e-9
    assert got[("null_grp", 0.5)] is None
    assert got[("const", 0.9)] == 7.0
    assert len(got) == 8


def test_pack_documents_sharded_budget(ray_session):
    """Shard-local packing: composite (bucket, pack_id) identity, every
    doc accounted for, and within each pack everything except the final
    straddling doc fits the budget (the greedy rule's invariant)."""
    from easyner_ray.ops.textstats import pack_documents

    rng = np.random.RandomState(3)
    n = 400
    texts = [" ".join(["tok"] * int(k)) for k in rng.randint(1, 300, n)]
    docs = _ds(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    budget, n_buckets = 512, 4
    rows = pack_documents(docs, budget, n_buckets=n_buckets).take_all()
    assert len(rows) == n
    assert {r["doc_id"] for r in rows} == set(range(n))
    assert all(0 <= r["bucket"] < n_buckets for r in rows)

    packs: dict = {}
    for r in rows:
        packs.setdefault((r["bucket"], r["pack_id"]), []).append(r)
    assert len(packs) > n_buckets  # actually split into multiple packs
    for members in packs.values():
        members.sort(key=lambda r: r["doc_id"])
        body = sum(r["n_tokens"] for r in members[:-1])
        assert body < budget  # all but the straddler fit
        # every doc STARTS inside its pack's window
        for r in members:
            start = r["cum"] - r["n_tokens"]
            assert start // budget == r["pack_id"]

    # negative ids are dropped, same contract as stratified_sample
    bad = _ds(pa.table({"doc_id": pa.array([-1, 5], pa.int64()),
                        "text": pa.array(["a b", "c d"], pa.string())}))
    kept = pack_documents(bad, 8).take_all()
    assert [r["doc_id"] for r in kept] == [5]


def test_langid_fast_and_wide_paths_agree():
    """LangID's single-key fast path (all code points < 2^11) and the
    lexsort fallback (any wide code point in the batch) must emit
    identical predictions and bit-identical scores for the same docs."""
    from easyner_ray.ops.textstats import LangID

    li = LangID()
    latin = [
        "the quick brown fox jumps over the lazy dog and this is a test",
        "der schnelle braune fuchs springt über den faulen hund und das",
        "le renard brun rapide saute par dessus le chien paresseux et les",
        "", None, "   ",
    ]
    fast_p, fast_s = li.predict(pa.array(latin, pa.string()))
    # adding one CJK doc pushes the WHOLE batch onto the wide path
    wide_p, wide_s = li.predict(pa.array(latin + ["漢字のテキストです"],
                                         pa.string()))
    assert list(fast_p) == list(wide_p[:-1])
    assert list(fast_s) == list(wide_s[:-1])  # bit-equal
    assert fast_p[0] == "en" and fast_p[1] == "de" and fast_p[3] == "und"
    assert fast_s[3] == 0.0 and fast_s[4] == 0.0
    assert wide_p[-1] == "und"  # no Latin trigram overlap


def test_cumsum_precision_late_groups(ray_session):
    """Per-group running sums must not inherit cancellation error from
    the bucket-wide prefix magnitude: with many earlier groups carrying
    huge values, a late group's cumsum must still match its own exact
    sequential sum at float64 grain."""
    from easyner_ray.ops.analytic import partitioned_analytics

    n_big, vals_small = 20000, [0.1, 0.2, 0.3, 0.4]
    t = pa.table({
        "g": ["early"] * n_big + ["late"] * len(vals_small),
        "ord": pa.array(list(range(n_big)) + list(range(len(vals_small))),
                        pa.int64()),
        "v": pa.array([1e12 + i for i in range(n_big)] + vals_small,
                      pa.float64()),
    })
    out = partitioned_analytics(_ds(t), ["g"], ["ord"],
                                [("cumsum", "v", "c")])
    got = sorted((r["ord"], r["c"]) for r in out.take_all()
                 if r["g"] == "late")
    exact = np.cumsum(np.array(vals_small, dtype=np.float64))
    for (_, c), e in zip(got, exact):
        assert abs(c - e) < 1e-9, (c, e)


def test_repetition_stats_kernel(ray_session):
    """Gopher repetition signals: hand-checked fixtures covering line
    dups, top-n-gram tie-break (max count*chars over the tied set),
    5-gram coverage union, and degenerate docs (empty/null/one-token)."""
    from easyner_ray.ops.textstats import repetition_stats

    docs = ["a b a b a b c d e f g h",          # top-2gram 'a b' x3
            "one line\nsame line\nsame line\nother",
            "x y z x y z x y z",                # dup 5grams cover all
            "", "   ", None,
            "unique words only here nothing repeats at all"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = {r["doc_id"]: r for r in repetition_stats(_ds(t)).take_all()}

    # doc 0: 12 tokens, 12 chars; 'a b' count 3, chars 2 -> 6/12
    assert got[0]["top_2gram_char_frac"] == 0.5
    # 'a b a' count 2 chars 3 vs 'b a b' count 2 chars 3 -> 6/12
    assert got[0]["top_3gram_char_frac"] == 0.5
    assert got[0]["dup_line_frac"] == 0.0
    # doc 1: 4 lines, 3 distinct -> 1/4; dup chars 9 of 8+9+9+5=31
    assert got[1]["dup_line_frac"] == 0.25
    assert got[1]["dup_line_char_frac"] == round(9 / 31, 6)
    # doc 2: 'x y z x y' dups at 0/3 (covers [0,8)) and 'y z x y z' at
    # 1/4 (covers [1,9)) -> union is every token
    assert got[2]["dup_5gram_char_frac"] == 1.0
    for d in (3, 4, 5):
        assert all(got[d][c] == 0.0 for c in got[d] if c != "doc_id")
    assert all(got[6][c] == 0.0 for c in got[6] if c != "doc_id")


def test_curate_repetition_filter(ray_session):
    """repetition_filter drops the repetitive doc and keeps the clean
    one; no-cap config is a no-op."""
    from easyner_ray.pipelines.curate import STEPS

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["spam spam spam spam spam spam",
                           "a perfectly ordinary sentence with variety"]})
    out = STEPS["repetition_filter"](_ds(t), max_top_2gram_char_frac=0.5)
    assert [r["doc_id"] for r in out.take_all()] == [2]
    noop = STEPS["repetition_filter"](_ds(t))
    assert noop.count() == 2


def test_minhash_lsh_incremental(ray_session, tmp_path):
    """Bucket-partitioned MinHash snapshot + probe: a new shard's
    near/exact dups of snapshot docs are found; unrelated text is not;
    pairs never point old->old or new->new."""
    from easyner_ray.ops.dedup import build_minhash_index, minhash_lsh_incremental

    old = _ds(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog again and again",
                 "a completely different document about data pipelines",
                 "sorting hashing joining grouping windowing all day long"]}))
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(old, idx)

    new = _ds(pa.table({
        "doc_id": pa.array([11, 12, 13], pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog again and again today",
                 "unrelated fresh text with novel content entirely",
                 "a completely different document about data pipelines"]}))
    got = {(r["doc_new"], r["doc_old"]): r["est_jaccard"]
           for r in minhash_lsh_incremental(new, idx, threshold=0.3).take_all()}
    assert got[(13, 2)] == 1.0           # exact dup -> full agreement
    assert got[(11, 1)] >= 0.3           # near dup passes the gate
    assert all(n in (11, 12, 13) and o in (1, 2, 3) for n, o in got)
    assert (12, 1) not in got and (12, 2) not in got and (12, 3) not in got


def test_curate_incremental_steps(ray_session, tmp_path):
    """dedup_incremental keeps one fresh representative per unseen text;
    near_dup_incremental drops docs that near-dup the snapshot corpus."""
    from easyner_ray.ops.dedup import build_digest_index, build_minhash_index
    from easyner_ray.pipelines.curate import STEPS

    old = _ds(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog again and again",
                 "sorting hashing joining grouping windowing all day long"]}))
    didx = str(tmp_path / "digests")
    midx = str(tmp_path / "minhash")
    build_digest_index(old, didx)
    build_minhash_index(old, midx)

    new = _ds(pa.table({
        "doc_id": pa.array([11, 12, 13, 14], pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog again and again",
                 "fresh novel text one with plenty of unusual words inside",
                 "fresh novel text one with plenty of unusual words inside",
                 "the quick brown fox jumps over the lazy dog again and again today"]}))

    got = sorted(r["doc_id"] for r in
                 STEPS["dedup_incremental"](new, index=didx).take_all())
    assert got == [12, 14]  # 11 known to snapshot; 13 in-shard dup of 12

    got2 = sorted(r["doc_id"] for r in STEPS["near_dup_incremental"](
        new, index=midx, threshold=0.3).take_all())
    assert got2 == [12, 13]  # 11 exact and 14 near dup of snapshot doc 1


def test_knn_self_join(ray_session):
    """ANN self-join sanity: an exact duplicate vector is its twin's
    rank-1 neighbor (tie-broken by id); every row has rank<=k, no
    self-neighbors; neighbors stay within the vector's own IVF cell."""
    from easyner_ray.ops.similarity import knn_self_join

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(40, 8))
    vecs[7] = vecs[3]  # exact twin pair (3, 7)
    t = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                  "embedding": pa.array(list(map(list, vecs)))})
    rows = knn_self_join(_ds(t), k=3, n_centroids=4).take_all()
    by_q = {}
    for r in rows:
        assert r["vec_id"] != r["neighbor_id"]
        assert 1 <= r["rank"] <= 3
        by_q.setdefault(r["vec_id"], {})[r["rank"]] = r["neighbor_id"]
    assert by_q[3][1] == 7 and by_q[7][1] == 3  # twins find each other


def test_dup_span_removal(ray_session):
    """Duplicated ``window``-token spans are cut from every doc (both
    cross-doc and self-repeats); clean docs keep all tokens (whitespace
    normalized); removal counts match coverage."""
    from easyner_ray.ops.dedup import dup_span_removal

    docs = ["alpha beta gamma delta epsilon zeta eta theta",
            "XX alpha beta gamma delta epsilon YY ZZ",
            "totally unique content nothing shared here at all",
            "rep rep rep rep rep rep rep",
            "short one"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": docs})
    got = {r["doc_id"]: (r["text_clean"], r["n_removed"])
           for r in dup_span_removal(_ds(t), window=5).take_all()}
    assert got[0] == ("zeta eta theta", 5)
    assert got[1] == ("XX YY ZZ", 5)
    assert got[2] == ("totally unique content nothing shared here at all", 0)
    assert got[3] == ("", 7)       # self-repeating spans wipe the doc
    assert got[4] == ("short one", 0)


def test_curate_dup_span_step(ray_session):
    """The curate step swaps rewritten text in (other columns survive)
    and drops docs left under min_tokens."""
    from easyner_ray.pipelines.curate import STEPS

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "source": ["s1", "s2", "s3"],
                  "text": ["one two three four five six seven",
                           "one two three four five six eight",
                           "rep rep rep rep rep rep"]})
    out = {r["doc_id"]: r for r in STEPS["dup_span_removal"](
        _ds(t), window=5, min_tokens=1).take_all()}
    assert set(out) == {1, 2}                      # doc 3 fully wiped
    # both (one..five) and (two..six) duplicate across docs 1/2, so
    # coverage reaches token six; only the tail token survives
    assert out[1]["text"] == "seven" and out[1]["source"] == "s1"
    assert out[2]["text"] == "eight" and out[2]["source"] == "s2"


def test_mixture_sample_per_group_rates(ray_session):
    """mixture_sample applies the Knuth-hash Bernoulli gate with a
    PER-GROUP threshold: rate 1.0 keeps everything, 0.0 / missing
    groups drop everything, fractional rates match the hash_sample
    formula; null keys and null groups are excluded."""
    from easyner_ray.ops.relational import mixture_sample

    n = 2000
    ids = pa.array(list(range(n)) + [None], pa.int64())
    grp = pa.array([("a", "b", "c", None)[i % 4] for i in range(n)] + ["a"])
    t = pa.table({"k": ids, "g": grp})
    out = mixture_sample(_ds(t), "k", {"a": 1.0, "b": 0.5},
                         group_col="g").to_pandas()
    # group a: rate 1.0 keeps every non-null-key row
    assert (out["g"] == "a").sum() == n // 4
    # group c (absent) and null group: default 0.0 drops all
    assert not (out["g"] == "c").any() and out["g"].notna().all()
    # group b: exact formula parity
    mask32 = np.uint64(0xFFFFFFFF)
    ks = np.arange(n, dtype=np.uint64)
    h = (ks * np.uint64(2654435761)) & mask32
    want_b = {int(k) for k in ks[(ks % 4 == 1)
                                 & (h < np.uint64(int(0.5 * 2**32)))]}
    assert set(out.loc[out["g"] == "b", "k"]) == want_b


def test_dedup_keep_best_argmax(ray_session):
    """Per distinct text: the highest-score copy survives (ties broken
    by min doc_id), n_copies counts the group; unique texts keep
    themselves with n_copies=1."""
    from easyner_ray.ops.dedup import dedup_keep_best

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": ["aa", "aa", "aa", "bb", "bb", "cc"],
        "score": pa.array([5, 9, 9, 1, 1, 7], pa.int64()),
    })
    got = {r["doc_id"]: (r["score"], r["n_copies"])
           for r in dedup_keep_best(_ds(t), "score").take_all()}
    assert got == {2: (9, 3),   # max score 9, tie 2<3
                   4: (1, 2),   # tie -> min id
                   6: (7, 1)}
    # ascending: worst copy instead
    lo = {r["doc_id"] for r in dedup_keep_best(
        _ds(t), "score", descending=False).take_all()}
    assert lo == {1, 4, 6}


def test_curate_dedup_keep_best_step(ray_session):
    """The step keeps whole rows of the best-scoring representative."""
    from easyner_ray.pipelines.curate import STEPS

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "source": ["s1", "s2", "s3"],
                  "n_chars": pa.array([10, 30, 20], pa.int64()),
                  "text": ["same", "same", "other"]})
    out = {r["doc_id"]: r["source"]
           for r in STEPS["dedup_keep_best"](_ds(t)).take_all()}
    assert out == {2: "s2", 3: "s3"}


def test_write_training_shards_sorted_and_resumable(ray_session, tmp_path):
    """One file per shard, rows inside each file in sort_key order,
    atomic + resumable: a rerun rewrites only missing shards."""
    import os

    import pyarrow.parquet as pq

    from easyner_ray.state.sink import write_training_shards

    n = 500
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": [f"doc {i}" for i in range(n)]})
    root = str(tmp_path / "shards")
    s1 = write_training_shards(_ds(t, 7), root, n_shards=4)
    assert s1["new_shards"] == [0, 1, 2, 3] and s1["rows_written"] == n
    mask32 = np.uint64(0xFFFFFFFF)
    ids = np.arange(n, dtype=np.uint64)
    shard = ((ids * np.uint64(2654435761)) & mask32) % np.uint64(4)
    order = (ids * np.uint64(2246822519)) & mask32
    total = 0
    for s in range(4):
        f = pq.read_table(os.path.join(root, f"shard-{s:05d}.parquet"))
        got = np.asarray(f.column("sort_key"))
        assert (np.diff(got) >= 0).all()            # within-shard order
        want = np.sort(order[shard == s].astype(np.int64))
        assert (got == want).all()                  # exact membership
        total += len(f)
    assert total == n
    # resume: delete one shard, rerun -> only that shard rewritten
    os.remove(os.path.join(root, "shard-00002.parquet"))
    s2 = write_training_shards(_ds(t, 7), root, n_shards=4)
    assert s2["new_shards"] == [2] and sorted(s2["resumed_shards"]) == [0, 1, 3]
    assert len(pq.read_table(os.path.join(root, "shard-00002.parquet"))) == \
        int((shard == 2).sum())


def test_logprob_buckets_terciles(ray_session):
    """Tercile labels: scores >= the 2/3-quantile element are head,
    >= 1/3 middle, rest tail; empty corpus yields a typed empty set."""
    from easyner_ray.ops.textstats import logprob_buckets

    # 9 docs on a smooth quality gradient: doc i mixes i rare tokens
    # into (9 - i) common ones -> 9 distinct logprobs, descending in i
    texts = [" ".join(["common"] * (9 - i) + [f"rare{i}_{j}" for j in range(i)])
             for i in range(9)]
    t = pa.table({"doc_id": pa.array(range(9), pa.int64()), "text": texts})
    out = logprob_buckets(_ds(t, 3)).to_pandas()
    by = dict(zip(out["doc_id"], out["bucket"]))
    # expected via the same quantile_disc rank rule over the scores
    lp = out.set_index("doc_id")["logprob"]
    srt = np.sort(lp.values)
    t1, t2 = srt[int(np.ceil(9 / 3)) - 1], srt[int(np.ceil(18 / 3)) - 1]
    want = {i: ("head" if lp[i] >= t2 else "middle" if lp[i] >= t1 else "tail")
            for i in range(9)}
    assert by == want
    # the gradient makes the split non-degenerate: all three bands occur
    assert {"head", "middle", "tail"} == set(by.values())

    empty = _ds(pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())}))
    got = logprob_buckets(empty)
    assert got.count() == 0
    assert "bucket" in got.schema().base_schema.names


def test_curate_ppl_bucket_step(ray_session):
    """Default keep=[head, middle] drops the tail band, rows survive
    with all their columns."""
    from easyner_ray.pipelines.curate import STEPS

    from easyner_ray.ops.textstats import logprob_buckets

    texts = [" ".join(["common"] * (9 - i) + [f"rare{i}_{j}" for j in range(i)])
             for i in range(9)]
    t = pa.table({"doc_id": pa.array(range(9), pa.int64()),
                  "source": [f"s{i}" for i in range(9)],
                  "text": texts})
    out = STEPS["ppl_bucket"](_ds(t, 2)).to_pandas()
    lab = logprob_buckets(_ds(t)).to_pandas()
    want = sorted(lab.loc[lab["bucket"] != "tail", "doc_id"])
    assert 0 < len(want) < 9              # non-degenerate split
    assert sorted(out["doc_id"]) == want
    assert set(out.columns) == {"doc_id", "source", "text"}


def test_token_budget_subset_matches_window_spec(ray_session):
    """Weighted-refinement cut == the brute window rule (cumsum along
    (h, id) within source <= budget), forced through MULTIPLE histogram
    depths (tiny bins + collect cap) and the boundary-collect tie path;
    keep-all and zero-budget sources behave."""
    from easyner_ray.ops.textstats import token_budget_subset

    rng = np.random.RandomState(11)
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    src = np.array(["a", "b", "c"])[ids % 3]
    toks = rng.randint(1, 40, n)
    texts = [" ".join(["t"] * k) for k in toks]
    t = pa.table({"doc_id": pa.array(ids), "source": pa.array(src),
                  "text": pa.array(texts)})

    def brute(budget):
        h = (ids.astype(np.uint64) * np.uint64(2246822519)) \
            & np.uint64(0xFFFFFFFF)
        keep = set()
        for g in ("a", "b", "c"):
            m = np.flatnonzero(src == g)
            order = m[np.lexsort((ids[m], h[m]))]
            cum = np.cumsum(toks[order])
            keep |= set(ids[order[cum <= budget]].tolist())
        return keep

    for budget in (0, 500, 7000, 10**9):
        got = {r["doc_id"] for r in token_budget_subset(
            _ds(t, 13), budget, n_bins=4, max_depth=12,
            collect_cap=16).take_all()}
        assert got == brute(budget), budget

    # n_tokens rides along on survivors
    out = token_budget_subset(_ds(t, 5), 500).take_all()
    assert all(r["n_tokens"] == toks[r["doc_id"]] for r in out)


def test_snapshot_diff_statuses(ray_session):
    """added / removed / changed classified; unchanged rows dropped;
    empty-new and empty-old edges survive the full_outer short-circuits."""
    from easyner_ray.ops.relational import snapshot_diff

    old = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "fingerprint": ["a", "b", "c", "d"]})
    new = pa.table({"doc_id": pa.array([2, 3, 4, 9], pa.int64()),
                    "fingerprint": ["b", "CHANGED", "d", "z"]})
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(_ds(old, 2), _ds(new, 2)).take_all()}
    assert got == {1: "removed", 3: "changed", 9: "added"}

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "fingerprint": pa.array([], pa.string())})
    assert {r["status"] for r in
            snapshot_diff(_ds(old), _ds(empty)).take_all()} == {"removed"}
    assert {r["status"] for r in
            snapshot_diff(_ds(empty), _ds(new)).take_all()} == {"added"}


def test_curate_token_budget_step(ray_session):
    """The step keeps full rows of each source's budget-window docs."""
    from easyner_ray.pipelines.curate import STEPS
    from easyner_ray.ops.textstats import token_budget_subset

    ids = np.arange(60, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "source": np.array(["a", "b"])[ids % 2].tolist(),
                  "text": [" ".join(["w"] * (3 + int(i) % 5)) for i in ids]})
    out = STEPS["token_budget"](_ds(t, 3), budget=40).to_pandas()
    want = sorted(r["doc_id"] for r in
                  token_budget_subset(_ds(t), 40).take_all())
    assert sorted(out["doc_id"]) == want and 0 < len(want) < 60
    assert set(out.columns) == {"doc_id", "source", "text"}


def test_gopher_signals_and_filter(ray_session):
    """Each Gopher signal fires on a crafted doc; the filter step drops
    exactly the rule violators and keeps a clean doc."""
    from easyner_ray.ops.textstats import gopher_signals
    from easyner_ray.pipelines.curate import STEPS

    clean = ("the quick brown fox jumps over that lazy dog and then "
             "keeps running with steady pace to be sure of it all " * 2)
    docs = {
        0: clean,                                    # passes everything
        1: "short of the and",                       # < min_words
        2: "- one\n- two\n- three\n- four",          # bullet lines
        3: "so… …\nmore …\nlines …",                 # ellipsis-ended
        4: "# # # # # the of and " * 10,             # symbol ratio
        5: "1 2 3 4 5 6 7 8 9 10 " * 10,             # alpha fraction
        6: "lorem ipsum dolor sit amet " * 20,       # < 2 stopword hits
    }
    t = pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": [docs[i] for i in sorted(docs)]})
    sig = {r["doc_id"]: r for r in gopher_signals(_ds(t, 2)).take_all()}
    assert sig[0]["n_words"] == 44 and sig[0]["n_stop_hits"] >= 2
    assert sig[2]["bullet_line_frac"] == 1.0
    assert sig[3]["ellipsis_line_frac"] == 1.0
    assert sig[4]["symbol_word_ratio"] > 0.1
    assert sig[5]["alpha_word_frac"] == 0.0
    assert sig[6]["n_stop_hits"] < 2

    out = STEPS["gopher_filter"](_ds(t, 2), min_words=30).take_all()
    assert [r["doc_id"] for r in out] == [0]


def test_dup_line_removal_both_paths(ray_session):
    """Corpus-duplicated lines are cut in every doc, blank lines and
    unique lines survive in order, a fully-boilerplate doc comes back
    empty — identical output on the broadcast path and the forced
    shuffle (semi-join + bucketed reassembly) path."""
    from easyner_ray.ops.dedup import dup_line_removal

    banner = "COOKIE BANNER ACCEPT ALL"
    footer = "(c) example corp all rights reserved"
    docs = {
        0: f"{banner}\nunique zero content\n\n{footer}",
        1: f"{banner}\nsomething else entirely\n{footer}",
        2: "totally original\n\nno boilerplate here",
        3: f"{banner}\n{footer}",                  # fully wiped
        4: "   \n\t\n",                            # all blank: untouched
    }
    t = pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": [docs[i] for i in sorted(docs)]})
    want = {
        0: ("unique zero content\n", 2),
        1: ("something else entirely", 2),
        2: ("totally original\n\nno boilerplate here", 0),
        3: ("", 2),
        4: ("   \n\t\n", 0),
    }
    for force in (256 << 20, 0):
        got = {r["doc_id"]: (r["text_clean"], r["n_removed"])
               for r in dup_line_removal(
                   _ds(t, 3), broadcast_max_bytes=force).take_all()}
        assert got == want, force


def test_curate_dup_line_step(ray_session):
    """The step swaps cleaned text in, keeps other columns, drops docs
    emptied below min_tokens."""
    from easyner_ray.pipelines.curate import STEPS

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "source": ["s1", "s2", "s3"],
                  "text": ["BANNER\nreal content one",
                           "BANNER\nreal content two",
                           "BANNER"]})
    out = {r["doc_id"]: r for r in STEPS["dup_line_removal"](_ds(t)).take_all()}
    assert set(out) == {1, 2}
    assert out[1]["text"] == "real content one" and out[1]["source"] == "s1"
    assert out[2]["text"] == "real content two"


def test_semdedup_within_cluster_components(ray_session):
    """Near-identical vectors collapse to the min-id rep; orthogonal
    vectors keep themselves; representatives are transitive within a
    cluster (a~b, b~c => one rep)."""
    from easyner_ray.ops.similarity import semdedup

    base = np.eye(4)
    vecs = [base[0], base[0] * 1.01,              # same direction: dup
            base[0] * 0.99 + base[1] * 0.14,      # chains to the above
            base[1], base[2], base[3]]
    t = pa.table({"vec_id": pa.array(range(6), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float32()))})
    # k=1: one cluster, so the test isolates the within-cluster
    # component logic (cosine chain + min-id rep) from the clustering
    out = {r["vec_id"]: r["rep_id"]
           for r in semdedup(_ds(t, 2), k=1, iters=1,
                             threshold=0.95).take_all()}
    # vecs 0/1/2 chain above threshold (0~1 exact, 2 at cos ~0.990)
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    # orthogonal vectors keep themselves
    assert out[3] == 3 and out[4] == 4 and out[5] == 5
    # k=4 splits the space: reps never cross cluster boundaries
    by_cl = {}
    for r in semdedup(_ds(t, 2), k=4, iters=2, threshold=0.95).take_all():
        by_cl.setdefault(r["cluster"], set()).add(r["rep_id"])
        assert r["rep_id"] <= r["vec_id"]


def test_pii_redact_patterns(ray_session):
    """Each PII class becomes its typed placeholder; clean text is
    untouched; kinds subsets apply only the selected patterns."""
    from easyner_ray.pipelines.curate import STEPS

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                  "text": ["mail me at jane.doe+x@example.co.uk today",
                           "server at 192.168.1.255 port 80",
                           "ssn 123-45-6789 on file",
                           "call +1 (555) 123-4567 now",
                           "no pii in this sentence"]})
    out = {r["doc_id"]: r["text"]
           for r in STEPS["pii_redact"](_ds(t, 2)).take_all()}
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "server at <IP> port 80"
    assert out[2] == "ssn <SSN> on file"
    assert out[3] == "call <PHONE> now"
    assert out[4] == "no pii in this sentence"

    only_email = {r["doc_id"]: r["text"] for r in STEPS["pii_redact"](
        _ds(t), kinds=["email"]).take_all()}
    assert only_email[0] == "mail me at <EMAIL> today"
    assert only_email[2] == "ssn 123-45-6789 on file"


def test_embedding_outlier_filter_per_cluster_radius(ray_session):
    """Each cluster keeps its own q-quantile core: a tight cluster's
    outlier is dropped even though its absolute distance is smaller
    than a diffuse cluster's kept members."""
    from easyner_ray.ops.similarity import embedding_outlier_filter

    rng = np.random.RandomState(3)
    tight = np.array([10.0, 0.0]) + rng.normal(0, 0.01, (20, 2))
    tight[0] = [10.5, 0.0]                     # tight-cluster outlier
    diffuse = np.array([-10.0, 0.0]) + rng.normal(0, 2.0, (20, 2))
    vecs = np.vstack([tight, diffuse])
    t = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float64()))})
    kept = {r["vec_id"] for r in embedding_outlier_filter(
        _ds(t, 4), k=2, iters=3, q=0.9).take_all()}
    assert 0 not in kept                      # the planted outlier
    # q=0.9 keeps rank ceil(0.9*20)=18 of each 20-member cluster
    assert len([i for i in kept if i < 20]) == 18
    assert len([i for i in kept if i >= 20]) == 18


def test_bigram_logprob_spec(ray_session):
    """Matches a straight-line recompute of the Laplace bigram spec;
    one-token and empty docs emit no row; empty corpus is typed-empty."""
    import math

    from easyner_ray.ops.textstats import bigram_logprob

    texts = ["the cat sat", "the cat ran", "the", ""]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    got = {r["doc_id"]: (r["n_bigrams"], r["logprob"])
           for r in bigram_logprob(_ds(t, 2)).take_all()}
    # corpus: tokens the(2) cat(2) sat(1) ran(1) + "the"(1) -> the:3
    # V = 4 distinct; bigrams: "the cat" x2, "cat sat", "cat ran"
    c1 = {"the": 3, "cat": 2}
    c12 = {"the cat": 2, "cat sat": 1, "cat ran": 1}
    V = 4

    def lp(b, w1):
        return math.log(c12[b] + 1.0) - math.log(c1[w1] + float(V))

    want0 = round((lp("the cat", "the") + lp("cat sat", "cat")) / 2, 4)
    want1 = round((lp("the cat", "the") + lp("cat ran", "cat")) / 2, 4)
    assert got == {0: (2, want0), 1: (2, want1)}

    empty = _ds(pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())}))
    out = bigram_logprob(empty)
    assert out.count() == 0
    assert "logprob" in out.schema().base_schema.names


def test_epoch_upsample_fractional(ray_session):
    """floor(e) copies for everyone + one extra for the hash-selected
    fraction; e=1 copies once; e<1 downsamples; missing groups drop;
    epoch_idx is 0..reps-1 per row."""
    from easyner_ray.ops.relational import epoch_upsample

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    grp = np.array(["a", "b", "c", "d"])[ids % 4]
    t = pa.table({"doc_id": pa.array(ids), "g": pa.array(grp)})
    out = epoch_upsample(_ds(t, 5), "doc_id",
                         {"a": 2.4, "b": 1.0, "c": 0.5},
                         group_col="g").to_pandas()
    mask32 = np.uint64(0xFFFFFFFF)
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) & mask32
    frac = {"a": 0.4, "b": 0.0, "c": 0.5}
    base = {"a": 2, "b": 1, "c": 0}
    for g in ("a", "b", "c"):
        m = grp == g
        want = base[g] * int(m.sum()) + int(
            (h[m] < np.uint64(int(frac[g] * 2**32))).sum())
        got = (out["g"] == g).sum()
        assert got == want, (g, got, want)
    assert not (out["g"] == "d").any()
    reps = out.groupby("doc_id")["epoch_idx"].agg(["count", "max"])
    assert (reps["max"] == reps["count"] - 1).all()


def test_bpe_merges_spec(ray_session):
    """Merge table matches a hand-computed trace: counts weighted by
    word frequency, non-overlapping pair occurrences, lexicographic
    tie-break, merges compose across ranks."""
    from easyner_ray.ops.textstats import bpe_merges

    # "low" x5, "lower" x2, "lowest" x1  ->  "lo" dominates (8), then
    # "lo"+"w" (8), then "low" is a unit and "loe"? no: "lower" = low,e,r
    t = pa.table({"doc_id": pa.array(range(8), pa.int64()),
                  "text": ["low"] * 5 + ["lower"] * 2 + ["lowest"]})
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe_merges(_ds(t, 3), n_merges=3).to_pylist()]
    assert got[0] == (0, "l", "o", 8)
    assert got[1] == (1, "lo", "w", 8)
    # after "low": "lower"=low,e,r (2x) "lowest"=low,e,s,t (1x)
    # pairs: (low,e)=3, (e,r)=2, (e,s)=1, (s,t)=1 -> (low,e)
    assert got[2] == (2, "low", "e", 3)


def test_bpe_apply_counts(ray_session):
    """Pieces per doc after applying learned merges: fully-merged train
    words collapse to 1 piece; unseen words fall back to characters
    minus applicable merges."""
    from easyner_ray.ops.textstats import bpe_apply

    # merges: l+o -> lo, lo+w -> low
    merges = [("l", "o"), ("lo", "w")]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": ["low low", "lot", "xyz"]})
    got = {r["doc_id"]: (r["n_pieces"], r["n_words"])
           for r in bpe_apply(_ds(t, 2), merges).take_all()}
    assert got[0] == (2, 2)      # "low" -> 1 piece, twice
    assert got[1] == (2, 1)      # "lot" -> lo + t
    assert got[2] == (3, 1)      # no merge applies
