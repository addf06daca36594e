"""Driver-contract query implementations (SURVEY.md §2 inventory).

Every function takes ``sf_dir`` (a /root/testdata/sfX directory) and returns
a Dataset / pandas DataFrame / pyarrow Table. Each has a matching DuckDB
oracle in :mod:`easyner_ray.pipelines.oracles`; column names and dtypes are
kept identical on both sides (floats are rounded to 4 decimals wherever the
value is an aggregate whose summation order differs between engines).

KG queries run over the deterministic synthetic transcript corpus derived
from ``sf_dir`` (BASELINE.json input_hint shape); their oracles read the
analytically-derived GOLD parquet tables — an engine-independent ground
truth (the gold is computed from the generator's construction invariants,
never by running engine code).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rp(sf_dir: str, table: str, columns=None):
    import pyarrow.parquet as pq
    import ray.data as rd

    path = os.path.join(sf_dir, f"{table}.parquet")
    # pandas-written parquet carries b'pandas' schema metadata that makes
    # pa.Schema unhashable in this pyarrow build — Ray then logs a
    # "Failed to hash the schemas" warning per block unification. Read with
    # an explicit metadata-free schema (one local footer read, no extra
    # operator).
    schema = pq.read_schema(path)
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    # Size the block count to the file: Ray's default splits even a 10 MB
    # local file into ~2x num_cpus blocks, and the per-task scheduling
    # overhead on 64 near-empty blocks dominates small-table stages
    # (measured: lineitem read+preagg 2.08 s at 64 blocks vs 0.32 s at 8
    # at sf0.1/32 cpus). One block per ~8 MiB, floor 4; inputs past 4 GiB
    # keep Ray's own sizing (the heuristic only exists to stop tiny files
    # from over-splitting — at scale the default is already right).
    size = os.path.getsize(path)
    kwargs = {}
    if size < (4 << 30):
        kwargs["override_num_blocks"] = max(4, -(-size // (8 << 20)))
    return rd.read_parquet(path, columns=columns,
                           schema=schema.remove_metadata(), **kwargs)


def _round4(t: pa.Table, cols: list[str]) -> pa.Table:
    # Python round(), not pc.round: pyarrow's scaling can return a double
    # one ulp off the nearest representation of the rounded decimal
    # (209.98000000000002 vs DuckDB's 209.98) — which breaks value-hash
    # equality. Applied only to small FINAL aggregate tables.
    for c in cols:
        i = t.schema.get_field_index(c)
        vals = [None if v is None else round(v, 4) for v in t.column(c).to_pylist()]
        t = t.set_column(i, c, pa.array(vals, pa.float64()))
    return t


# ------------------------------------------------------------ relational ---


def agg_lineitem_pricing(sf_dir: str):
    """Two-phase groupby aggregate (A1/A2 analog) on the widest table."""
    from easyner_ray.ops.relational import grouped_agg

    li = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    out = grouped_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("l_extendedprice", "sum", "sum_base_price"),
            ("l_quantity", "mean", "avg_qty"),
            ("l_quantity", "count", "n"),
        ],
        final="tree",  # 6 (flag, status) groups: shuffle-free final
    )
    return out.map_batches(
        lambda t: _round4(t, ["sum_qty", "sum_base_price", "avg_qty"]),
        batch_format="pyarrow",
    )


def join_orders_customer_nation(sf_dir: str):
    """Broadcast two dimension tables into the orders fact stream (J1), then
    a two-phase aggregate per nation."""
    import pyarrow.parquet as pq

    from easyner_ray.ops.relational import broadcast_join, grouped_agg

    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    with_nk = broadcast_join(orders, cust, on="o_custkey", right_key="c_custkey",
                             value_cols=["c_nationkey"])
    with_name = broadcast_join(with_nk, nation, on="c_nationkey", right_key="n_nationkey",
                               value_cols=["n_name"])
    out = grouped_agg(
        with_name,
        ["n_name"],
        [("o_totalprice", "sum", "total_price"), ("o_totalprice", "count", "n_orders")],
        final="tree",  # 25 nations: shuffle-free final
    )
    return out.map_batches(lambda t: _round4(t, ["total_price"]), batch_format="pyarrow")


def top_parts_by_revenue(sf_dir: str):
    """Projection + vectorized derived column + two-phase agg + top-k
    (O2/O3): top 10 parts by discounted revenue."""
    from easyner_ray.ops.relational import grouped_agg

    li = _rp(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.Table.from_arrays([t.column("l_partkey"), rev],
                                    names=["l_partkey", "rev"])

    per_part = grouped_agg(
        li.map_batches(revenue, batch_format="pyarrow"),
        ["l_partkey"],
        [("rev", "sum", "revenue")],
    ).map_batches(lambda t: _round4(t, ["revenue"]), batch_format="pyarrow")
    return per_part.sort(["revenue", "l_partkey"], descending=[True, False]).limit(10)


def orders_priority_count(sf_dir: str):
    from easyner_ray.ops.relational import grouped_agg

    return grouped_agg(
        _rp(sf_dir, "orders", columns=["o_orderpriority"]),
        ["o_orderpriority"],
        [("o_orderpriority", "count", "n")],
        final="tree",  # 5 priorities: shuffle-free final
    )


def semi_join_large_parts(sf_dir: str):
    """Semi-join filter (J4): lineitems of parts with p_size >= 40,
    aggregated per part."""
    import pyarrow.parquet as pq

    from easyner_ray.ops.relational import grouped_agg, semi_join_filter

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_size"])
    big = set(part.filter(pc.greater_equal(part.column("p_size"), 40)).column("p_partkey").to_pylist())
    li = _rp(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    out = grouped_agg(
        semi_join_filter(li, big, on="l_partkey"),
        ["l_partkey"],
        [("l_quantity", "sum", "sum_qty"), ("l_quantity", "count", "n")],
    )
    return out.map_batches(lambda t: _round4(t, ["sum_qty"]), batch_format="pyarrow")


def events_stats(sf_dir: str):
    from easyner_ray.ops.relational import grouped_agg

    out = grouped_agg(
        _rp(sf_dir, "events", columns=["event_type", "value"]),
        ["event_type"],
        [("value", "sum", "sum_value"), ("value", "mean", "avg_value"),
         ("value", "count", "n")],
        final="tree",  # 5 event types: shuffle-free final
    )
    return out.map_batches(lambda t: _round4(t, ["sum_value", "avg_value"]), batch_format="pyarrow")


def events_top_users(sf_dir: str):
    from easyner_ray.ops.relational import grouped_agg

    per_user = grouped_agg(
        _rp(sf_dir, "events", columns=["user_id"]),
        ["user_id"],
        [("user_id", "count", "n")],
    )
    return per_user.sort(["n", "user_id"], descending=[True, False]).limit(20)


def nations_sorted(sf_dir: str):
    """Broadcast join + global sort (small output)."""
    import pyarrow.parquet as pq

    from easyner_ray.ops.relational import broadcast_join

    nation = _rp(sf_dir, "nation")
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    joined = broadcast_join(nation, region, on="n_regionkey", right_key="r_regionkey",
                            value_cols=["r_name"])
    return joined.sort(["r_name", "n_name"]).select_columns(["r_name", "n_name", "n_nationkey"])


# --------------------------------------------------- dedup / text / ANN ----


def dedup_exact_docs(sf_dir: str):
    from easyner_ray.ops.dedup import exact_dedup

    return exact_dedup(_rp(sf_dir, "documents", columns=["doc_id", "text"]))


def dedup_exact_incremental(sf_dir: str):
    """§2.11 incremental exact dedup, end to end: persist the DISTINCT
    text-digest snapshot of HALF the corpus (doc_id % 2 == 0), then
    dedup the other half against it with
    ``ops.dedup.exact_dedup_incremental`` — the 100 TB practice of
    deduping each new crawl against everything already kept without
    rereading the kept corpus. Oracle = per-text min-id/count over the
    new half with a NOT EXISTS against the snapshot half's texts."""
    import shutil
    import tempfile

    from easyner_ray.ops.dedup import (build_digest_index,
                                       exact_dedup_incremental)

    def mod_split(keep_old: bool):
        def f(t: pa.Table, ko=keep_old) -> pa.Table:
            v = t.column("doc_id").combine_chunks().to_numpy(
                zero_copy_only=False)
            mask = (v % 2 == 0)
            return t.filter(pa.array(mask if ko else ~mask))
        return _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
            .map_batches(f, batch_format="pyarrow")

    root = tempfile.mkdtemp(prefix="digest_idx_")
    try:
        build_digest_index(mod_split(True), root)
        # materialize: the snapshot dir is deleted below, so the returned
        # Dataset must not read from it lazily
        return exact_dedup_incremental(mod_split(False), root).materialize()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def doc_stats_q(sf_dir: str):
    from easyner_ray.ops.textstats import doc_stats

    return doc_stats(_rp(sf_dir, "documents", columns=["doc_id", "text"]))


def quality_scores_q(sf_dir: str):
    from easyner_ray.ops.textstats import quality_scores

    return quality_scores(_rp(sf_dir, "documents", columns=["doc_id", "text"]))


def lang_id_q(sf_dir: str):
    from easyner_ray.ops.textstats import lang_id

    return lang_id(_rp(sf_dir, "documents", columns=["doc_id", "text"]))


def docs_epoch_mix(sf_dir: str):
    """Fractional-epoch mixing: src0 seen 2.4x, src1 1.0x, src2 0.5x,
    everything else dropped — exact deterministic up/down-sampling with
    an epoch_idx column for loader interleaving."""
    from easyner_ray.ops.relational import epoch_upsample

    d = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    return epoch_upsample(d, "doc_id",
                          {"src0": 2.4, "src1": 1.0, "src2": 0.5},
                          group_col="source") \
        .select_columns(["doc_id", "source", "epoch_idx"])


def docs_mixture_sample(sf_dir: str):
    """Deterministic source-mixture sampling (Pile/Dolma-style): keep
    80% of src0, 50% of src1, 10% of src2, drop everything else — all
    via the Knuth-hash Bernoulli gate, so the oracle is one SQL CASE."""
    from easyner_ray.ops.relational import mixture_sample

    d = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])
    out = mixture_sample(d, "doc_id",
                         {"src0": 0.8, "src1": 0.5, "src2": 0.1},
                         group_col="source")
    return out.select_columns(["doc_id", "source"])


def docs_split_assign(sf_dir: str):
    """Deterministic train/val/test split (80/10/10 by the Knuth hash of
    doc_id) — the eval-holdout primitive. Map-only; the oracle is one
    SQL CASE over the same integer thresholds (3435973836 / 3865470565,
    the cumulative int(frac * 2^32) values split_assign accumulates)."""
    from easyner_ray.ops.relational import split_assign

    d = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    return split_assign(d, "doc_id",
                        [("train", 0.8), ("val", 0.1), ("test", 0.1)])


def docs_rebalance_sources(sf_dir: str):
    """Rebalance the documents table to a 50/30/20 target mixture over
    src0/src1/src2 (everything else dropped): per-source counts scale
    the shares to the bottleneck source, then the deterministic
    Knuth-hash gate keeps each source's slice."""
    from easyner_ray.ops.relational import rebalance_sources

    d = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    return rebalance_sources(
        d, {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        key="doc_id", group_col="source")


def docs_oov(sf_dir: str):
    """Per-document out-of-vocabulary counts against the corpus's own
    top-20 vocabulary — tokenizer-coverage signal (integer counts only;
    the rate is the caller's division, so no float grain)."""
    from easyner_ray.ops.textstats import oov_counts

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return oov_counts(d, vocab_size=20)


def docs_export_shards(sf_dir: str):
    """Deterministic training-export shuffle: every doc gets a shard
    (independent hash mod 8) and a within-shard order key — map-only,
    no RNG, no all-to-all. The file-writing side of this op
    (state.sink.write_training_shards) is exercised by unit tests; the
    oracle checks the assignment arithmetic."""
    from easyner_ray.ops.relational import export_shards

    d = _rp(sf_dir, "documents", columns=["doc_id"])
    return export_shards(d, "doc_id", 8) \
        .select_columns(["doc_id", "shard", "sort_key"])


def docs_dedup_keep_best(sf_dir: str):
    """Quality-aware exact dedup: per distinct text keep the copy with
    the highest score (ties: min doc_id). The score here is the Knuth
    hash of doc_id — it varies BETWEEN copies of the same text (unlike
    n_chars, identical across copies by construction), so the argmax
    path is genuinely exercised and stays SQL-expressible."""
    import numpy as np

    from easyner_ray.ops.dedup import dedup_keep_best

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def add_score(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("doc_id")).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return t.append_column("score", pa.array(h.astype(np.int64),
                                                 pa.int64()))

    scored = d.map_batches(add_score, batch_format="pyarrow")
    return dedup_keep_best(scored, "score")


def docs_repetition(sf_dir: str):
    """Gopher-style per-doc repetition signals (dup-line fractions,
    top-2/3-gram char fraction, duplicated-5-gram char coverage) — the
    repetition-filter quality features of large-scale curation. Map-only
    vectorized batch kernel; oracle = straight-line per-doc recompute
    (gold_repetition.parquet)."""
    from easyner_ray.ops.textstats import repetition_stats

    _corpus(sf_dir)  # gold table keyed to this sf_dir
    return repetition_stats(_rp(sf_dir, "documents", columns=["doc_id", "text"]))


def rolling_fp_q(sf_dir: str):
    from easyner_ray.ops.textstats import rolling_fingerprints

    return rolling_fingerprints(_rp(sf_dir, "documents", columns=["doc_id", "text"]))


def ngram_jaccard_q(sf_dir: str):
    from easyner_ray.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), threshold=0.2, k=3
    )


def minhash_lsh_q(sf_dir: str):
    from easyner_ray.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), threshold=0.2
    )


def docs_dup_span_removal(sf_dir: str):
    """Substring-level exact dedup (Lee et al. 2021): cut every 8-token
    span occurring >= 2 times corpus-wide out of every document.
    Two-phase bucketed fp count + adaptive semi join + one vectorized
    coverage/rewrite pass. Oracle = straight-line recompute over window
    tuples (gold_dup_span.parquet)."""
    from easyner_ray.ops.dedup import dup_span_removal

    _corpus(sf_dir)  # gold table keyed to this sf_dir
    return dup_span_removal(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), window=8)


def minhash_incremental_q(sf_dir: str):
    """§2.11 incremental NEAR-dup, end to end: sign the even-doc_id half
    of the corpus once into a bucket-partitioned MinHash band index, then
    probe the odd half against it — each probe task reads only its own
    bucket partition; the snapshot is never re-signed or shuffled.
    Oracle = straight-line recompute of the same split + probe spec
    (gold_minhash_incremental.parquet)."""
    import shutil
    import tempfile

    from easyner_ray.ops.dedup import (build_minhash_index,
                                       minhash_lsh_incremental)

    _corpus(sf_dir)  # gold table keyed to this sf_dir

    def mod_split(keep_old: bool):
        def f(t: pa.Table, ko=keep_old) -> pa.Table:
            v = t.column("doc_id").combine_chunks().to_numpy(
                zero_copy_only=False)
            mask = (v % 2 == 0)
            return t.filter(pa.array(mask if ko else ~mask))
        return _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
            .map_batches(f, batch_format="pyarrow")

    root = tempfile.mkdtemp(prefix="minhash_idx_")
    try:
        build_minhash_index(mod_split(True), root)
        return minhash_lsh_incremental(mod_split(False), root,
                                       threshold=0.2).materialize()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def simhash_q(sf_dir: str):
    from easyner_ray.ops.dedup import simhash_pairs

    return simhash_pairs(_rp(sf_dir, "documents", columns=["doc_id", "text"]), max_hamming=3)


def _query_vectors(sf_dir: str, n: int = 4) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n)
    return np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])


def knn_brute_q(sf_dir: str):
    from easyner_ray.ops.similarity import knn_brute

    res = knn_brute(_rp(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                    _query_vectors(sf_dir), k=10)
    return res.select_columns(["query_id", "rank", "vec_id"])  # score float dropped


def knn_ivf_q(sf_dir: str):
    from easyner_ray.ops.similarity import knn_ivf

    return knn_ivf(_rp(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                   _query_vectors(sf_dir), k=10).select_columns(["query_id", "rank", "vec_id"])


def knn_self_q(sf_dir: str):
    """ANN self-join: every embedding's top-5 cosine neighbors inside its
    IVF cell (SemDeDup / clustering primitive). Oracle = straight-line
    recompute of the same cell-local spec (gold_knn_self.parquet)."""
    from easyner_ray.ops.similarity import knn_self_join

    _corpus(sf_dir)  # gold table keyed to this sf_dir
    return knn_self_join(
        _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"]), k=5)


def cosine_pairs_q(sf_dir: str):
    from easyner_ray.ops.similarity import cosine_pairs_brute

    return cosine_pairs_brute(_rp(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                              threshold=0.5)


def approx_distinct_q(sf_dir: str):
    """HLL approximate distinct users per event type (ops.sketch) —
    constant-memory partials, shuffle-free merge; derived-gold oracle."""
    from easyner_ray.ops.sketch import approx_distinct

    return approx_distinct(
        _rp(sf_dir, "events", columns=["event_type", "user_id"]),
        keys=["event_type"], value_col="user_id", p=12,
    )


def cosine_lsh_q(sf_dir: str):
    from easyner_ray.ops.similarity import cosine_near_dup_pairs

    ds = cosine_near_dup_pairs(_rp(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                               threshold=0.5)
    return ds.select_columns(["vec_id_a", "vec_id_b"])


# ------------------------------------------------------------ KG (north) ---


def _corpus(sf_dir: str) -> str:
    from easyner_ray.sources.gold_derived import ensure_derived_gold
    from easyner_ray.sources.synthetic import ensure_for_sf_dir

    corpus = ensure_for_sf_dir(sf_dir)
    if os.path.exists(os.path.join(corpus, "gold_mentions.parquet")):
        ensure_derived_gold(corpus, os.path.join(sf_dir, "documents.parquet"),
                            os.path.join(sf_dir, "embeddings.parquet"),
                            os.path.join(sf_dir, "events.parquet"))
    return corpus


def _transcripts(sf_dir: str):
    import ray.data as rd

    from easyner_ray.pipelines.kg import read_transcripts

    return read_transcripts(os.path.join(_corpus(sf_dir), "transcripts.parquet"))


def _sentences(sf_dir: str):
    from easyner_ray.pipelines.kg import drop_empty_turns
    from easyner_ray.stages.splitter import split_sentences

    return split_sentences(drop_empty_turns(_transcripts(sf_dir)))


_MENTIONS_CACHE: dict = {}
_TRIPLES_CACHE: dict = {}


def _mentions(sf_dir: str):
    """Exploded mention stream — the shared corpus-grain upstream of ~20
    analysis legs. MATERIALIZED + MEMOIZED per (corpus, Ray job), same
    discipline as :func:`_kg_edge_pairs`: a driver session runs those
    legs back to back and each otherwise re-runs the identical
    split -> tag -> explode chain. Payload is the mention table
    (corpus-bounded, ~tens of MB at bench scale, spillable); at 100 TB
    the same amortization is a partitioned-parquet checkpoint through
    the resumable sink instead of an in-session cache."""
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import explode_mentions, tag_mentions

    key = _fused_cache_key(sf_dir)
    hit = _MENTIONS_CACHE.get(key)
    if hit is None:
        hit = explode_mentions(
            tag_mentions(_sentences(sf_dir), vocabulary())).materialize()
        _MENTIONS_CACHE.clear()
        _MENTIONS_CACHE[key] = hit
    return hit


_ASSEMBLED_CACHE: dict = {}


def _assembled_convs(sf_dir: str):
    """Assembled full-dialog documents (conv_id, n_turns, text with the
    default newline sep) — the shared upstream of the conversation-grain
    census legs (C4 line filter, line dedup, minhash near-dup,
    compressibility). MATERIALIZED + MEMOIZED like :func:`_mentions`;
    payload is the corpus text re-keyed to conversations (spillable;
    the 100 TB shape is a partitioned-parquet checkpoint)."""
    from easyner_ray.ops.conversations import assemble_conversations

    key = _fused_cache_key(sf_dir)
    hit = _ASSEMBLED_CACHE.get(key)
    if hit is None:
        hit = assemble_conversations(_transcripts_cols(
            sf_dir, ["conv_id", "turn_idx", "text"])).materialize()
        _ASSEMBLED_CACHE.clear()
        _ASSEMBLED_CACHE[key] = hit
    return hit


def _kg_sentence_triples(sf_dir: str):
    """Sentence-grain co-occurrence triple stream (subj, pred, obj +
    provenance) — the shared upstream of the typed-edge / NPMI /
    activity / evidence / meta-path legs. MATERIALIZED + MEMOIZED like
    :func:`_mentions`; payload is the triple table (sentence x in-vocab
    pair bounded)."""
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import tag_mentions
    from easyner_ray.stages.triples import sentence_triples

    key = _fused_cache_key(sf_dir)
    hit = _TRIPLES_CACHE.get(key)
    if hit is None:
        hit = sentence_triples(
            tag_mentions(_sentences(sf_dir), vocabulary())).materialize()
        _TRIPLES_CACHE.clear()
        _TRIPLES_CACHE[key] = hit
    return hit


def kg_sentences(sf_dir: str):
    return _sentences(sf_dir)


def kg_turn_reassembly(sf_dir: str):
    from easyner_ray.stages.splitter import reassemble_turns

    return reassemble_turns(_sentences(sf_dir))


def kg_mentions(sf_dir: str):
    return _mentions(sf_dir)


def kg_triples(sf_dir: str):
    return _kg_sentence_triples(sf_dir)


def kg_window_triples(sf_dir: str):
    from easyner_ray.stages.triples import window_triples

    return window_triples(_mentions(sf_dir), window=2)


def kg_nodes(sf_dir: str):
    from easyner_ray.stages.canonicalize import canonical_nodes

    nodes = canonical_nodes(_mentions(sf_dir))
    return nodes.select_columns(["node_id", "norm", "cls", "n_mentions"])  # aliases list dropped


def kg_edges(sf_dir: str):
    """Aggregated co-occurrence edge table, served from the FUSED
    single-pass build (:func:`_kg_edges_fused`) — verified value-identical
    to the componentized ``aggregate_edges(sentence_triples(tag_mentions(
    _sentences(...))))`` chain at sf0.01 and sf0.1 (the componentized
    stages stay exercised by the kg_mentions / kg_triples legs and unit
    tests; the edge table itself should come off the throughput path —
    ~6x at sf0.1)."""
    return _kg_edges_fused(sf_dir)


_FUSED_EDGES_CACHE: dict = {}


def _fused_cache_key(sf_dir: str):
    """Corpus identity + Ray job id (a materialized Dataset's object-store
    refs die with the Ray session — same discipline as _kg_edge_pairs)."""
    import ray

    corpus = _corpus(sf_dir)
    path = os.path.join(corpus, "transcripts.parquet")
    st = os.stat(path)
    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = None
    return (path, st.st_mtime_ns, st.st_size, job)


def _kg_edges_fused(sf_dir: str):
    """MEMOIZED full edge table (schemas.EDGES) via the fused
    read -> split+NER+partials -> final single pass
    (``pipelines.kg.build_kg_single_pass``) — the throughput shape every
    graph-analytics leg shares as its upstream. One corpus-sized pass
    total per driver session; the cached payload is the vocab^2-bounded
    edge table (~5 MB at sf0.1)."""
    from easyner_ray.pipelines.kg import build_kg_single_pass

    key = _fused_cache_key(sf_dir)
    hit = _FUSED_EDGES_CACHE.get(key)
    if hit is None:
        hit = build_kg_single_pass(_transcripts(sf_dir))["edges"].materialize()
        _FUSED_EDGES_CACHE.clear()  # one corpus at a time; bound the refs
        _FUSED_EDGES_CACHE[key] = hit
    return hit


_DISTINCT_PAIRS_CACHE: dict = {}


def _kg_distinct_pairs(sf_dir: str):
    """Shared upstream for the PageRank family: DISTINCT directed
    (norm, norm) co-occurrence pairs from the full NER pipeline.
    MEMOIZED per process like :func:`_kg_edge_pairs` (same key: corpus
    identity + Ray job id; payload is the vocab^2-bounded pair table)
    — kg_pagerank and kg_ppr otherwise each re-run the corpus-sized
    upstream back to back in a driver session."""
    from easyner_ray.ops.relational import grouped_agg

    key = _fused_cache_key(sf_dir)  # also ensures gold for this sf_dir
    hit = _DISTINCT_PAIRS_CACHE.get(key)
    if hit is not None:
        return hit
    # distinct (subj, obj) off the memoized FUSED edge table — an edge row
    # exists exactly for each distinct (subj, pred, obj) of the triples,
    # so a vocab^2-bounded grouped distinct over it IS the triple pair set
    pairs = grouped_agg(
        _kg_edges_fused(sf_dir).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("subj"), t.column("obj")], names=["src", "dst"]),
            batch_format="pyarrow"),
        ["src", "dst"], [("src", "count", "__c")],
        final="tree",  # distinct-pair keyspace is vocab^2-bounded
    ).select_columns(["src", "dst"]).materialize()
    _DISTINCT_PAIRS_CACHE.clear()
    _DISTINCT_PAIRS_CACHE[key] = pairs
    return pairs


def kg_pagerank(sf_dir: str):
    """Distributed PageRank over the sentence co-occurrence graph: the
    full NER pipeline feeds DISTINCT directed (norm, norm) pairs into 10
    power iterations (per iteration: one size-gated join, one grouped
    sum, one damping map — driver holds only scalars). Oracle =
    straight-line recompute of the same spec (gold_pagerank.parquet);
    per-iteration rounding makes both sides bit-equal."""
    from easyner_ray.ops.graph import pagerank

    out = pagerank(_kg_distinct_pairs(sf_dir), iters=10)
    return out.map_batches(lambda t: t.rename_columns(["norm", "rank"]),
                           batch_format="pyarrow")


def kg_ppr(sf_dir: str):
    """Personalized PageRank from the watchlist seeds: teleport and
    dangling mass land uniformly on the seed set — relevance ranking
    AROUND the watchlist entities instead of global importance (the
    ranking complement of kg_bfs_hops' hop distances). Oracle =
    straight-line recompute of the same seeded spec
    (gold_ppr.parquet)."""
    from easyner_ray.ops.graph import pagerank

    out = pagerank(_kg_distinct_pairs(sf_dir), iters=10, seeds=WATCHLIST)
    return out.map_batches(lambda t: t.rename_columns(["norm", "rank"]),
                           batch_format="pyarrow")


def kg_edges_npmi(sf_dir: str):
    """Association-normalized co-occurrence edges: NPMI over the sentence
    graph (reference's edges stop at raw evidence counts,
    ``analysis.py``; NPMI is the standard weighting that ranks genuinely
    associated pairs above ubiquitous ones). Pair + single sentence
    counts are bucketed grouped aggregates; both joins are vocab-sized
    broadcast joins under the adaptive gate."""
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.cooc import npmi_edges
    from easyner_ray.stages.dict_ner import tag_mentions

    sents = _sentences(sf_dir).materialize()
    return npmi_edges(tag_mentions(sents, vocabulary()), sents.count())


def kg_pattern_triples(sf_dir: str):
    """Textual-pattern relation extraction: adjacent mention pairs with
    the 1-3 lowercased gap tokens as the predicate (OpenIE-style surface
    heuristic; deterministic stand-in for dependency-pattern RE)."""
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import tag_mentions
    from easyner_ray.stages.triples import pattern_triples

    return pattern_triples(
        tag_mentions(_sentences(sf_dir), vocabulary(), keep_text=True))


def kg_typed_edges(sf_dir: str):
    """Predicate-labeled aggregated KG edges: surface-pattern triples
    grouped into (subj, pred, obj, weight) — the TYPED edge table a
    relation-aware KG consumer ingests (the reference's graph carries
    only co_occurs_with; this aggregates the extracted predicates into
    first-class typed edges). One vocab^2 x predicate-bounded two-phase
    grouped count downstream of the pattern extraction."""
    from easyner_ray.ops.relational import grouped_agg
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import tag_mentions
    from easyner_ray.stages.triples import pattern_triples

    trip = pattern_triples(
        tag_mentions(_sentences(sf_dir), vocabulary(), keep_text=True))
    return grouped_agg(
        trip.map_batches(
            lambda t: t.select(["subj", "pred", "obj"]),
            batch_format="pyarrow"),
        ["subj", "pred", "obj"], [("pred", "count", "weight")])


def kg_entity_freq(sf_dir: str):
    from easyner_ray.stages.analysis import entity_frequency

    return entity_frequency(_mentions(sf_dir))


def kg_top_entities(sf_dir: str):
    from easyner_ray.stages.analysis import top_entities

    return top_entities(_mentions(sf_dir), n=25)


def kg_linked_mentions(sf_dir: str):
    import pyarrow.parquet as pq

    from easyner_ray.stages.nel import link_mentions

    alias = pq.read_table(os.path.join(_corpus(sf_dir), "alias.parquet"))
    pairs = list(zip(alias.column("term").to_pylist(), alias.column("id").to_pylist()))
    return link_mentions(_mentions(sf_dir), pairs)


WATCHLIST = ("zetamycin", "actozine", "arvel syndrome")


def kg_search(sf_dir: str):
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import tag_mentions
    from easyner_ray.stages.search import search_sentences

    sm = tag_mentions(_sentences(sf_dir), vocabulary())
    hits = search_sentences(sm, WATCHLIST)
    return hits.select_columns(["conv_id", "turn_idx", "sent_idx", "n_watch_mentions"])


def kg_doc_spans(sf_dir: str):
    """M8 span re-basing: mentions with turn-level char offsets. The
    sentence's exact ``char_start`` is carried INTO the nested mentions
    table at tag time (keep_cols) and replicated per mention by the
    vectorized explode — re-basing is a pure add with no join, lookup, or
    driver-side state."""
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import explode_mentions, tag_mentions
    from easyner_ray.stages.rebase import rebase_mentions

    sm = tag_mentions(_sentences(sf_dir), vocabulary(), keep_cols=("char_start",))
    rebased = rebase_mentions(explode_mentions(sm))
    return rebased.select_columns(
        ["conv_id", "turn_idx", "sent_idx", "mention_idx", "surface", "norm",
         "cls", "doc_start", "doc_end"]
    )


def kg_triple_prf(sf_dir: str):
    """North-rule gate artifact: engine triples vs gold-derived triples
    P/R/F (single-row table). Gold triples come from the analytic gold
    mentions — engine-independent."""
    import pandas as pd
    import ray.data as rd

    from easyner_ray.stages.metrics import triple_prf

    gold_m = rd.read_parquet(os.path.join(_corpus(sf_dir), "gold_mentions.parquet"))

    def gold_triples_batch(t: pa.Table) -> pa.Table:
        import collections

        by_sent: dict = collections.defaultdict(set)
        for c, ti, si, n in zip(
            t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist(),
            t.column("sent_idx").to_pylist(), t.column("norm").to_pylist(),
        ):
            by_sent[(c, ti, si)].add(n)
        rows = {k: [] for k in ("subj", "pred", "obj", "conv_id", "turn_idx", "sent_idx")}
        for (c, ti, si), norms in by_sent.items():
            u = sorted(norms)
            for a in u:
                for b in u:
                    if a != b:
                        rows["subj"].append(a)
                        rows["pred"].append("co_occurs_with")
                        rows["obj"].append(b)
                        rows["conv_id"].append(c)
                        rows["turn_idx"].append(ti)
                        rows["sent_idx"].append(si)
        from easyner_ray import schemas

        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in schemas.TRIPLES], schema=schemas.TRIPLES
        )

    # A sentence's gold mentions must not split across tasks (pairs between
    # the halves would be lost): bucket on the sentence key first so each
    # group task sees whole sentences.
    from easyner_ray.ops.relational import add_hash_bucket

    bucketed = gold_m.map_batches(
        lambda t: add_hash_bucket(t, ["conv_id", "turn_idx", "sent_idx"], 64),
        batch_format="pyarrow",
    )
    gold_t = bucketed.groupby("__bucket").map_groups(
        lambda t: gold_triples_batch(t), batch_format="pyarrow"
    )
    pred_t = kg_triples(sf_dir)
    res = triple_prf(pred_t, gold_t)
    return pd.DataFrame([res])


def kg_merged_mentions(sf_dir: str):
    """J2/J3 multi-run merge: the vocabulary split across TWO dictionary
    tagger pools, merged per sentence on the composite key. Equals the
    single full-vocabulary pass exactly (dedupe on (start,end,cls)), so
    the gold-mentions oracle applies unchanged."""
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import explode_mentions, tag_mentions
    from easyner_ray.stages.merge import merge_sentence_mentions

    voc = vocabulary()
    half_a, half_b = voc[::2], voc[1::2]
    sents = _sentences(sf_dir)
    a = tag_mentions(sents, half_a)
    b = tag_mentions(_sentences(sf_dir), half_b)
    from easyner_ray.stages.merge import merge_mentions_flat

    return merge_mentions_flat([a, b])


def kg_resolved_mentions(sf_dir: str):
    """O6 conflict resolution over the full tagger output (greedy
    longest/priority/earliest; reference entity_merger2.py:99-146
    semantics). Not SQL-expressible — unit-tested, rows-only here."""
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import explode_mentions
    from easyner_ray.stages.merge import tag_mentions_multi

    sm = tag_mentions_multi(_sentences(sf_dir), [vocabulary()], resolve=True)
    return explode_mentions(sm)


def kg_disambiguated(sf_dir: str):
    """North-star NEL: candidate generation + scored disambiguation
    (actor-pool stage with broadcast alias + stub KB embeddings)."""
    import pyarrow.parquet as pq

    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import tag_mentions
    from easyner_ray.stages.disambiguate import disambiguate_mentions

    alias = pq.read_table(os.path.join(_corpus(sf_dir), "alias.parquet"))
    pairs = list(zip(alias.column("term").to_pylist(), alias.column("id").to_pylist()))
    sm = tag_mentions(_sentences(sf_dir), vocabulary())
    return disambiguate_mentions(sm, pairs).select_columns(
        ["conv_id", "turn_idx", "sent_idx", "mention_idx", "norm", "entity_id"]
    )


def events_hourly(sf_dir: str):
    """Tumbling 1h window aggregate (vectorized floor_temporal key)."""
    from easyner_ray.ops.windows import hourly_rollup

    return hourly_rollup(_rp(sf_dir, "events", columns=["event_type", "ts", "value"]))


def events_hopping(sf_dir: str):
    """Hopping (sliding) 1h windows advancing every 15 min — vectorized
    window-membership explode, then the standard two-phase aggregate."""
    from easyner_ray.ops.windows import hopping_rollup

    return hopping_rollup(
        _rp(sf_dir, "events", columns=["event_type", "ts", "value"]),
        size_s=3600, hop_s=900,
    )


def events_attribution(sf_dir: str):
    """As-of join: each purchase event attributed to the same user's
    latest preceding (or simultaneous) click — DuckDB ASOF JOIN
    semantics, hash-bucketed by user with a per-bucket vectorized
    merge_asof."""
    from easyner_ray.ops.asof import asof_join

    ev = _rp(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type", "value"])
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["user_id", "ts", "event_id", "value"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["user_id", "ts", "event_id"])
    return asof_join(purchases, clicks, key="user_id", ts="ts",
                     left_cols=["event_id", "value"],
                     right_cols=["event_id"], tie_col="event_id")


def events_sessions(sf_dir: str):
    """Session windows (30-min gap) per user — ordered per-user scan
    inside coarse hash buckets."""
    from easyner_ray.ops.windows import user_sessions

    return user_sessions(_rp(sf_dir, "events", columns=["user_id", "event_id", "ts"]))


def kg_entity_freq_per_conv(sf_dir: str):
    """A2 per-article variant: mention counts per (conversation, entity)."""
    from easyner_ray.stages.analysis import entity_frequency_per_conv

    return entity_frequency_per_conv(_mentions(sf_dir))


def kg_entity_freq_batches(sf_dir: str):
    """Reference A1 with the ingest-batch dimension: per-entity counts,
    conv/batch span counts, per-batch frequency and the materialized
    articles_set. The batch id is a deterministic function of the conv's
    numeric suffix (the engine analog of the reference's source-file
    index), computed vectorized on the mention stream."""
    from easyner_ray.stages.analysis import entity_frequency_batches

    N_PARTS = 8

    def add_part(t: pa.Table) -> pa.Table:
        # conv ids are "conv-NNNNNNN": batch = numeric suffix mod N_PARTS
        num = pc.cast(pc.utf8_slice_codeunits(t.column("conv_id"), 5, 12), pa.int32())
        part = pc.subtract(num, pc.multiply(pc.divide(num, N_PARTS), N_PARTS))
        return t.append_column("part_id", part)

    m = _mentions(sf_dir).map_batches(add_part, batch_format="pyarrow")
    return entity_frequency_batches(m)


def kg_edges_incremental(sf_dir: str):
    """§2.11 incremental graph ingest, end to end: build the graph sink
    from HALF the corpus (deterministic conv_id hash split), fold the
    other half in with ``pipelines.incremental.update_graph`` (work ~ new
    shards + graph size, never corpus history), return the updated edges.

    Additive-aggregate exactness (``update(build(A), B) == build(A∪B)``)
    makes this fully SQL-expressible: the oracle is kg_edges' full-corpus
    SQL verbatim — the driver check certifies the incremental path gives
    byte-identical edges to a from-scratch rebuild."""
    import shutil
    import tempfile

    from easyner_ray.ops.relational import add_hash_bucket
    from easyner_ray.pipelines.incremental import update_graph
    from easyner_ray.pipelines.kg import build_kg

    tr = _transcripts(sf_dir)
    bucketed = tr.map_batches(
        lambda t: add_hash_bucket(t, ["conv_id"], 2),
        batch_format="pyarrow").materialize()  # two consumers (the halves)
    half_a = bucketed.filter(expr="__bucket == 0").drop_columns(["__bucket"])
    half_b = bucketed.filter(expr="__bucket == 1").drop_columns(["__bucket"])

    root = tempfile.mkdtemp(prefix="kg_incr_")
    try:
        build_kg(half_a, out_dir=os.path.join(root, "g1"), num_partitions=8)
        upd = update_graph(half_b, os.path.join(root, "g1"),
                           out_dir=os.path.join(root, "g2"),
                           num_partitions=8)
        # materialize: the snapshot dir is deleted below, so the returned
        # Dataset must not read from it lazily
        return upd["edges"].materialize()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def kg_pubtator_roundtrip(sf_dir: str, out_dir: str | None = None):
    """M8+S6 artifact parity: rebased doc-span mentions + reassembled turn
    texts -> PubTator files -> parsed back. The returned mentions must
    equal the doc-span oracle exactly (write->load is lossless)."""
    import tempfile

    from easyner_ray.sources.pubtator_export import (load_pubtator_mentions,
                                                     write_pubtator)
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import explode_mentions, tag_mentions
    from easyner_ray.stages.rebase import rebase_mentions
    from easyner_ray.stages.splitter import reassemble_turns

    sm = tag_mentions(_sentences(sf_dir), vocabulary(), keep_cols=("char_start",))
    rebased = rebase_mentions(explode_mentions(sm))
    turns = reassemble_turns(_sentences(sf_dir))
    # a FRESH directory per invocation: rereading a dir left by an earlier
    # run with different bucketing would mix stale files into the parse
    out = out_dir or tempfile.mkdtemp(prefix="easyner_pubtator_")
    write_pubtator(turns, rebased, out)
    return load_pubtator_mentions(out)


def near_dup_groups(sf_dir: str):
    """Duplicate-cluster closure: exact n-gram Jaccard pairs -> connected
    components -> (doc_id, group_id=min doc id in the cluster). The
    grouping step every dedup pipeline needs after pair generation
    (transitive: A~B, B~C collapse A,B,C even though A,C never compared)."""
    from easyner_ray.ops.dedup import dup_groups, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), threshold=0.2, k=3
    )
    return dup_groups(pairs)


def revenue_by_priority(sf_dir: str):
    """Big-big hash-shuffle join (fact x fact): lineitem revenue joins its
    order on orderkey — neither side is broadcastable at scale — then a
    two-phase aggregate per order priority.

    The lineitem side is partially aggregated per orderkey INSIDE each
    batch before the join (sum is associative across the later per-
    priority rollup), so the all-to-all join shuffle moves ~1 row per
    order instead of ~4 rows per lineitem — the push-agg-below-join
    shape that matters most at 100 TB, where the join shuffle is the
    single largest data movement in the query.

    The join itself is ADAPTIVE (``relational.adaptive_join``): at bench
    scale the pruned orders side is a few MB, so it broadcasts (zero
    shuffle, no join-aggregator actor startup — measured 1.8 s -> ~0.5 s
    at sf0.1); above the 64 MB gate it takes the same hash-shuffle path
    as before. ``tests/test_round4b_ops.py`` pins both paths identical."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def rev_per_order(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = (pa.Table.from_arrays([t.column("l_orderkey"), rev],
                                  names=["l_orderkey", "rev"])
             .group_by(["l_orderkey"]).aggregate([("rev", "sum"), ("rev", "count")]))
        return pa.Table.from_arrays(
            [g.column("l_orderkey"), g.column("rev_sum"),
             g.column("rev_count").cast(pa.int64())],
            names=["l_orderkey", "rev", "n_li"],
        )

    joined = adaptive_join(
        li.map_batches(rev_per_order, batch_format="pyarrow"),
        orders, on="l_orderkey", right_on="o_orderkey",
        # partition count sized from the pruned reads (metadata-cheap);
        # the pre-agg only shrinks the left side, so this upper-bounds it
        approx_bytes=li.size_bytes() + orders.size_bytes(),
    )

    out = grouped_agg(joined.select_columns(["o_orderpriority", "rev", "n_li"]),
                      ["o_orderpriority"],
                      [("rev", "sum", "revenue"), ("n_li", "sum", "n")],
                      final="tree")  # 5 priorities: shuffle-free final
    return out.map_batches(lambda t: _round4(t, ["revenue"]), batch_format="pyarrow")


def events_top_value_per_type(sf_dir: str):
    """Per-group top-k (the row_number() window pattern Ray Data lacks):
    top 5 events by value within each event_type, ties broken by
    event_id — phase-1 per-batch top-k bounds the shuffle to k rows per
    (group, batch)."""
    from easyner_ray.ops.relational import topk_per_group

    ev = _rp(sf_dir, "events", columns=["event_type", "event_id", "value"])
    return topk_per_group(ev, ["event_type"], "value", 5,
                          tie_cols=["event_id"])


def orders_hash_sample(sf_dir: str):
    """Deterministic multiplicative-hash Bernoulli sample (~5% of orders):
    the reproducible train/holdout-split primitive — map-only, no RNG
    state, bit-identical across engines (the oracle IS the same
    arithmetic in SQL)."""
    from easyner_ray.ops.relational import hash_sample

    o = _rp(sf_dir, "orders",
            columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return hash_sample(o, "o_orderkey", 0.05)


def customers_without_orders(sf_dir: str):
    """Anti join (complement of the J4 subset filter): customers with no
    URGENT order — Ray-native ``left_anti`` hash-shuffle join, both sides
    partitioned on the key. (Restricted to urgent orders so the result is
    non-empty on the synthetic data — a 0-row pass certifies nothing.)"""
    from easyner_ray.ops.relational import anti_join

    c = _rp(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    o = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]) \
        .filter(expr="o_orderpriority == '1-URGENT'") \
        .select_columns(["o_custkey"])
    return anti_join(c, o, on="c_custkey", right_on="o_custkey",
                     approx_bytes=c.size_bytes())


def _promo_intervals(sf_dir: str) -> pa.Table:
    """Deterministic interval table derived from nation (no external
    data): window k starts 2024-01-02 + (k%9)*3 days + k hours, spans 36
    hours — overlapping, covering the events ts range."""
    import datetime
    import pyarrow.parquet as pq

    nk = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                       columns=["n_nationkey"]
                       ).column("n_nationkey").cast(pa.int64()).to_pylist()
    hour = 3_600_000_000
    day = 24 * hour
    base = int((datetime.datetime(2024, 1, 2)
                - datetime.datetime(1970, 1, 1)).total_seconds()) * 1_000_000
    starts = [base + (k % 9) * 3 * day + k * hour for k in nk]
    return pa.Table.from_arrays(
        [pa.array(nk, pa.int64()),
         pa.array(starts, pa.timestamp("us")),
         pa.array([s + 36 * hour for s in starts], pa.timestamp("us"))],
        names=["interval_id", "t_start", "t_end"])


def events_in_promo_windows(sf_dir: str):
    """Range (interval-containment) join: every event paired with every
    promo window containing its timestamp — time-bucketed broadcast
    theta-join (ops.asof.interval_join)."""
    from easyner_ray.ops.asof import interval_join

    ev = _rp(sf_dir, "events", columns=["event_id", "ts"])
    return interval_join(ev, _promo_intervals(sf_dir), ts="ts",
                         left_cols=["event_id"],
                         interval_cols=["interval_id"])


def events_value_quantiles(sf_dir: str):
    """EXACT p50/p90/p99 of events.value with no sort and no shuffle —
    iterative histogram refinement (distributed selection); DuckDB
    quantile_disc semantics, so the returned values are actual elements
    and bit-compare with the oracle."""
    from easyner_ray.ops.sketch import exact_quantiles

    ev = _rp(sf_dir, "events", columns=["value"])
    qs = exact_quantiles(ev, "value", [0.5, 0.9, 0.99])
    return pa.Table.from_arrays(
        [pa.array([qs[0.5]], pa.float64()), pa.array([qs[0.9]], pa.float64()),
         pa.array([qs[0.99]], pa.float64())], names=["p50", "p90", "p99"])


def events_value_quantiles_cont(sf_dir: str):
    """Interpolated p50/p90/p99 (SQL percentile_cont / DuckDB
    quantile_cont): both bracketing ranks of each q resolve through the
    shared histogram-refinement core, then one driver-side lerp — the
    quantile form curation thresholds usually want. Rounded to 4 digits
    on both sides (the lerp is float math; the bracketing values are
    exact elements)."""
    from easyner_ray.ops.sketch import exact_quantiles_cont

    ev = _rp(sf_dir, "events", columns=["value"])
    qs = exact_quantiles_cont(ev, "value", [0.5, 0.9, 0.99])
    return pa.Table.from_arrays(
        [pa.array([round(qs[0.5], 4)], pa.float64()),
         pa.array([round(qs[0.9], 4)], pa.float64()),
         pa.array([round(qs[0.99], 4)], pa.float64())],
        names=["p50", "p90", "p99"])


def docs_tfidf(sf_dir: str):
    """Per-(doc, term) TF-IDF (tf * ln(N/df), df >= 2) — exact per-batch
    tf rows, two-phase df count, vocabulary-sized broadcast join back."""
    from easyner_ray.ops.textstats import tfidf

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf(d)


def cms_user_counts(sf_dir: str):
    """Count-min sketch frequency estimates for user_ids 0..63 over the
    events stream — fixed-size counters, addition merge (bit-identical
    to the straight-line gold recompute)."""
    from easyner_ray.ops.sketch import cms_counts

    ev = _rp(sf_dir, "events", columns=["user_id"])
    return cms_counts(ev, "user_id", list(range(64)))


def events_quantiles_by_type(sf_dir: str):
    """Per-group exact quantiles: p50/p90 of value per event_type —
    histogram refinement with one candidate range per (group, q)."""
    from easyner_ray.ops.sketch import grouped_quantiles

    ev = _rp(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quantiles(ev, "value", [0.5, 0.9], by="event_type")


def events_quantiles_by_type_cont(sf_dir: str):
    """Per-group INTERPOLATED quantiles (percentile_cont by class): p50/
    p90 of value per event_type — the per-class curation-threshold shape.
    Bracketing ranks resolve through the shared refinement core; one
    driver lerp per (group, q). Rounded to 4 digits both sides."""
    from easyner_ray.ops.sketch import grouped_quantiles_cont

    ev = _rp(sf_dir, "events", columns=["event_type", "value"])
    t = grouped_quantiles_cont(ev, "value", [0.5, 0.9], by="event_type")
    return _round4(t, ["value"])


def orders_bloom_semi(sf_dir: str):
    """Bloom-prefiltered semi join: orders of negative-balance customers.
    The bloom (built distributed, OR-merged, broadcast once) drops the
    bulk of non-member orders map-only; the exact key-set check after it
    restores exact semi-join semantics — so the SQL oracle is the plain
    EXISTS, while the query exercises the 100-TB prefilter path."""
    from easyner_ray.ops.relational import semi_join_filter
    from easyner_ray.ops.sketch import bloom_build, bloom_filter_rows

    # materialize(): the filtered custkey stream feeds BOTH the bloom
    # build and the exact key-set — one scan, not two
    cust = (_rp(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
            .filter(expr="c_acctbal < 0").select_columns(["c_custkey"])
            .materialize())
    bloom = bloom_build(cust, "c_custkey", n_bits=1 << 20)
    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    pre = bloom_filter_rows(orders, "o_custkey", bloom)
    keys = {r["c_custkey"] for r in cust.take_all()}  # dimension-sized
    return semi_join_filter(pre, keys, on="o_custkey")


def embedding_label_centroids(sf_dir: str):
    """Per-label mean embedding (class prototypes): fixed-size per-batch
    sum partials, shuffle-free vector-add merge, exploded to
    (label, dim, centroid) rows."""
    from easyner_ray.ops.similarity import label_centroids

    em = _rp(sf_dir, "embeddings", columns=["label", "embedding"])
    return label_centroids(em)


def events_props_extract(sf_dir: str):
    """Semi-structured field extraction + redaction, map-only: pull the
    integer ``k`` out of the JSON-ish props string (vectorized RE2
    ``extract_regex``) and redact every digit run (``<NUM>``) — the
    PII-scrub / metadata-parse stage of a curation pipeline. Both
    kernels and the oracle run RE2-compatible patterns."""
    ev = _rp(sf_dir, "events", columns=["event_id", "props"])

    def f(t: pa.Table) -> pa.Table:
        props = t.column("props").combine_chunks()
        ex = pc.extract_regex(props, r'"k": (?P<k>\d+)')
        k = pc.struct_field(ex, "k").cast(pa.int64())
        red = pc.replace_substring_regex(props, r"\d+", "<NUM>")
        return pa.Table.from_arrays(
            [t.column("event_id"), k, red],
            names=["event_id", "k", "props_redacted"])

    return ev.map_batches(f, batch_format="pyarrow")


def user_order_event_profile(sf_dir: str):
    """FULL OUTER JOIN audit across two partially-overlapping key
    domains: orders-per-customer vs events-per-user — who buys but never
    clicks, who clicks but never buys, both sides preserved with NULL
    fill. The join is Ray's hash-shuffle full_outer (a broadcast variant
    can't be map-only: right-unmatched rows need cross-batch
    accounting)."""
    from easyner_ray.ops.relational import full_outer_join, grouped_agg

    o = grouped_agg(
        _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        ["o_custkey"],
        [("o_totalprice", "count", "n_orders"),
         ("o_totalprice", "sum", "total_spend")],
        final="tree")  # customer keyspace: dimension-table-sized
    e = grouped_agg(
        _rp(sf_dir, "events", columns=["user_id", "value"]),
        ["user_id"],
        [("value", "count", "n_events"), ("value", "sum", "total_value")],
        final="tree")  # user keyspace: dimension-table-sized
    out = full_outer_join(o, e, on="o_custkey", right_on="user_id")

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["uid"] + list(t.schema.names)[1:])
        # zero-fill the unmatched side: NULL counts/sums become 0 (keeps
        # every output column NULL-free — NaN never survives a value-hash)
        for c, zero in [("n_orders", 0), ("total_spend", 0.0),
                        ("n_events", 0), ("total_value", 0.0)]:
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pc.fill_null(t.column(c), zero))
        return _round4(t, ["total_spend", "total_value"])

    return out.map_batches(finish, batch_format="pyarrow")


def events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, hour-of-day): one corpus scan for the
    finest level, coarser levels re-aggregated from the previous level's
    keyspace-sized output (rollup_agg cascade) — the multi-granularity
    report shape without a second pass over the data."""
    from easyner_ray.ops.relational import rollup_agg

    ev = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_hod(t: pa.Table) -> pa.Table:
        hod = pc.hour(t.column("ts")).cast(pa.int64())
        return pa.Table.from_arrays(
            [t.column("event_type"), hod, t.column("value")],
            names=["event_type", "hod", "value"])

    out = rollup_agg(ev.map_batches(add_hod, batch_format="pyarrow"),
                     ["event_type", "hod"],
                     [("value", "count", "n"), ("value", "sum", "sum_value")])

    def finish(t: pa.Table) -> pa.Table:
        # rolled-up key levels carry sentinels, not NULLs ('(all)' / -1 —
        # NULL ints turn into NaN floats in a pandas hash and never match)
        i = t.schema.get_field_index("event_type")
        t = t.set_column(i, "event_type",
                         pc.fill_null(t.column("event_type"), "(all)"))
        i = t.schema.get_field_index("hod")
        t = t.set_column(i, "hod", pc.fill_null(t.column("hod"), -1))
        return _round4(t, ["sum_value"])

    return out.map_batches(finish, batch_format="pyarrow")


def users_funnel(sf_dir: str):
    """Funnel analysis: per user, how deep into view -> click -> purchase
    the FIRST occurrences progress in strict timestamp order (0 = never
    viewed .. 3 = completed). One conditional-min grouped aggregate +
    a vectorized stage map; integer output, no nullable timestamps in
    the result (NaT never survives a value-hash)."""
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def split_ts(t: pa.Table) -> pa.Table:
        ty = t.column("event_type")
        ts = t.column("ts")
        cols = [t.column("user_id")]
        for stage in ("view", "click", "purchase"):
            cols.append(pc.if_else(pc.equal(ty, stage), ts,
                                   pa.scalar(None, ts.type)))
        return pa.Table.from_arrays(cols, names=["user_id", "v", "c", "p"])

    firsts = grouped_agg(
        ev.map_batches(split_ts, batch_format="pyarrow"),
        ["user_id"],
        [("v", "min", "v"), ("c", "min", "c"), ("p", "min", "p")],
        final="tree")

    def stage(t: pa.Table) -> pa.Table:
        v, c, p = (t.column(x).combine_chunks() for x in ("v", "c", "p"))
        vc = pc.fill_null(pc.less(v, c), False)
        cp = pc.fill_null(pc.less(c, p), False)
        s3 = pc.and_(vc, cp)
        s1 = v.is_valid()
        stg = pc.add(
            pc.add(s1.cast(pa.int64()), pc.and_(s1, vc).cast(pa.int64())),
            pc.and_(pc.and_(s1, vc), s3).cast(pa.int64()))
        return pa.Table.from_arrays([t.column("user_id"), stg],
                                    names=["user_id", "funnel_stage"])

    return firsts.map_batches(stage, batch_format="pyarrow")


def events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, hour-of-day): all four grouping sets
    from ONE corpus scan (cube_agg re-aggregates the finest level),
    sentinel-filled like events_rollup so output hashes NULL-free."""
    from easyner_ray.ops.relational import cube_agg

    ev = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_hod(t: pa.Table) -> pa.Table:
        hod = pc.hour(t.column("ts")).cast(pa.int64())
        return pa.Table.from_arrays(
            [t.column("event_type"), hod, t.column("value")],
            names=["event_type", "hod", "value"])

    out = cube_agg(ev.map_batches(add_hod, batch_format="pyarrow"),
                   ["event_type", "hod"],
                   [("value", "count", "n"), ("value", "sum", "sum_value")])

    def finish(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("event_type")
        t = t.set_column(i, "event_type",
                         pc.fill_null(t.column("event_type"), "(all)"))
        i = t.schema.get_field_index("hod")
        t = t.set_column(i, "hod", pc.fill_null(t.column("hod"), -1))
        return _round4(t, ["sum_value"])

    return out.map_batches(finish, batch_format="pyarrow")


def events_value_histogram(sf_dir: str):
    """Fixed-width value histogram (bin = floor(value/25)): the
    distribution-profiling primitive — one vectorized bucket map + a
    grouped count/sum, no sort, no quantile state."""
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["value"])

    def bucket(t: pa.Table) -> pa.Table:
        b = pc.floor(pc.divide(t.column("value"), 25.0)).cast(pa.int64())
        return pa.Table.from_arrays([b, t.column("value")],
                                    names=["bin", "value"])

    out = grouped_agg(ev.map_batches(bucket, batch_format="pyarrow"),
                      ["bin"],
                      [("value", "count", "n"), ("value", "sum", "sum_value")])
    return out.map_batches(lambda t: _round4(t, ["sum_value"]),
                           batch_format="pyarrow")


def top_parts_heavy_hitters(sf_dir: str):
    """Frequent-items (heavy hitters) over a corpus-scaling keyspace:
    top-20 part keys by line count via the Misra-Gries candidate pass +
    exact verify (see ops.sketch.heavy_hitters) — shuffle volume bounded
    by m x #batches, never the 20k-part keyspace. m=16384 satisfies the
    exactness contract at both test scales (k-th frequency exceeds every
    batch's len/(m+1) threshold)."""
    from easyner_ray.ops.sketch import heavy_hitters

    li = _rp(sf_dir, "lineitem", columns=["l_partkey"])
    return heavy_hitters(li, "l_partkey", 20, m=16384)


def events_value_pctiles(sf_dir: str):
    """Distribution-position window functions: percent_rank and
    cume_dist of each event's value within its type — tie-aware
    (rank_prefix=1), bit-exact cross-engine because both are ratios of
    exactly-representable integers."""
    from easyner_ray.ops.analytic import partitioned_analytics

    ev = _rp(sf_dir, "events", columns=["event_type", "event_id", "value"])
    out = partitioned_analytics(
        ev, ["event_type"], ["value", "event_id"],
        [("percent_rank", None, "prnk"), ("cume_dist", None, "cdist")],
        rank_prefix=1)
    return out.map_batches(
        lambda t: t.select(["event_type", "event_id", "value",
                            "prnk", "cdist"]),
        batch_format="pyarrow")


def orders_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling (Efraimidis-Spirakis with
    hash-derived uniforms): 50 orders per priority class, inclusion
    probability proportional to order value — the data-mixing primitive,
    seedless and partitioning-independent, quantized integer keys so the
    oracle is bit-exact."""
    from easyner_ray.ops.relational import weighted_sample

    o = _rp(sf_dir, "orders",
            columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    return weighted_sample(o, ["o_orderpriority"], "o_totalprice", 50,
                           id_col="o_orderkey")


def docs_packed(sf_dir: str):
    """Sequence packing for training: assign each document to a
    fixed-token-budget pack (2048 whitespace tokens), contiguous by
    doc_id within each source — pack_id = floor(tokens-before-this-doc /
    budget). Runs as a per-source window cumsum (partitioned_analytics),
    so packing streams per partition; integer columns end to end."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.textstats import WS_TOKEN_RE

    docs = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def tok(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column("text"),
                                     WS_TOKEN_RE).cast(pa.int64())
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("source"), n],
            names=["doc_id", "source", "n_tokens"])

    cum = partitioned_analytics(
        docs.map_batches(tok, batch_format="pyarrow"),
        ["source"], ["doc_id"], [("cumsum", "n_tokens", "cum")])

    def pack(t: pa.Table) -> pa.Table:
        c = t.column("cum").cast(pa.int64())
        start = pc.subtract(c, t.column("n_tokens"))
        pid = pc.floor(pc.divide(start.cast(pa.float64()), 2048.0)) \
            .cast(pa.int64())
        i = t.schema.get_field_index("cum")
        t = t.set_column(i, "cum", c)
        return t.append_column("pack_id", pid)

    return cum.map_batches(pack, batch_format="pyarrow")


def docs_packed_sharded(sf_dir: str):
    """Shard-local sequence packing — the scale-safe layout: composite
    pack identity ``(source, bucket, pack_id)`` where ``bucket`` is the
    Knuth hash of doc_id mod 8, so every (source, bucket) cell cumsums
    independently and no single task ever sorts a whole source (the
    plain ``docs_packed`` per-source cumsum serializes one source into
    one task — fine at bench scale, wrong at 100x)."""
    from easyner_ray.ops.textstats import pack_documents

    docs = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return pack_documents(docs, 2048, by=["source"], n_buckets=8)


def docs_vocab_top(sf_dir: str):
    """Corpus vocabulary builder: top-100 terms by total occurrences —
    the tokenizer-training primitive (seed vocab / frequency cutoff
    tables). Exact per-batch tf partials (one row per (doc, term),
    ops.textstats._tf_partial) -> two-phase grouped sum over the term
    keyspace -> global top-k (count desc, term asc) over the
    vocab-sized aggregate."""
    from easyner_ray.ops.relational import grouped_agg
    from easyner_ray.ops.textstats import _tf_partial

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    tf = d.map_batches(lambda t: _tf_partial(t, "doc_id", "text"),
                       batch_format="pyarrow")
    tc = grouped_agg(tf.select_columns(["term", "tf"]), ["term"],
                     [("tf", "sum", "cnt")])
    return tc.sort(["cnt", "term"], descending=[True, False]).limit(100)


def docs_unigram_logprob(sf_dir: str):
    """CCNet-style LM quality score: per-doc mean unigram log-probability
    with the corpus as its own language model (see
    textstats.unigram_logprob) — the perplexity-filtering primitive."""
    from easyner_ray.ops.textstats import unigram_logprob

    return unigram_logprob(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]))


def docs_pii_redact(sf_dir: str):
    """Built-in PII scrub over the documents table: emails, IPv4s, SSNs
    and phone-like digit runs become typed placeholders (the curate
    ``pii_redact`` step's kernel, surfaced as a query)."""
    from easyner_ray.pipelines.curate import _step_pii_redact

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = _step_pii_redact(d)
    return out.map_batches(
        lambda t: t.rename_columns(["doc_id", "text_redacted"]),
        batch_format="pyarrow")


def docs_dup_line_removal(sf_dir: str):
    """Corpus-level duplicate-line (boilerplate) removal: every exact
    line occurring >= 2 times across the corpus is cut from all docs."""
    from easyner_ray.ops.dedup import dup_line_removal

    return dup_line_removal(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]))


def docs_gopher_signals(sf_dir: str):
    """Gopher Table-A1 structural/lexical quality signals, one RE2
    kernel per signal (repetition signals live in docs_repetition)."""
    from easyner_ray.ops.textstats import gopher_signals

    return gopher_signals(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]))


def docs_near_dup_keep_best(sf_dir: str):
    """Cluster-level quality-aware near-dedup: exact n-gram Jaccard
    pairs (>= 0.2) -> connected components -> keep the BEST-scoring
    member of every cluster (score = Knuth hash of doc_id, ties min id);
    docs in no pair are their own cluster and survive. The refinement
    FineWeb applies after near-dup clustering — keep the best variant,
    not the smallest id. -> (group_id, doc_id, score)."""
    import numpy as np

    from easyner_ray.ops.dedup import dup_groups, ngram_jaccard_pairs
    from easyner_ray.ops.relational import adaptive_join, topk_per_group

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
        .materialize()  # two consumers: pair generation + member base
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, k=3)
    labels = dup_groups(pairs)  # (doc_id, group_id), paired docs only

    members = adaptive_join(
        docs.select_columns(["doc_id"]), labels, on="doc_id", how="left")

    def score(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        gid = pc.coalesce(t.column("group_id"), ids)  # singleton = own id
        k = np.asarray(ids).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return pa.Table.from_arrays(
            [gid, ids, pa.array(h.astype(np.int64), pa.int64())],
            names=["group_id", "doc_id", "score"])

    scored = members.map_batches(score, batch_format="pyarrow")
    best = topk_per_group(scored, ["group_id"], "score", 1,
                          descending=True, tie_cols=["doc_id"])
    return best.map_batches(lambda t: t.drop(["rn"]),
                            batch_format="pyarrow")


def docs_bpe_merges(sf_dir: str):
    """Tokenizer training as a pipeline stage: the first 20 BPE merges
    learned from the corpus (distributed word count -> vocab-sized
    deterministic merge loop). Oracle = straight-line recompute
    (gold_bpe_merges.parquet)."""
    from easyner_ray.ops.textstats import bpe_merges

    _corpus(sf_dir)  # gold table keyed to this sf_dir
    return bpe_merges(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), n_merges=20)


def docs_bpe_tokenize(sf_dir: str):
    """The tokenizer loop closed: learn 20 BPE merges from the corpus,
    apply them back, count pieces per doc. Oracle = straight-line
    recompute over the shared gold merge table (gold_bpe_pieces)."""
    from easyner_ray.ops.textstats import bpe_apply, bpe_merges

    _corpus(sf_dir)  # gold tables keyed to this sf_dir
    d = _rp(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    mt = bpe_merges(d, n_merges=20)
    ranked = list(zip(mt.column("left").to_pylist(),
                      mt.column("right").to_pylist()))
    return bpe_apply(d, ranked)


def docs_bigram_logprob(sf_dir: str):
    """CCNet-style LM quality score, bigram order: per-doc mean
    Laplace-smoothed ln p(w2|w1) with the corpus as its own model."""
    from easyner_ray.ops.textstats import bigram_logprob

    return bigram_logprob(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]))


def docs_cap_per_source(sf_dir: str):
    """Per-source document cap (crawl balancing: at most N docs per
    domain, chosen deterministically along the export-shuffle hash
    order, ties by id): topk_per_group over the shuffle hash — phase-1
    bounds the exchange to N rows per (source, batch)."""
    import numpy as np

    from easyner_ray.ops.relational import _XXH32_P2, topk_per_group

    d = _rp(sf_dir, "documents", columns=["doc_id", "source"])

    def add_h(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("doc_id")).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * np.uint64(_XXH32_P2)) & np.uint64(0xFFFFFFFF)
        return t.append_column("h", pa.array(h.astype(np.int64), pa.int64()))

    capped = topk_per_group(
        d.map_batches(add_h, batch_format="pyarrow"),
        ["source"], "h", 10, descending=False, tie_cols=["doc_id"],
        rank_name="rn")
    return capped.select_columns(["source", "doc_id", "rn"])


def docs_source_report(sf_dir: str):
    """Per-source corpus report card — docs, tokens, distinct texts
    (the dedup-rate denominator): the summary a mixture-planning pass
    reads before assigning source weights. Exact grouped distinct via
    the classic two-phase shape: collapse to (source, digest) first
    (shuffle moves one row per distinct text per batch), then a
    source-keyspace rollup."""
    import hashlib

    from easyner_ray.ops.relational import grouped_agg
    from easyner_ray.ops.textstats import WS_TOKEN_RE

    d = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        dig = pa.array([hashlib.md5(s.encode()).hexdigest()
                        for s in t.column("text").to_pylist()], pa.string())
        tok = pc.count_substring_regex(t.column("text"),
                                       WS_TOKEN_RE).cast(pa.int64())
        g = pa.Table.from_arrays(
            [t.column("source"), dig, tok,
             pa.array(np.ones(len(t), dtype=np.int64))],
            names=["source", "digest", "tok", "n"])
        return g.group_by(["source", "digest"]).aggregate(
            [("tok", "sum"), ("n", "sum")]).rename_columns(
            ["source", "digest", "tok", "n"])

    per_text = grouped_agg(
        d.map_batches(partial, batch_format="pyarrow"),
        ["source", "digest"], [("tok", "sum", "tok"), ("n", "sum", "n")])

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("one",
                               pa.array(np.ones(len(t), dtype=np.int64)))

    return grouped_agg(
        per_text.map_batches(ones, batch_format="pyarrow"),
        ["source"], [("n", "sum", "n_docs"), ("tok", "sum", "n_tokens"),
                     ("one", "sum", "n_distinct")])


def docs_snapshot_diff(sf_dir: str):
    """Corpus version audit: diff the documents table against a
    deterministically mutated v2 (drop doc_id%11, rewrite doc_id%13,
    add doc_id%17 under shifted ids) -> (doc_id, status) for every
    added / removed / changed doc. Fingerprints are md5 of the text,
    the same content hash doc_stats exposes."""
    import hashlib

    from easyner_ray.ops.relational import snapshot_diff

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"]).materialize()

    def fp(t: pa.Table, suffix: str = "") -> pa.Table:
        h = pa.array([hashlib.md5((s + suffix).encode()).hexdigest()
                      for s in t.column("text").to_pylist()], pa.string())
        return pa.Table.from_arrays([t.column("doc_id"), h],
                                    names=["doc_id", "fingerprint"])

    old = d.map_batches(fp, batch_format="pyarrow")

    import numpy as np

    def new_kept(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"))
        t = t.filter(pa.array(ids % 11 != 0))
        ids = np.asarray(t.column("doc_id"))
        changed = ids % 13 == 0
        h = pa.array(
            [hashlib.md5((s + (" v2" if c else "")).encode()).hexdigest()
             for s, c in zip(t.column("text").to_pylist(), changed)],
            pa.string())
        return pa.Table.from_arrays([t.column("doc_id"), h],
                                    names=["doc_id", "fingerprint"])

    def new_added(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"))
        t = t.filter(pa.array(ids % 17 == 0))
        out = fp(t, " new")
        return out.set_column(0, "doc_id",
                              pc.add(out.column("doc_id"), 1000000))

    new = d.map_batches(new_kept, batch_format="pyarrow").union(
        d.map_batches(new_added, batch_format="pyarrow"))
    return snapshot_diff(old, new)


def docs_token_budget(sf_dir: str):
    """Per-source token-budget subset (Pile/DoReMi assembly): the first
    800 tokens of every source along the deterministic export-shuffle
    order — resolved by weighted histogram refinement, not a per-source
    sort."""
    from easyner_ray.ops.textstats import token_budget_subset

    d = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return token_budget_subset(d, 800) \
        .select_columns(["doc_id", "source", "n_tokens"])


def docs_ppl_buckets(sf_dir: str):
    """CCNet head/middle/tail labeling: tercile bands of the unigram-LM
    quality score over the whole corpus."""
    from easyner_ray.ops.textstats import logprob_buckets

    return logprob_buckets(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]))


def docs_decontam(sf_dir: str):
    """Train/eval n-gram contamination audit (the GPT-3-style overlap
    check): documents with ``doc_id % 10 == 0`` stand in as the held-out
    benchmark; every OTHER doc is flagged with its count of distinct
    5-gram fingerprints shared with the benchmark. Fingerprinting is
    map-only vectorized; the intersection is an adaptive semi join on the
    fingerprint column (broadcast is_in at this scale, hash-shuffle at
    corpus scale). Oracle = straight-line recompute of the same spec
    (gold_contamination.parquet)."""
    from easyner_ray.ops.decontam import contamination

    _corpus(sf_dir)  # gold table keyed to this sf_dir

    def mod_split(keep_bench: bool):
        def f(t: pa.Table, kb=keep_bench) -> pa.Table:
            v = t.column("doc_id").combine_chunks().to_numpy(
                zero_copy_only=False)
            mask = (v % 10 == 0)
            return t.filter(pa.array(mask if kb else ~mask))
        return _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
            .map_batches(f, batch_format="pyarrow")

    return contamination(mod_split(False), mod_split(True), n=5)


def latest_event_per_user(sf_dir: str):
    """Last-writer-wins by recency (the reference's O7 doc-id dict-merge,
    relationally): each user's single latest event — topk_per_group with
    k=1 ordered by ts desc, event_id tie-break."""
    from easyner_ray.ops.relational import topk_per_group

    ev = _rp(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    return topk_per_group(ev, ["user_id"], "ts", 1,
                          tie_cols=["event_id"])


def top_users_by_value_per_type(sf_dir: str):
    """Aggregate-then-rank composition: total value per (event_type,
    user), then each type's top 3 users — the grouped_agg partial stream
    feeds topk_per_group directly, so the only exchanges are the
    aggregate's bucketed final and the top-k's k-rows-per-group final."""
    from easyner_ray.ops.relational import grouped_agg, topk_per_group

    ev = _rp(sf_dir, "events", columns=["event_type", "user_id", "value"])
    per_user = grouped_agg(ev, ["event_type", "user_id"],
                           [("value", "sum", "total_value")])

    def round4(t: pa.Table) -> pa.Table:
        return _round4(t, ["total_value"])

    ranked = topk_per_group(per_user.map_batches(round4, batch_format="pyarrow"),
                            ["event_type"], "total_value", 3,
                            tie_cols=["user_id"])
    return ranked


def embedding_dup_groups(sf_dir: str):
    """Embedding-cosine near-duplicate CLUSTERS — the dedup family's
    closure applied to the embedding modality: exact cosine >= 0.4 pairs
    (brute-force matmul per batch against the one broadcast matrix) ->
    connected components -> (vec_id, group_id = min reachable vec_id).
    The same dup_groups propagation the text near-dup path uses, so at
    scale the pair stage swaps to cosine_near_dup_pairs (LSH) with no
    change downstream."""
    from easyner_ray.ops.dedup import dup_groups
    from easyner_ray.ops.similarity import cosine_pairs_brute

    pairs = cosine_pairs_brute(
        _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        threshold=0.4)
    pairs = pairs.map_batches(
        lambda t: t.select(["vec_id_a", "vec_id_b"])
                   .rename_columns(["doc_a", "doc_b"]),
        batch_format="pyarrow")
    return dup_groups(pairs).map_batches(
        lambda t: t.rename_columns(["vec_id", "group_id"]),
        batch_format="pyarrow")


def embeddings_outlier_filter(sf_dir: str):
    """Embedding-space outlier removal: per-cluster 0.9-quantile radius
    cut. Oracle = straight-line recompute of the same spec
    (gold_outlier_filter.parquet)."""
    from easyner_ray.ops.similarity import embedding_outlier_filter

    _corpus(sf_dir)  # gold table keyed to this sf_dir
    em = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_outlier_filter(em, k=6, iters=4, q=0.9)


def embeddings_semdedup(sf_dir: str):
    """SemDeDup: k-means clusters bound the comparison space, then
    within-cluster cosine >= 0.5 components collapse to their min-id
    representative. Oracle = straight-line recompute of the same spec
    (gold_semdedup.parquet)."""
    from easyner_ray.ops.similarity import semdedup

    _corpus(sf_dir)  # gold table keyed to this sf_dir
    em = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semdedup(em, k=6, iters=4, threshold=0.5)


def users_retention_cohorts(sf_dir: str):
    """Retention cohort analysis — the canonical product-analytics
    matrix (users cohorted by first-activity week x weeks they came
    back): distinct (user, week) activity pairs via the two-phase
    grouped collapse, per-user cohort week via a user-keyspace min,
    one adaptive join, one grouped count. No window functions, no
    sort; every exchange is keyspace-sized."""
    import numpy as np

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    ev = _rp(sf_dir, "events", columns=["user_id", "ts"])
    WEEK_US = 7 * 86_400 * 1_000_000

    def weeks(t: pa.Table) -> pa.Table:
        us = np.asarray(t.column("ts").cast(pa.int64()))
        g = pa.Table.from_arrays(
            [t.column("user_id"), pa.array(us // WEEK_US, pa.int64()),
             pa.array(np.ones(len(t), dtype=np.int64))],
            names=["user_id", "week", "n"])
        return g.group_by(["user_id", "week"]).aggregate(
            [("n", "sum")]).rename_columns(["user_id", "week", "n"])

    pairs = grouped_agg(
        ev.map_batches(weeks, batch_format="pyarrow"),
        ["user_id", "week"], [("n", "sum", "__n")]) \
        .select_columns(["user_id", "week"]).materialize()
    cohort = grouped_agg(pairs, ["user_id"], [("week", "min", "cohort_week")])
    joined = adaptive_join(pairs, cohort, on="user_id")

    def ones(t: pa.Table) -> pa.Table:
        import numpy as np

        return t.append_column("one",
                               pa.array(np.ones(len(t), dtype=np.int64)))

    return grouped_agg(
        joined.map_batches(ones, batch_format="pyarrow"),
        ["cohort_week", "week"], [("one", "sum", "n_users")])


def events_running_totals(sf_dir: str):
    """Partitioned analytic (window) functions — the ``f(x) OVER
    (PARTITION BY user ORDER BY ts)`` family Ray Data lacks: per-user
    event sequence number, previous/next value, and running value total,
    all computed in ONE bucketed pass (`ops.analytic`): one hash exchange
    on user_id, one sort per bucket, every function a vector op off the
    shared run-boundary index."""
    from easyner_ray.ops.analytic import partitioned_analytics

    ev = _rp(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])
    out = partitioned_analytics(
        ev, ["user_id"], ["ts", "event_id"],
        [("row_number", None, "rn"),
         ("lag", "value", "prev_value"),
         ("lead", "value", "next_value"),
         ("cumsum", "value", "running_value")])

    def tidy(t: pa.Table) -> pa.Table:
        t = _round4(t, ["running_value"])
        # partition-edge NULLs (first row's lag / last row's lead) are
        # coalesced to -1.0 ONLY for the value-hash compare — NaN is never
        # bit-equal, so a nullable float column can't hash-match. The real
        # NULL semantics are pinned by tests/test_round4b_ops.py.
        for c in ("prev_value", "next_value"):
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, t.column(c).combine_chunks().fill_null(-1.0))
        return t.select(["user_id", "event_id", "value", "rn",
                         "prev_value", "next_value", "running_value"])

    return out.map_batches(tidy, batch_format="pyarrow")


def events_value_ranks(sf_dir: str):
    """Tie-aware ranking window functions: per event type, each event's
    rank / dense_rank over value (2-decimal values tie often) and its
    ntile(4) quartile over the total (value, event_id) order.
    ``rank_prefix=1`` makes rank see ONLY value as its ORDER BY — exactly
    SQL's ``rank() OVER (ORDER BY value)`` — while the event_id
    tie-break keeps ntile deterministic."""
    from easyner_ray.ops.analytic import partitioned_analytics

    ev = _rp(sf_dir, "events", columns=["event_type", "event_id", "value"])
    out = partitioned_analytics(
        ev, ["event_type"], ["value", "event_id"],
        [("rank", None, "rnk"),
         ("dense_rank", None, "drnk"),
         ("ntile", 4, "tile")],
        rank_prefix=1)
    return out.map_batches(
        lambda t: t.select(["event_type", "event_id", "value",
                            "rnk", "drnk", "tile"]),
        batch_format="pyarrow")


def events_stratified_sample(sf_dir: str):
    """Class-balanced sampling: exactly 20 events per event type, picked
    by the deterministic multiplicative hash of event_id (no RNG state,
    reproducible across engines and re-runs — same arithmetic as
    orders_hash_sample, applied per group)."""
    from easyner_ray.ops.relational import stratified_sample

    ev = _rp(sf_dir, "events", columns=["event_type", "event_id", "value"])
    return stratified_sample(ev, ["event_type"], 20, id_col="event_id")


def docs_bm25(sf_dir: str):
    """Okapi BM25 keyword search over the documents table for the query
    {hash, join, window}: two map passes + one tiny aggregate (no
    per-term shuffle — the query set is user-sized). Both engines
    evaluate the identical float expression in the identical operand
    order, so scores hash-match after the shared round-to-4."""
    from easyner_ray.ops.textstats import bm25_scores

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_scores(d, ["hash", "join", "window"])


def events_user_type_pivot(sf_dir: str):
    """Pivot (long -> wide conditional aggregation): one row per user
    with a count column per event type. Vectorized indicator columns per
    batch (pc.equal -> int64) feed the ordinary two-phase sum — the
    pivot costs nothing beyond the aggregate it rides on, and the fixed
    known-category list is what makes it scale (an open category set is
    the long-format grouped_agg, not a pivot)."""
    from easyner_ray.ops.relational import grouped_agg

    types = ["click", "error", "purchase", "signup", "view"]
    ev = _rp(sf_dir, "events", columns=["user_id", "event_type"])

    def indicators(t: pa.Table) -> pa.Table:
        cols = [t.column("user_id")]
        names = ["user_id"]
        et = t.column("event_type")
        for ty in types:
            cols.append(pc.equal(et, pa.scalar(ty)).cast(pa.int64()))
            names.append(f"n_{ty}")
        return pa.Table.from_arrays(cols, names=names)

    return grouped_agg(
        ev.map_batches(indicators, batch_format="pyarrow"),
        ["user_id"],
        [(f"n_{ty}", "sum", f"n_{ty}") for ty in types])


def docs_quality_filtered(sf_dir: str):
    """Percentile-based quality gate (curate step ``quality_percentile``):
    keep documents at or above this corpus's P25 stopword ratio — the
    threshold is a property of the data (exact quantile, quantile_disc
    semantics), not a config constant. Two passes: histogram-refinement
    quantile, then a map-only filter."""
    import os

    from easyner_ray.pipelines.curate import build_curation

    out = build_curation({
        "input": {"documents": os.path.join(sf_dir, "documents.parquet")},
        "steps": [{"op": "quality_percentile", "metric": "stopword_ratio",
                   "percentile": 0.25, "keep": "above"}],
    })
    return out.select_columns(["doc_id"])


def docs_chunks(sf_dir: str):
    """Context-window chunking: every document split into 120-char
    windows advancing 100 chars (20 overlap) — map-only explode, slices
    grouped by chunk index so the string kernel runs once per index,
    never per row."""
    from easyner_ray.ops.textstats import chunk_documents

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(d, size=120, overlap=20)


def docs_curated(sf_dir: str):
    """The curation CHAIN as one oracle-checked pipeline: token filter ->
    exact dedup (keep min-id representative) -> deterministic 50% hash
    sample, end to end through pipelines.curate — the oracle recomputes
    every step in SQL, so the whole composed plan is driver-verified,
    not just its operators."""
    import os

    from easyner_ray.pipelines.curate import build_curation

    return build_curation({
        "input": {"documents": os.path.join(sf_dir, "documents.parquet")},
        "steps": [
            {"op": "token_filter", "min_tokens": 5},
            {"op": "dedup_exact"},
            {"op": "hash_sample", "rate": 0.5, "key": "doc_id"},
        ],
    }).select_columns(["doc_id", "text"])


def docs_curated_v2(sf_dir: str):
    """The round-5 curation steps as ONE oracle-checked chain:
    Gopher structural gate -> corpus dup-line removal (+ min-token
    strip) -> PII scrub -> deterministic 50% hash sample. The SQL
    oracle recomputes every step in order (step ordering is load-
    bearing: line counts are measured over the post-Gopher corpus)."""
    import os

    from easyner_ray.pipelines.curate import build_curation

    return build_curation({
        "input": {"documents": os.path.join(sf_dir, "documents.parquet")},
        "steps": [
            {"op": "gopher_filter", "min_words": 25, "min_stop_hits": 0},
            {"op": "dup_line_removal", "min_count": 2, "min_tokens": 5},
            {"op": "pii_redact"},
            {"op": "hash_sample", "rate": 0.5, "key": "doc_id"},
        ],
    }).select_columns(["doc_id", "text"])


def media_features(sf_dir: str):
    """Multimodal feature extraction through the REAL codec boundary:
    the shared WAV/PPM fixture (sources.media_fixture) decoded by
    StdlibCodec on an actor pool (small batch_size x concurrency — the
    decoded-payload heap knob), mean-pooled to a 16-dim feature, then
    summarized to (feat_mean, feat_l2) per item. Oracle = straight-line
    decode+pool recompute (gold_media_features.parquet)."""
    import ray.data as rd

    from easyner_ray.ops.multimodal import extract_features
    from easyner_ray.sources.media_fixture import ensure_media_fixture

    media = rd.read_parquet(ensure_media_fixture(_corpus(sf_dir)))
    feats = extract_features(media, dim=16, codec="stdlib", batch_size=16)

    def summarize(t: pa.Table) -> pa.Table:
        import numpy as np

        means, l2s = [], []
        for f in t.column("feature").to_pylist():
            v = np.asarray(f, dtype=np.float64)
            means.append(round(float(v.mean()), 6))
            l2s.append(round(float(np.sqrt((v * v).sum())), 6))
        return pa.Table.from_arrays(
            [t.column("item_id"), t.column("kind"),
             pa.array(means, pa.float64()), pa.array(l2s, pa.float64())],
            names=["item_id", "kind", "feat_mean", "feat_l2"])

    return feats.map_batches(summarize, batch_format="pyarrow")


def embeddings_kmeans(sf_dir: str):
    """Distributed Lloyd k-means assignments over the embeddings table —
    iterative broadcast + fixed-size partial-sum merges, centroids
    rounded per iteration for block-layout invariance. Oracle =
    straight-line numpy Lloyd with the same init/rounding spec
    (gold_kmeans_assign.parquet)."""
    from easyner_ray.ops.similarity import kmeans

    # gold exists under the corpus dir keyed to this sf_dir
    _corpus(sf_dir)
    em = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _, assign = kmeans(em, k=6, iters=4)
    return assign


def docs_normalize(sf_dir: str):
    """Unicode/whitespace canonicalization (NFC + control/whitespace-run
    collapse + trim) — the crawl-curation chain's first step, entirely
    Arrow kernels. Reference analog: M7 newline normalizer generalized."""
    from easyner_ray.ops.textstats import normalize_text

    return normalize_text(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]))


def docs_truncate(sf_dir: str):
    """Context-window truncation: first 50 whitespace tokens of each
    document, numpy segment slicing + one binary_join — no Python rows."""
    from easyner_ray.ops.textstats import truncate_tokens

    return truncate_tokens(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), 50)


def docs_dsir(sf_dir: str):
    """DSIR importance weights (arXiv:2302.03169): log p_target - log
    p_raw per document under add-one-smoothed unigram LMs over the
    top-256 combined vocabulary, target = the 'src0' slice (stand-in for
    the high-quality domain you want more of). materialize() before the
    fan-out: docs feeds BOTH the raw-count pass and the scoring pass
    (Ray plans are trees — an unmaterialized fan-out re-executes the
    read per consumer)."""
    from easyner_ray.ops.textstats import dsir_weights

    docs = _rp(sf_dir, "documents",
               columns=["doc_id", "source", "text"]).materialize()

    def only_src0(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("source"), "src0"))

    target = docs.map_batches(only_src0, batch_format="pyarrow")
    return dsir_weights(docs, target, vocab_size=256)


def embedding_decontam_q(sf_dir: str):
    """Embedding-space decontamination: corpus vectors (vec_id % 10 != 0)
    that survive a max-cosine < 0.5 gate against the held-out eval slice
    (vec_id % 10 == 0). The eval matrix is assembled in a Ray task and
    broadcast once; the corpus streams map-only — no shuffle."""
    from easyner_ray.ops.decontam import embedding_decontam

    def mod_split(keep_eval: bool):
        def f(t: pa.Table, ke=keep_eval) -> pa.Table:
            v = t.column("vec_id").combine_chunks().to_numpy(
                zero_copy_only=False)
            mask = (v % 10 == 0)
            return t.filter(pa.array(mask if ke else ~mask))
        return _rp(sf_dir, "embeddings",
                   columns=["vec_id", "embedding"]).map_batches(
            f, batch_format="pyarrow")

    return embedding_decontam(mod_split(False), mod_split(True),
                              threshold=0.5)


def lineitem_profile(sf_dir: str):
    """Numeric column profiler over the widest table: per-column count /
    nulls / exact distinct / min / max / avg in two streaming passes
    (basics are tree-merged partials; distinct pays the inherent
    per-column value exchange, HLL is the documented 100 TB swap)."""
    from easyner_ray.ops.relational import profile_columns

    cols = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    return profile_columns(_rp(sf_dir, "lineitem", columns=cols), cols)


def events_zscore(sf_dir: str):
    """Grouped standardization (feature normalization for training
    data): z = (value - mean_type) / stddev_samp_type per event. Two
    phases: one grouped (n, sum, sum-of-squares) aggregate over the
    5-key type space (tree final — no keyed shuffle), then a map-only
    broadcast-assign pass. Rounded to the oracle grain per row (Python
    round, _round4 convention)."""
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def add_sq(t: pa.Table) -> pa.Table:
        v = t.column("value").combine_chunks().cast(pa.float64())
        return t.append_column("value2", pc.multiply(v, v))

    stats = grouped_agg(
        ev.map_batches(add_sq, batch_format="pyarrow"), ["event_type"],
        [("value", "sum", "s"), ("value2", "sum", "s2"),
         ("value", "count", "n")], final="tree").take_all()
    import math
    ms = {r["event_type"]:
          (r["s"] / r["n"],
           math.sqrt(max((r["s2"] - r["s"] * r["s"] / r["n"])
                         / (r["n"] - 1), 0.0)))
          for r in stats if r["n"] > 1}

    def assign(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        import numpy as np
        mean_d = np.array([ms.get(k, (0.0, 0.0))[0]
                           for k in enc.dictionary.to_pylist()])
        sd_d = np.array([ms.get(k, (0.0, 1.0))[1]
                         for k in enc.dictionary.to_pylist()])
        ix = np.asarray(enc.indices)
        v = t.column("value").combine_chunks().cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        z = (v - mean_d[ix]) / sd_d[ix]
        t = t.append_column(
            "z", pa.array([round(x, 4) for x in z.tolist()], pa.float64()))
        return t.select(["event_id", "event_type", "value", "z"])

    return ev.map_batches(assign, batch_format="pyarrow")


def docs_c4_signals(sf_dir: str):
    """C4 line-level quality signals + boilerplate flags per document
    (arXiv:1910.10683 §2.2) — map-only vectorized; fractions are exact
    int/int doubles so the compare needs no rounding grain."""
    from easyner_ray.ops.textstats import c4_signals

    return c4_signals(_rp(sf_dir, "documents", columns=["doc_id", "text"]))


def docs_source_kl(sf_dir: str):
    """Per-source KL divergence from the corpus unigram distribution —
    mixture diagnostics for a multi-source training set. One grouped sum
    over the source x vocab keyspace; everything after is vocab-sized."""
    from easyner_ray.ops.textstats import source_kl

    return source_kl(_rp(sf_dir, "documents", columns=["source", "text"]))


def events_winsorize(sf_dir: str):
    """Winsorization (outlier clipping for feature columns): clamp value
    to the interpolated [p05, p95] band. The bounds come from the shared
    histogram-refinement quantile core and are rounded to the oracle
    grain BEFORE clipping — so clamped rows carry the identical double in
    both engines and pass-through rows are untouched originals: the
    whole output is bit-exact with no per-row rounding."""
    from easyner_ray.ops.sketch import exact_quantiles_cont

    ev = _rp(sf_dir, "events",
             columns=["event_id", "value"]).materialize()  # 2 consumers
    qs = exact_quantiles_cont(ev, "value", [0.05, 0.95])
    lo, hi = round(qs[0.05], 4), round(qs[0.95], 4)

    def clip(t: pa.Table) -> pa.Table:
        v = t.column("value").combine_chunks().cast(pa.float64())
        w = pc.min_element_wise(pc.max_element_wise(v, lo), hi)
        return t.append_column("value_w", w)

    return ev.map_batches(clip, batch_format="pyarrow")


def _transcripts_cols(sf_dir: str, columns):
    from easyner_ray.pipelines.kg import read_transcripts

    return read_transcripts(
        os.path.join(_corpus(sf_dir), "transcripts.parquet"), columns=columns)


def conv_stats_q(sf_dir: str):
    """Per-conversation profile (role mix, tool calls, char totals,
    assistant share, duration) — the transcript analog of doc_stats."""
    from easyner_ray.ops.conversations import conv_stats

    return conv_stats(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]))


def conv_role_patterns(sf_dir: str):
    """Conversation-shape census: group convs by ordered role sequence."""
    from easyner_ray.ops.conversations import role_patterns

    return role_patterns(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "role"]))


def conv_tool_report(sf_dir: str):
    """Per-tool usage report (calls, distinct convs, avg output chars)."""
    from easyner_ray.ops.conversations import tool_report

    return tool_report(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "role", "text", "tool"]))


def conv_reply_pairs(sf_dir: str):
    """SFT prompt->response pairs: (user turn, next assistant turn)."""
    from easyner_ray.ops.conversations import reply_pairs

    return reply_pairs(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "role", "text"]))


def conv_last_turns(sf_dir: str):
    """Context-tail windowing: each conversation's last 3 turns."""
    from easyner_ray.ops.conversations import last_turns

    return last_turns(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "role", "text"]), n=3)


def conv_turn_gaps(sf_dir: str):
    """Per-conversation turn-latency profile over ``ts``."""
    from easyner_ray.ops.conversations import turn_gaps

    return turn_gaps(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "ts"]))


def conv_fingerprints(sf_dir: str):
    """Conversation content fingerprints: md5 of the full ordered
    turn-text concatenation + turn count per conversation — the
    conversation-level exact-dedup key (group on text_md5, keep min
    conv_id)."""
    from easyner_ray.ops.conversations import conv_fingerprint

    return conv_fingerprint(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "text"]))


def conv_refusal_scan(sf_dir: str):
    """Phrase-flag scan over assistant turns: per-conversation count +
    share of turns matching a watchlist — the drop-the-whole-conversation
    decision unit for refusal / canned-boilerplate SFT curation. The
    default watchlist is the standard refusal preset
    (:data:`~easyner_ray.ops.conversations.REFUSAL_PHRASES`); the
    synthetic clinical corpus never refuses, so this query audits its
    hedge vocabulary instead — same kernel, corpus-meaningful matches."""
    from easyner_ray.ops.conversations import refusal_scan

    return refusal_scan(
        _transcripts_cols(sf_dir, ["conv_id", "role", "text"]),
        phrases=("pending", "draft", "sample"))


def conv_schema_valid(sf_dir: str):
    """Role-schema gate: keep convs whose roles follow the
    user/assistant/tool cycle."""
    from easyner_ray.ops.conversations import schema_valid_conversations

    return schema_valid_conversations(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "role", "text"]))


def conv_sft_pairs(sf_dir: str):
    """End-to-end SFT-pair prep chain: role-schema gate -> prompt/response
    extraction -> length quality filter -> exact pair dedup."""
    from easyner_ray.ops.conversations import sft_pairs

    return sft_pairs(
        _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "role", "text"]),
        min_prompt_chars=40, min_response_chars=40)


def conv_context_windows(sf_dir: str):
    """Multi-turn SFT context assembly: each assistant turn with the
    concatenation of its up-to-3 preceding turns."""
    from easyner_ray.ops.conversations import context_windows

    return context_windows(
        _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "role", "text"]),
        k=3)


def docs_concat_blocks(sf_dir: str):
    """GPT-style concat-then-slice training blocks: shard by the Knuth
    doc-id hash, concatenate each shard's docs in id order, cut every
    128 tokens (blocks cross doc boundaries; the tail block is short)."""
    from easyner_ray.ops.textstats import concat_blocks

    return concat_blocks(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]),
        128, n_buckets=16)


_EDGE_PAIRS_CACHE: dict = {}


def _kg_edge_pairs(sf_dir: str):
    """Shared upstream for the graph-analytics family: the aggregated
    co-occurrence edge table (both orientations, grouped, weighted) —
    exactly :func:`kg_edges` minus the node-id columns the graph kernels
    do not consume. MATERIALIZED: several graph kernels consume the edge
    stream twice (degree + triangles, map + rewrite), and without the
    checkpoint each consumer re-runs the full corpus-sized NER -> triples
    -> edges build; the edge table itself is vocab^2-bounded (~5 MB at
    sf0.1), so the checkpoint is the cheap side of that trade.

    MEMOIZED per process: a driver session runs 15+ graph queries over
    the SAME corpus back to back, and each would otherwise re-run the
    identical corpus-sized upstream. The key pins the corpus identity
    (resolved transcripts path + mtime + size) AND the Ray job id — a
    materialized Dataset holds object-store refs that die with the Ray
    session, so a fresh ``ray.init`` in the same process misses cleanly.
    Cache payload is the vocab^2-bounded edge table only (~5 MB).
    Served off the FUSED single-pass edge build (:func:`_kg_edges_fused`),
    so the one corpus-sized pass is shared with kg_edges itself."""
    key = _fused_cache_key(sf_dir)
    hit = _EDGE_PAIRS_CACHE.get(key)
    if hit is None:
        hit = _kg_edges_fused(sf_dir).select_columns(
            ["subj", "obj", "weight"]).materialize()
        _EDGE_PAIRS_CACHE.clear()  # one corpus at a time; bound the refs
        _EDGE_PAIRS_CACHE[key] = hit
    return hit


def kg_degree_stats(sf_dir: str):
    """Per-entity degree profile over the KG edge table: distinct
    neighbors, summed edge weight (strength), max single-edge weight.
    One vocab-bounded two-phase grouped aggregate downstream of the
    NER -> triples -> edges build (the reference's analysis stops at
    entity frequencies, ``analysis.py``; degree/strength is the first
    graph-side question a KG consumer asks)."""
    from easyner_ray.ops.graph_analytics import degree_stats

    return degree_stats(_kg_edge_pairs(sf_dir))


def kg_two_hop(sf_dir: str):
    """Distinct nodes reachable within two hops per entity (self
    excluded): size-gated self-join of the distinct-pair edge list on
    the middle node, union direct edges, two-phase distinct + count."""
    from easyner_ray.ops.graph_analytics import two_hop_counts

    return two_hop_counts(_kg_edge_pairs(sf_dir))


def kg_triangles(sf_dir: str):
    """Per-entity triangle participation over the co-occurrence graph:
    degree-ordered oriented wedge enumeration (arboricity-bounded), all
    numpy inside the distributed wedge tasks."""
    from easyner_ray.ops.graph_analytics import triangle_counts

    return triangle_counts(_kg_edge_pairs(sf_dir))


def kg_components(sf_dir: str):
    """Connected components of the KG with the lexicographically
    smallest member as the deterministic component label (union-find
    under the counted-edge cutoff; distributed min-label propagation
    above it — both paths tested equal)."""
    from easyner_ray.ops.graph_analytics import components

    return components(_kg_edge_pairs(sf_dir))


def kg_temporal_edges(sf_dir: str):
    """Temporally annotated undirected co-occurrence edges: evidence
    count plus first/last observed transcript timestamp and the active
    span in seconds — the edge-stream shape a temporal-KG consumer
    ingests. Triples join the PRUNED (conv_id, turn_idx, ts) transcript
    read on the composite turn key (size-gated adaptive join), then
    collapse to the vocab^2-bounded pair keyspace."""
    from easyner_ray.ops.graph_analytics import temporal_edges
    triples = _kg_sentence_triples(sf_dir)  # memoized shared upstream
    return temporal_edges(
        triples, _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "ts"]))


def kg_edges_decayed(sf_dir: str):
    """Recency-weighted KG edges: per undirected pair, evidence count
    plus the exponentially decayed weight sum(2^(-age/half_life)) with a
    7-day half-life anchored at the corpus max timestamp — the
    freshness-ranked edge stream a temporal-KG consumer feeds a
    decaying index from."""
    from easyner_ray.ops.graph_analytics import decayed_edges
    triples = _kg_sentence_triples(sf_dir)  # memoized shared upstream
    return decayed_edges(
        triples, _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "ts"]),
        half_life_s=7 * 86400.0)


def kg_clustering(sf_dir: str):
    """Local clustering coefficient per entity (2T / d(d-1), 0.0 below
    degree 2): separates star-shaped topical hubs from members of tight
    co-mention cliques. Composition of the degree and oriented-wedge
    triangle kernels over the vocab-bounded edge table."""
    from easyner_ray.ops.graph_analytics import clustering_coeff

    return clustering_coeff(_kg_edge_pairs(sf_dir))


def kg_alias_candidates(sf_dir: str):
    """Alias-candidate pairs for canonicalization by neighborhood
    Jaccard: entity pairs sharing >= 3 co-occurrence neighbors, scored
    |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — the string-free complement of the
    normalized-surface merge in ``stages/canonicalize.py``."""
    from easyner_ray.ops.graph_analytics import neighbor_jaccard

    return neighbor_jaccard(_kg_edge_pairs(sf_dir), min_shared=3)


def kg_eigencentrality(sf_dir: str):
    """Weighted eigenvector centrality over the KG edge table (20 power
    iterations, L2-normalized, per-iteration rounding grain). The
    influence complement of kg_pagerank: PageRank rewards being linked
    FROM many places; eigenvector centrality rewards being linked from
    IMPORTANT places, weighted by co-occurrence counts. Oracle =
    straight-line recompute of the same spec
    (gold_eigencentrality.parquet)."""
    from easyner_ray.ops.graph import eigencentrality

    out = eigencentrality(_kg_edge_pairs(sf_dir), weight_col="weight",
                          src_col="subj", dst_col="obj", iters=20)
    return out.map_batches(lambda t: t.rename_columns(["norm", "score"]),
                           batch_format="pyarrow")


def kg_link_predict(sf_dir: str):
    """Link prediction over the KG: non-adjacent entity pairs sharing
    >= 3 co-occurrence neighbors, scored by common-neighbor count,
    Adamic-Adar, and preferential attachment — KG completion (which
    edges does the corpus imply but never state in one sentence?)."""
    from easyner_ray.ops.graph_analytics import link_predict

    return link_predict(_kg_edge_pairs(sf_dir), min_common=3)


def kg_bfs_hops(sf_dir: str):
    """Minimum hop distance from the watchlist seed entities, bounded at
    3 hops: frontier-expansion BFS (adaptive join per round + grouped
    min, early exit on an empty frontier) over the KG edge table."""
    from easyner_ray.ops.graph_analytics import bfs_hops

    return bfs_hops(_kg_edge_pairs(sf_dir), WATCHLIST, max_hops=3)


def kg_weighted_hops(sf_dir: str):
    """Minimum weighted distance (cost = 1/co-occurrence weight) from
    the watchlist seeds over paths of <= 3 edges: bounded Bellman-Ford
    rounds over the KG edge table — strength-aware proximity, the
    weighted complement of kg_bfs_hops."""
    from easyner_ray.ops.graph_analytics import weighted_hops

    return weighted_hops(_kg_edge_pairs(sf_dir), WATCHLIST, max_hops=3)


def kg_edge_activity(sf_dir: str):
    """Hourly temporal edge activity: per undirected entity pair and
    hour bucket, co-occurrence count + distinct contributing
    conversations — the edge-burst stream of a temporal KG. Two-level
    rollup so a hot conversation ships one row per pair-bucket, not its
    full repeat mass."""
    from easyner_ray.ops.graph_analytics import edge_activity
    triples = _kg_sentence_triples(sf_dir)  # memoized shared upstream
    return edge_activity(
        triples, _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "ts"]),
        unit="hour")


def kg_edge_evidence(sf_dir: str):
    """Per-edge provenance: first 3 evidence sentences per undirected
    entity pair in (conv_id, turn_idx, sent_idx) order — the audit
    lineage from an edge back into the transcripts. Bounded exchange:
    each batch forwards at most k rows per pair it sees
    (``topk_per_group``), never a hot pair's full evidence mass."""
    from easyner_ray.ops.graph_analytics import edge_evidence
    triples = _kg_sentence_triples(sf_dir)  # memoized shared upstream
    return edge_evidence(triples, k=3)


def kg_kcore(sf_dir: str):
    """3-core of the KG: nodes of the maximal subgraph where everyone
    keeps >= 3 distinct neighbors, with the in-core degree. Iterative
    peeling — one degree aggregate + two adaptive semi-joins per round.
    Oracle: derived gold (straight-line peel over the gold pair graph,
    ``sources/gold_derived.write_kcore_gold``)."""
    from easyner_ray.ops.graph_analytics import kcore

    return kcore(_kg_edge_pairs(sf_dir), k=3)


def kg_canonical_map(sf_dir: str):
    """Graph-aware alias merge map: entities whose co-occurrence
    neighborhoods overlap at Jaccard >= 0.5 (over >= 3 shared neighbors)
    collapse under the lexicographically smallest member of their alias
    component — the string-free second canonicalization pass after the
    normalized-surface merge."""
    from easyner_ray.ops.graph_analytics import canonical_map

    return canonical_map(_kg_edge_pairs(sf_dir), jaccard_threshold=0.5,
                         min_shared=3)


def kg_edges_canonical(sf_dir: str):
    """The KG edge table rewritten through the graph-aware alias map:
    merged endpoints re-aggregate weights, alias<->alias edges drop as
    self-loops, unmapped entities keep their own name."""
    from easyner_ray.ops.graph_analytics import canonical_map, rewrite_edges

    edges = _kg_edge_pairs(sf_dir).materialize()  # feeds map + rewrite
    mapping = canonical_map(edges, jaccard_threshold=0.5, min_shared=3)
    return rewrite_edges(edges, mapping)


def kg_entity_trends(sf_dir: str):
    """Per-entity hourly mention activity with spike flags: counts per
    (entity, hour bucket), z-scored against the entity's own bucket
    distribution (sample stddev over observed buckets), spike = |z| >= 2
    on the rounded score. The node-level burst detector next to
    ``kg_edge_activity``'s edge bursts."""
    from easyner_ray.ops.graph_analytics import entity_trends

    return entity_trends(
        _mentions(sf_dir),
        _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "ts"]))


def kg_edges_diff(sf_dir: str):
    """KG snapshot audit: diff the edge table built from the EVEN-
    numbered conversations (the "yesterday" snapshot) against the
    full-corpus edges — every added / changed co-occurrence pair with
    both weights. Additive construction means no 'removed' rows here;
    the operator emits them when snapshots genuinely diverge."""
    from easyner_ray.ops.graph_analytics import edges_diff
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.canonicalize import aggregate_edges, cls_of_norm_map
    from easyner_ray.stages.dict_ner import tag_mentions
    from easyner_ray.stages.splitter import split_sentences
    from easyner_ray.stages.triples import sentence_triples
    from easyner_ray.pipelines.kg import drop_empty_turns

    def even_convs(t: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(t.column("conv_id"), 4),
                      pa.int64())
        return t.filter(pc.equal(pc.bit_wise_and(num, 1), 0))

    voc = vocabulary()
    old_sent = split_sentences(drop_empty_turns(
        _transcripts(sf_dir).map_batches(even_convs,
                                         batch_format="pyarrow")))
    old = aggregate_edges(
        sentence_triples(tag_mentions(old_sent, voc)),
        cls_of_norm=cls_of_norm_map([voc])) \
        .select_columns(["subj", "obj", "weight"])
    return edges_diff(old, _kg_edge_pairs(sf_dir))


def kg_export_ntriples(sf_dir: str):
    """RDF N-Triples materialization of the full KG (nodes + typed class
    tags + edges + reified weights) — the standard interchange stream a
    triple store bulk-loads. Pure vectorized map over the nodes and
    edges tables, no shuffle (``sources/rdf_export.py``); the reference
    has no graph export beyond its JSON/TSV artifacts."""
    from easyner_ray.sources.rdf_export import ntriples_lines
    from easyner_ray.stages.canonicalize import canonical_nodes

    return ntriples_lines(canonical_nodes(_mentions(sf_dir)),
                          kg_edges(sf_dir))


def kg_harmonic(sf_dir: str):
    """Harmonic centrality of each watchlist seed within 3 hops:
    per-root bounded BFS over the KG edge table, then
    ``sum(1/hop)`` over reached nodes (hop 0 excluded) plus the reach
    count — "how central is this watchlist entity in its 3-hop
    neighborhood". Root count is the watchlist size, so the per-root
    BFS loop is bounded by the query, not the corpus; each BFS is the
    frontier-expansion kernel (output-sensitive work)."""
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import bfs_hops

    import numpy as np

    edges = _kg_edge_pairs(sf_dir)
    parts = []
    for seed in WATCHLIST:
        rows = bfs_hops(edges, [seed], max_hops=3).take_all()  # vocab-bounded
        if not rows:
            continue
        h = np.array([r["hop"] for r in rows], dtype=np.int64)
        reached = h[h > 0]
        parts.append({"root": seed,
                      "n_reached": int(reached.size),
                      "harmonic": float(np.round(
                          np.sum(1.0 / reached) if reached.size else 0.0, 4))})
    return rd.from_arrow(pa.Table.from_pylist(parts)) if parts else \
        rd.from_arrow(pa.table({"root": pa.array([], pa.string()),
                                "n_reached": pa.array([], pa.int64()),
                                "harmonic": pa.array([], pa.float64())}))


def conv_templates(sf_dir: str):
    """Cross-conversation boilerplate detection: normalized turn texts
    (lower + trim) appearing in >= 3 DISTINCT conversations, with the
    conversation and turn counts — the transcript-level analog of
    corpus duplicate-line removal (templated greetings / canned tool
    payloads that would otherwise flood an SFT set). Two-level grouped
    aggregate: (digest, conv) partials collapse each conversation's
    repeats locally, then a digest-keyed count — the full text never
    shuffles more than once per (text, conv) pair."""
    from easyner_ray.ops.conversations import template_turns

    return template_turns(
        _transcripts_cols(sf_dir, ["conv_id", "role", "text"]), min_convs=3)


def kg_component_stats(sf_dir: str):
    """Per-component KG audit table: node count, undirected edge count,
    total evidence weight, and density per connected component — the
    first graph-shape question a KG consumer asks of a fresh build
    (hairball vs clusters). Component labels + two component-keyspace
    aggregates over the memoized vocab^2-bounded edge table."""
    from easyner_ray.ops.graph_analytics import component_stats

    return component_stats(_kg_edge_pairs(sf_dir))


_KG_LPA_CACHE: dict = {}


def _kg_lpa(sf_dir: str):
    """Shared LPA partition (4 rounds) over the memoized edge table —
    kg_communities returns it and kg_modularity scores it; without the
    memo the modularity leg re-runs the identical 4-round propagation.
    Same key discipline as :func:`_kg_edge_pairs` (corpus identity +
    Ray job id); payload is the vocab-bounded (norm, community) table."""
    import ray

    corpus = _corpus(sf_dir)
    path = os.path.join(corpus, "transcripts.parquet")
    st = os.stat(path)
    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = None
    key = (path, st.st_mtime_ns, st.st_size, job)
    hit = _KG_LPA_CACHE.get(key)
    if hit is None:
        from easyner_ray.ops.graph_analytics import label_propagation

        hit = label_propagation(_kg_edge_pairs(sf_dir), iters=4).materialize()
        _KG_LPA_CACHE.clear()
        _KG_LPA_CACHE[key] = hit
    return hit


def kg_communities(sf_dir: str):
    """Deterministic weighted label-propagation communities (4
    synchronous rounds, max-incident-weight label, lexicographic tie
    break) over the KG co-occurrence graph — finer-than-component
    cluster structure for topic grouping, exactly reproducible in SQL
    (the assignment is parity-checked, not sampled)."""
    return _kg_lpa(sf_dir)


def kg_meta_paths(sf_dir: str):
    """Predicate meta-path census over the TYPED edge table: for every
    ordered predicate pair (pred_a, pred_b), how many 2-hop typed paths
    a -pred_a-> b -pred_b-> c exist (a != c) and their total evidence
    weight — the schema-induction signal (which relation chains the
    corpus actually supports) a KG consumer reads before writing
    meta-path queries. The typed edge table is vocab^2 x predicate
    bounded (predicates are open-vocabulary gap strings, so not small
    in general); the self-join is one :func:`adaptive_join` —
    broadcast under the 64 MB gate, Ray hash-shuffle join above it —
    and the corpus-sized work happened once upstream in the pattern
    extraction."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    typed = kg_typed_edges(sf_dir).materialize()
    left = typed.map_batches(
        lambda t: t.rename_columns(["__a", "pred_a", "__mid", "__wa"]),
        batch_format="pyarrow")
    right = typed.map_batches(
        lambda t: t.rename_columns(["__mid", "pred_b", "__c", "__wb"]),
        batch_format="pyarrow")
    j = adaptive_join(left, right, on="__mid")

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("__a"), t.column("__c"))))
        w = pc.multiply(pc.cast(t.column("__wa"), pa.int64()),
                        pc.cast(t.column("__wb"), pa.int64()))
        return pa.Table.from_arrays(
            [t.column("pred_a"), t.column("pred_b"), w],
            names=["pred_a", "pred_b", "__w"])

    return grouped_agg(
        j.map_batches(project, batch_format="pyarrow"),
        ["pred_a", "pred_b"],
        [("__w", "count", "n_paths"), ("__w", "sum", "path_weight")])


def kg_node_attributes(sf_dir: str):
    """The enriched KG NODE table a downstream consumer actually loads:
    per canonical entity — mention count, graph degree + strength
    (0 for isolated nodes), connected-component label (self for
    isolated nodes), distinct conversations, and first/last observed
    transcript timestamp. ONE corpus-sized mention pass: the mention
    stream joins the pruned (conv_id, turn_idx, ts) transcript read on
    the turn key, collapses to the (norm, conv) keyspace carrying
    count/min-ts/max-ts partials, and every further aggregate/join is
    node-keyspace-bounded (a first cut consumed the mention Dataset
    three times — each consumer re-ran the NER upstream; 21 s -> ~3 s
    at sf0.1/32)."""
    from easyner_ray.ops.graph_analytics import _SEP, components, degree_stats
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    edges = _kg_edge_pairs(sf_dir)

    deg = degree_stats(edges).map_batches(
        lambda t: t.select(["norm", "degree", "strength"])
                   .rename_columns(["norm", "__deg", "__str"]),
        batch_format="pyarrow")
    comp = components(edges).map_batches(
        lambda t: t.rename_columns(["norm", "__comp"]),
        batch_format="pyarrow")

    def turn_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"), pc.cast(t.column("turn_idx"), pa.string()),
            _SEP)
        return pa.Table.from_arrays([k, t.column("ts")], names=["__k", "ts"])

    def mention_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"), pc.cast(t.column("turn_idx"), pa.string()),
            _SEP)
        return pa.Table.from_arrays([t.column("norm"), t.column("conv_id"), k],
                                    names=["norm", "conv_id", "__k"])

    # one corpus pass: mention -> turn-ts join -> (norm, conv) rollup
    per_conv = grouped_agg(
        adaptive_join(
            _mentions(sf_dir).map_batches(mention_key,
                                          batch_format="pyarrow"),
            _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "ts"])
                .map_batches(turn_key, batch_format="pyarrow"),
            on="__k").map_batches(
                lambda t: t.select(["norm", "conv_id", "ts"]),
                batch_format="pyarrow"),
        ["norm", "conv_id"],
        [("ts", "count", "__n"), ("ts", "min", "__t0"),
         ("ts", "max", "__t1")])
    # node-keyspace-bounded: checkpoint so the downstream joins' schema
    # probes don't re-execute the corpus chain (unchecked, each
    # adaptive_join's left-side schema probe re-ran the NER -> join ->
    # rollup pipeline through its sorts: 3 full executions, 12.5 s ->
    # 4.5 s at sf0.1/32)
    base = grouped_agg(
        per_conv, ["norm"],
        [("__n", "sum", "n_mentions"), ("conv_id", "count", "n_convs"),
         ("__t0", "min", "first_seen"), ("__t1", "max", "last_seen")]) \
        .materialize()

    out = adaptive_join(base, deg, on="norm", how="left")
    out = adaptive_join(out, comp, on="norm", how="left")

    def finish(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("norm"), t.column("n_mentions"),
             pc.coalesce(t.column("__deg"), pa.scalar(0, pa.int64())),
             pc.coalesce(t.column("__str"), pa.scalar(0, pa.int64())),
             pc.coalesce(t.column("__comp"), t.column("norm")),
             t.column("n_convs"), t.column("first_seen"),
             t.column("last_seen")],
            names=["norm", "n_mentions", "degree", "strength", "component",
                   "n_convs", "first_seen", "last_seen"])

    return out.map_batches(finish, batch_format="pyarrow")


def kg_betweenness(sf_dir: str):
    """Exact Brandes betweenness centrality over the KG co-occurrence
    graph (symmetric-pair convention = undirected x2): the
    bridge-detection complement of PageRank/eigenvector — which
    entities sit ON the shortest paths between topic clusters. Oracle =
    straight-line textbook Brandes recompute
    (gold_betweenness.parquet)."""
    from easyner_ray.ops.graph_analytics import betweenness

    return betweenness(_kg_edge_pairs(sf_dir))


def kg_negative_samples(sf_dir: str):
    """Hash-deterministic corrupted-pair negatives for link-prediction
    training over the KG edge table: per undirected positive edge, two
    candidate non-edges by Knuth-hash object corruption
    (self/existing-edge collisions dropped, not resampled — a pure
    function of the graph, reproducible in SQL)."""
    from easyner_ray.ops.graph_analytics import negative_samples

    return negative_samples(_kg_edge_pairs(sf_dir), k=2)


def conv_dialog_acts(sf_dir: str):
    """Rule-based dialogue-act mix per conversation (question / command
    / statement / empty turn counts) — the SFT-mix balance profile."""
    from easyner_ray.ops.conversations import dialog_acts

    return dialog_acts(_transcripts_cols(sf_dir, ["conv_id", "text"]))


def kg_eccentricity(sf_dir: str):
    """Radius/diameter profile of the KG: per entity, the max hop
    distance to anything in its component plus the reachable count —
    broadcast-adjacency BFS fan over the memoized edge table."""
    from easyner_ray.ops.graph_analytics import eccentricity

    return eccentricity(_kg_edge_pairs(sf_dir))


def kg_type_pairs(sf_dir: str):
    """Entity-CLASS co-occurrence census (type-level schema induction):
    for each unordered class pair, how many distinct undirected entity
    edges and how much total sentence-evidence weight connect the two
    classes — does the corpus actually link drugs to syndromes, or only
    drugs to drugs? Two broadcast joins of the vocab-bounded class map
    onto the undirected edge table + one class^2-keyspace aggregate."""
    import ray

    from easyner_ray.ops.relational import broadcast_join, grouped_agg
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.canonicalize import cls_of_norm_map

    m = cls_of_norm_map([vocabulary()])
    cls_tbl = pa.table({"__n": pa.array(list(m.keys()), pa.string()),
                        "__cls": pa.array(list(m.values()), pa.string())})
    und = _kg_edge_pairs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("subj"), t.column("obj"))),
        batch_format="pyarrow")
    j = broadcast_join(und, cls_tbl.rename_columns(["__n", "__ca"]),
                       on="subj", right_key="__n", value_cols=["__ca"])
    j = broadcast_join(j, cls_tbl.rename_columns(["__n", "__cb"]),
                       on="obj", right_key="__n", value_cols=["__cb"])

    def pairkey(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t.column("__ca"), t.column("__cb"))
        hi = pc.max_element_wise(t.column("__ca"), t.column("__cb"))
        return pa.Table.from_arrays(
            [lo, hi, pc.cast(t.column("weight"), pa.int64())],
            names=["cls_a", "cls_b", "weight"])

    return grouped_agg(
        j.map_batches(pairkey, batch_format="pyarrow"),
        ["cls_a", "cls_b"],
        [("weight", "count", "n_edges"), ("weight", "sum", "total_weight")],
        final="tree")


def conv_topics(sf_dir: str):
    """Conversation -> dominant KG entity assignment: per conversation,
    the most-mentioned entity (ties broken lexicographically), its
    mention count, and the conversation's distinct-entity breadth — the
    link a KG consumer uses to route conversations to graph
    neighborhoods. Two-phase (conv, entity) count, then the same
    max-weight + lexicographic argmax exchange the LPA kernel uses
    (all on the conv x observed-entity keyspace, never corpus text)."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    counts = grouped_agg(
        _mentions(sf_dir).map_batches(
            lambda t: t.select(["conv_id", "norm"]),
            batch_format="pyarrow"),
        ["conv_id", "norm"], [("norm", "count", "n")]).materialize()
    stats = grouped_agg(
        counts, ["conv_id"],
        [("n", "max", "__mx"), ("norm", "count", "n_distinct_entities")])
    j = adaptive_join(counts, stats, on="conv_id")

    def argmax(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("n"), t.column("__mx")))
        return pa.Table.from_arrays(
            [t.column("conv_id"), t.column("norm"), t.column("n"),
             t.column("n_distinct_entities")],
            names=["conv_id", "top_entity", "n_mentions_top",
                   "n_distinct_entities"])

    out = grouped_agg(
        j.map_batches(argmax, batch_format="pyarrow"),
        ["conv_id"],
        [("top_entity", "min", "top_entity"),
         ("n_mentions_top", "min", "n_mentions_top"),
         ("n_distinct_entities", "min", "n_distinct_entities")])
    return out


def kg_growth(sf_dir: str):
    """KG growth curve: per day, how many undirected co-occurrence
    edges were observed for the FIRST time — the build-audit series
    that tells a KG operator whether the graph is still discovering
    structure or has saturated. Rides :func:`kg_temporal_edges`'
    corpus-sized turn-key join once, then collapses to the
    pair-keyspace first-seen aggregate and one day-bucket count."""
    from easyner_ray.ops.graph_analytics import temporal_edges
    from easyner_ray.ops.relational import grouped_agg
    triples = _kg_sentence_triples(sf_dir)  # memoized shared upstream
    te = temporal_edges(
        triples, _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "ts"]))
    daily = te.map_batches(
        lambda t: pa.Table.from_arrays(
            [pc.floor_temporal(t.column("first_seen"), unit="day")],
            names=["day"]),
        batch_format="pyarrow")
    return grouped_agg(daily, ["day"], [("day", "count", "n_new_edges")],
                       final="tree")


def kg_integrity(sf_dir: str):
    """One-row referential-integrity report over the materialized KG
    (dangling edge endpoints vs the node table, self-loops, bad
    weights) — all-zero on a healthy build; the artifact-level CI gate."""
    from easyner_ray.ops.graph_analytics import integrity_report
    from easyner_ray.stages.canonicalize import canonical_nodes

    return integrity_report(canonical_nodes(_mentions(sf_dir)),
                            kg_edges(sf_dir))


def kg_mention_yield(sf_dir: str):
    """Per-role NER yield diagnostics: mentions, turns, characters, and
    mentions per 1k chars by transcript role — where the KG's signal
    actually comes from (assistant prose vs user questions vs tool
    payloads). One adaptive turn-key join of the mention stream against
    the pruned (conv, turn, role, text-length) transcript read, then
    role-keyspace aggregates."""
    from easyner_ray.ops.graph_analytics import _SEP, _round_away
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    tr = _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "role", "text"])

    def turn_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"), pc.cast(t.column("turn_idx"), pa.string()),
            _SEP)
        chars = pc.cast(pc.utf8_length(pc.coalesce(t.column("text"), "")),
                        pa.int64())
        return pa.Table.from_arrays([k, t.column("role"), chars],
                                    names=["__k", "role", "__chars"])

    turns = tr.map_batches(turn_key, batch_format="pyarrow").materialize()
    by_role = grouped_agg(
        turns, ["role"],
        [("__k", "count", "n_turns"), ("__chars", "sum", "n_chars")],
        final="tree")

    def mention_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"), pc.cast(t.column("turn_idx"), pa.string()),
            _SEP)
        return pa.Table.from_arrays([k], names=["__k"])

    m_role = grouped_agg(
        adaptive_join(
            _mentions(sf_dir).map_batches(mention_key,
                                          batch_format="pyarrow"),
            turns.map_batches(lambda t: t.select(["__k", "role"]),
                              batch_format="pyarrow"),
            on="__k").map_batches(
                lambda t: t.select(["role"]), batch_format="pyarrow"),
        ["role"], [("role", "count", "n_mentions")], final="tree") \
        .map_batches(lambda t: t.rename_columns(["role", "__nm"]),
                     batch_format="pyarrow")

    out = adaptive_join(by_role, m_role, on="role", how="left")

    def finish(t: pa.Table) -> pa.Table:
        nm = pc.coalesce(t.column("__nm"), pa.scalar(0, pa.int64()))
        chars = t.column("n_chars").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        rate = _round_away(
            1000.0 * nm.combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.float64)
            / np.where(chars > 0, chars, 1.0), 4)
        return pa.Table.from_arrays(
            [t.column("role"), nm, t.column("n_turns"),
             t.column("n_chars"), pa.array(rate, pa.float64())],
            names=["role", "n_mentions", "n_turns", "n_chars",
                   "mentions_per_kchar"])

    return out.map_batches(finish, batch_format="pyarrow")


def docs_cross_dup_ngrams(sf_dir: str):
    """Per-doc CROSS-document duplicate n-gram share (RefinedWeb-style
    dup-fraction signal, n=3 word shingles): distinct shingles per doc,
    how many also occur in >= 1 OTHER doc, and the IEEE-exact fraction.
    Two-phase bucketed df count over the shingle keyspace + adaptive
    (broadcast/semi-join) flag-back; pure-SQL oracle."""
    from easyner_ray.ops.textstats import cross_doc_dup_ngrams

    return cross_doc_dup_ngrams(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), n=3)


def kg_assortativity(sf_dir: str):
    """Degree assortativity of the KG co-occurrence graph (Newman 2002):
    Pearson correlation of endpoint distinct-neighbor degrees over every
    directed edge — one scalar row (n_edges, assortativity). Exact-int
    moment sums + an identical driver/SQL float formula make the value
    bit-exact across engines."""
    from easyner_ray.ops.graph_analytics import assortativity

    return assortativity(_kg_edge_pairs(sf_dir))


def events_mad_outliers(sf_dir: str):
    """Robust outlier census per event type: median, MAD (median absolute
    deviation), and how many events sit beyond 3 MADs — the
    heavy-tail-safe alternative to the z-score gate. Exact interpolated
    medians via the grouped quantile_cont refinement core; every float
    matches the SQL oracle bit-exact without a rounding grain."""
    from easyner_ray.ops.sketch import mad_outliers

    out = mad_outliers(
        _rp(sf_dir, "events", columns=["event_type", "value"]),
        "value", "event_type", k=3.0)
    return out.map_batches(
        lambda t: t.rename_columns(
            ["event_type", "n_values", "n_outliers", "med", "mad"]),
        batch_format="pyarrow")


def conv_parrot_score(sf_dir: str):
    """Echo ("parrot") score per SFT reply pair: the fraction of each
    assistant response's distinct word bigrams already present in the
    user prompt it answers — flags replies that restate the question.
    Map-only downstream of the reply_pairs lead() exchange."""
    from easyner_ray.ops.conversations import parrot_score

    return parrot_score(
        _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "role", "text"]),
        n=2)


_TURN_NORMS_CACHE: dict = {}
_TRANSITION_CACHE: dict = {}


def _corpus_key(sf_dir: str):
    """(path, mtime, size, ray job) — the memo key the graph-family
    caches share: corpus identity + Ray session (materialized refs die
    with the session)."""
    import ray

    corpus = _corpus(sf_dir)
    path = os.path.join(corpus, "transcripts.parquet")
    st = os.stat(path)
    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = None
    return (path, st.st_mtime_ns, st.st_size, job)


def _kg_turn_norms(sf_dir: str):
    """Shared distinct (conv_id, turn_idx, norm) rollup — the turn-grain
    entity presence table both the transition-edge build and the
    recurrence texture consume. Materialized + memoized per (corpus,
    Ray job) like :func:`_kg_edge_pairs`: the rollup is the expensive
    corpus-sized leg (full NER chain + one bucketed grouped final); its
    two consumers are cheap by comparison."""
    from easyner_ray.ops.relational import grouped_agg

    key = _corpus_key(sf_dir)
    hit = _TURN_NORMS_CACHE.get(key)
    if hit is None:
        hit = grouped_agg(
            _mentions(sf_dir).map_batches(
                lambda t: t.select(["conv_id", "turn_idx", "norm"]),
                batch_format="pyarrow"),
            ["conv_id", "turn_idx", "norm"], [("norm", "count", "__c")],
        ).select_columns(["conv_id", "turn_idx", "norm"]).materialize()
        _TURN_NORMS_CACHE.clear()
        _TURN_NORMS_CACHE[key] = hit
    return hit


def _kg_transition_pairs(sf_dir: str):
    """Shared DIRECTED upstream for the HITS family: the turn-transition
    entity edge table (src in turn t, dst in turn t+1, weight =
    adjacency instances), built over the memoized :func:`_kg_turn_norms`
    rollup. Materialized + memoized per (corpus, Ray job) — the payload
    is vocab^2-bounded while the upstream is the corpus-sized NER chain."""
    from easyner_ray.ops.graph_analytics import transition_edges

    key = _corpus_key(sf_dir)
    hit = _TRANSITION_CACHE.get(key)
    if hit is None:
        hit = transition_edges(_kg_turn_norms(sf_dir),
                               assume_distinct=True).materialize()
        _TRANSITION_CACHE.clear()
        _TRANSITION_CACHE[key] = hit
    return hit


def kg_transition_edges(sf_dir: str):
    """The conversation-flow graph: directed entity transition edges —
    src mentioned in turn t, dst in the SAME conversation's turn t+1
    (self-transitions excluded), weighted by adjacency instances. The
    directed surface the symmetric co-occurrence table cannot express."""
    return _kg_transition_pairs(sf_dir)


def kg_hits(sf_dir: str):
    """HITS hubs and authorities over the directed turn-transition
    graph (20 iterations, per-half-step L2 normalize + rounding grain):
    hubs are entities whose mention foreshadows important entities in
    the NEXT turn, authorities are the entities so foreshadowed. Oracle
    = straight-line recompute of the same spec (gold_hits.parquet)."""
    from easyner_ray.ops.graph import hits

    out = hits(_kg_transition_pairs(sf_dir), weight_col="weight",
               src_col="src", dst_col="dst", iters=20)
    return out.map_batches(
        lambda t: t.rename_columns(["norm", "hub", "authority"]),
        batch_format="pyarrow")


def media_dedup_q(sf_dir: str):
    """Exact dedup of binary media payloads (md5 digest two-phase, the
    multimodal analog of dedup_exact_docs): representative item per
    distinct payload with copy count and byte size."""
    import ray.data as rd

    from easyner_ray.ops.multimodal import media_dedup
    from easyner_ray.sources.media_fixture import ensure_media_fixture

    return media_dedup(rd.read_parquet(ensure_media_fixture(_corpus(sf_dir))))


def kg_modularity(sf_dir: str):
    """Modularity Q of the deterministic label-propagation partition
    over the KG co-occurrence graph — "did the clustering find real
    structure": W_in/W - sum_c S_c^2/W^2, every moment an exact int64
    sum so the float matches the SQL oracle bit-exact."""
    from easyner_ray.ops.graph_analytics import modularity

    return modularity(_kg_edge_pairs(sf_dir), _kg_lpa(sf_dir))


def kg_entity_recurrence(sf_dir: str):
    """Per-entity resurfacing texture: over each conversation's DISTINCT
    mention turns, the turn gaps between consecutive mentions — how many
    conversations carry the entity, how many turn-mentions total, the
    largest gap, and how often it resurfaces after skipping >= 1 turn
    (gap >= 2). Topic-persistence diagnostics for the temporal KG: a
    high-resurface entity threads through dialogs; max_gap locates
    long-range callbacks. One bucketed lag() exchange over the distinct
    (conv, turn, norm) rollup + two vocab-bounded grouped finals."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    tn = _kg_turn_norms(sf_dir)

    lagged = partitioned_analytics(
        tn, ["conv_id", "norm"], ["turn_idx"],
        [("lag", "turn_idx", "__prev")])

    def gaps(t: pa.Table) -> pa.Table:
        gap = pc.subtract(t.column("turn_idx").cast(pa.int64()),
                          t.column("__prev").cast(pa.int64()))
        return pa.Table.from_arrays(
            [t.column("norm"), pa.array(np.ones(len(t), np.int64)),
             gap.combine_chunks().is_valid().cast(pa.int64()),
             gap,
             pc.coalesce(pc.greater_equal(gap, 2), False).cast(pa.int64())],
            names=["norm", "__one", "__isgap", "__gap", "__res"])

    per_norm = grouped_agg(
        lagged.map_batches(gaps, batch_format="pyarrow"),
        ["norm"],
        [("__one", "sum", "n_turns"), ("__isgap", "sum", "n_gaps"),
         ("__gap", "max", "max_gap"), ("__res", "sum", "n_resurfaces")])

    convs = grouped_agg(
        grouped_agg(tn.map_batches(
            lambda t: t.select(["norm", "conv_id"]),
            batch_format="pyarrow"),
            ["norm", "conv_id"], [("conv_id", "count", "__c")])
        .select_columns(["norm"]),
        ["norm"], [("norm", "count", "n_convs")])

    out = adaptive_join(per_norm, convs, on="norm")

    def finish(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("norm"), t.column("n_convs").cast(pa.int64()),
             t.column("n_turns").cast(pa.int64()),
             t.column("n_gaps").cast(pa.int64()),
             pc.coalesce(t.column("max_gap"),
                         pa.scalar(0)).cast(pa.int64()),
             t.column("n_resurfaces").cast(pa.int64())],
            names=["norm", "n_convs", "n_turns", "n_gaps", "max_gap",
                   "n_resurfaces"])

    return out.map_batches(finish, batch_format="pyarrow")


def conv_c4_line_filter(sf_dir: str):
    """C4 cleaning rewrite at CONVERSATION granularity — turns are the
    "lines": keep turns ending in terminal punctuation with >= 5 words
    and no 'javascript'; drop dialogs mentioning lorem ipsum / braces or
    with < 3 surviving turns. The actual filter the c4_signals pass only
    scores (the flat documents table is single-line word salad, so the
    line rules are exercised on assembled dialogs). One fragment
    exchange to assemble, then map-only."""
    from easyner_ray.ops.textstats import c4_line_filter

    docs = _assembled_convs(sf_dir)  # memoized shared upstream
    return c4_line_filter(docs.select_columns(["conv_id", "text"]),
                          id_col="conv_id")


def conv_dedup(sf_dir: str):
    """Whole-dialog exact dedup: group conversations on their ordered
    content fingerprint (conv_fingerprints' md5), keep the min conv_id
    as representative with the copy count — the conversation-granularity
    analog of dedup_exact_docs for SFT sets scraped from overlapping
    sources. One vocab... fingerprint-keyspace grouped final downstream
    of the fingerprint fragment exchange."""
    from easyner_ray.ops.conversations import conv_fingerprint
    from easyner_ray.ops.relational import grouped_agg

    fp = conv_fingerprint(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "text"]))
    out = grouped_agg(
        fp.map_batches(lambda t: t.select(["text_md5", "conv_id"]),
                       batch_format="pyarrow"),
        ["text_md5"],
        [("conv_id", "min", "conv_id"), ("conv_id", "count", "n_copies")])
    return out.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("conv_id"), t.column("n_copies").cast(pa.int64())],
            names=["conv_id", "n_copies"]),
        batch_format="pyarrow")


def kg_entity_roles(sf_dir: str):
    """Entity-role affinity: for each entity, how many of its mentions
    sit in user vs assistant vs other turns, and the user share — who
    drives each topic into the dialog. Rides the same turn-key join as
    kg_mention_yield (mentions joined to the pruned (conv, turn, role)
    read), then one vocab x role grouped final; the share is one IEEE
    division (bit-exact, no grain)."""
    from easyner_ray.ops.graph_analytics import _SEP
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    tr = _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "role"])

    def turn_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"), pc.cast(t.column("turn_idx"), pa.string()),
            _SEP)
        return pa.Table.from_arrays([k, t.column("role")],
                                    names=["__k", "role"])

    def mention_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"), pc.cast(t.column("turn_idx"), pa.string()),
            _SEP)
        return pa.Table.from_arrays([k, t.column("norm")],
                                    names=["__k", "norm"])

    j = adaptive_join(
        _mentions(sf_dir).map_batches(mention_key, batch_format="pyarrow"),
        tr.map_batches(turn_key, batch_format="pyarrow").materialize(),
        on="__k")

    def partial(t: pa.Table) -> pa.Table:
        role = t.column("role")
        u = pc.equal(role, "user").cast(pa.int64())
        a = pc.equal(role, "assistant").cast(pa.int64())
        o = pc.and_(pc.not_equal(role, "user"),
                    pc.not_equal(role, "assistant")).cast(pa.int64())
        return pa.Table.from_arrays(
            [t.column("norm"), u, a, o],
            names=["norm", "__u", "__a", "__o"])

    per = grouped_agg(
        j.map_batches(partial, batch_format="pyarrow"),
        ["norm"],
        [("__u", "sum", "n_user"), ("__a", "sum", "n_assistant"),
         ("__o", "sum", "n_other")])

    def finish(t: pa.Table) -> pa.Table:
        u = t.column("n_user").cast(pa.int64())
        a = t.column("n_assistant").cast(pa.int64())
        o = t.column("n_other").cast(pa.int64())
        tot = pc.add(pc.add(u, a), o)
        share = pc.divide(u.cast(pa.float64()), tot.cast(pa.float64()))
        return pa.Table.from_arrays(
            [t.column("norm"), u, a, o, tot.cast(pa.int64()), share],
            names=["norm", "n_user", "n_assistant", "n_other",
                   "n_mentions", "user_share"])

    return per.map_batches(finish, batch_format="pyarrow")


def conv_dup_line_keep_first(sf_dir: str):
    """CCNet-style keep-first line dedup at conversation granularity:
    turns repeated verbatim across dialogs survive only in the
    min-conv_id dialog carrying them (163 duplicated turn texts / 1180
    occurrences at sf0.01) — the retention complement of the
    delete-every-copy boilerplate cut."""
    from easyner_ray.ops.dedup import dup_line_keep_first

    docs = _assembled_convs(sf_dir) \
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("conv_id"), t.column("text")],
                names=["doc_id", "text"]),
            batch_format="pyarrow")
    out = dup_line_keep_first(docs)
    return out.map_batches(
        lambda t: t.rename_columns(["conv_id", "text_clean", "n_removed"]),
        batch_format="pyarrow")


def embeddings_rp_reduce(sf_dir: str):
    """Johnson-Lindenstrauss reduce: 64-dim embeddings projected to 16
    dims through a deterministic Achlioptas +-1/0 matrix (splitmix64-
    positional, no RNG state) — the project-once step before ANN at
    scale. Map-only; exploded (vec_id, dim_idx, value) output; oracle =
    straight-line recompute (gold_rp_reduce.parquet)."""
    from easyner_ray.ops.similarity import rp_reduce

    return rp_reduce(_rp(sf_dir, "embeddings",
                         columns=["vec_id", "embedding"]), 16)


def docs_containment_pairs(sf_dir: str):
    """Subset-copy pairs: exact shingle-set containment
    inter/min(|A|,|B|) >= 0.4 over word trigrams — catches a document
    embedded inside a larger one, where Jaccard collapses. Shares the
    inverted-index candidate machinery with ngram_jaccard_pairs."""
    from easyner_ray.ops.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.4)


def docs_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth: distinct terms first appearing in
    each of 20 equal-width doc-id slices plus the running vocabulary —
    the "is the crawl still finding new language?" corpus-assembly
    diagnostic (ops.textstats.vocab_growth: tf partials -> grouped
    min(doc_id) over the term keyspace -> integer bucketing -> a
    bucket-sized cumulative table)."""
    from easyner_ray.ops.textstats import vocab_growth

    return vocab_growth(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]),
        n_buckets=20)


def docs_zipf_slope(sf_dir: str):
    """Zipf rank-frequency fit: OLS of ln(count) on ln(rank) over the
    top-1000 vocabulary terms (ops.textstats.zipf_fit) — natural
    language sits near slope -1; template spam / synthetic floods bend
    it. One vocab-keyspace grouped sum + a 1000-row driver regression
    with SQL regr_slope/regr_intercept population semantics."""
    from easyner_ray.ops.textstats import zipf_fit

    return zipf_fit(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]),
        top_k=1000)


def docs_ngram_novelty(sf_dir: str):
    """Per-document trigram novelty census: of each doc's distinct word
    trigrams, how many appear in NO earlier document (by doc_id) —
    the freshness/memorization signal of incremental corpus assembly
    (ops.textstats.ngram_novelty: distinct-gram partials -> grouped
    min over the gram keyspace -> adaptive join back -> per-doc
    integer counts; the rate is the caller's division)."""
    from easyner_ray.ops.textstats import ngram_novelty

    return ngram_novelty(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]))


def kg_closeness(sf_dir: str):
    """Closeness-centrality moments per KG node: reach count and total
    hop distance to everything in the node's component (exact int64;
    closeness = n_reachable/sum_dist is the caller's division). Same
    broadcast-CSR BFS fan as kg_eccentricity
    (ops.graph_analytics.closeness)."""
    from easyner_ray.ops.graph_analytics import closeness

    return closeness(_kg_edge_pairs(sf_dir))


def kg_reciprocity(sf_dir: str):
    """Per-entity reciprocity census over the DIRECTED turn-transition
    graph: distinct out-neighbors vs how many point back — one-way
    foreshadowing vs mutual flow (ops.graph_analytics.reciprocity:
    packed-key self-probe through the adaptive join + one node-keyspace
    grouped sum)."""
    from easyner_ray.ops.graph_analytics import reciprocity

    return reciprocity(_kg_transition_pairs(sf_dir))


def conv_tool_transitions(sf_dir: str):
    """Tool-call chain census over agent transcripts: how often each
    tool's NEXT tool call (within the conversation, skipping chat
    turns) is each other tool (ops.conversations.tool_transitions:
    map-only prune -> one bucketed lead() exchange -> |tools|^2
    grouped count)."""
    from easyner_ray.ops.conversations import tool_transitions

    return tool_transitions(_transcripts_cols(
        sf_dir, ["conv_id", "turn_idx", "tool"]))


def docs_keywords(sf_dir: str):
    """Keyword extraction: the top-3 TF-IDF terms per document (score
    desc, term asc at the rounded grain) — the per-doc tagging/labeling
    primitive (search facets, topic seeds, weak labels). Rides the
    existing tfidf kernel (exact tf partials + two-phase df) and the
    bucketed vectorized ``topk_per_group`` — one multi-key sort per
    hash bucket, no per-group Python."""
    from easyner_ray.ops.relational import topk_per_group
    from easyner_ray.ops.textstats import tfidf

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    top = topk_per_group(tfidf(d), ["doc_id"], "tfidf", 3,
                         descending=True, tie_cols=["term"],
                         rank_name="rank")
    return top.map_batches(
        lambda t: t.select(["doc_id", "term", "tfidf", "rank"]),
        batch_format="pyarrow")


def docs_lexical_diversity(sf_dir: str):
    """Lexical-diversity profile per document: token count, distinct
    type count (TTR numerator, integers) and unigram Shannon entropy —
    the repetitive/templated-text gate of quality filtering
    (ops.textstats.lexical_diversity, map-only: a doc's histogram
    completes inside its batch, no exchange at any scale)."""
    from easyner_ray.ops.textstats import lexical_diversity

    return lexical_diversity(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]))


def conv_compression(sf_dir: str):
    """Per-conversation zlib compressibility census (raw vs DEFLATE
    bytes, exact int64) — the "templated text compresses too well"
    quality gate at dialog granularity
    (ops.conversations.compression_ratio; oracle = straight-line
    recompute, gold_compression.parquet)."""
    from easyner_ray.ops.conversations import compression_ratio

    return compression_ratio(None, assembled=_assembled_convs(sf_dir))


def conv_minhash_pairs(sf_dir: str):
    """Conversation-level NEAR-dedup: MinHash-LSH candidate pairs over
    the assembled dialogs (conv_fingerprints is the exact twin; this
    catches lightly-edited rerolls of the same conversation). Rides
    assemble_conversations (one fragment exchange) + the banded
    minhash_lsh_pairs kernel; ids are the numeric conv suffix so the
    int64 pair contract holds. Oracle = straight-line recompute
    (gold_conv_minhash.parquet)."""
    from easyner_ray.ops.dedup import minhash_lsh_pairs

    conv = _assembled_convs(sf_dir)  # memoized shared upstream

    def to_docs(t):
        return pa.table({
            "doc_id": pc.cast(pc.utf8_slice_codeunits(
                t.column("conv_id").combine_chunks(), 4, 32), pa.int64()),
            "text": t.column("text")})

    pairs = minhash_lsh_pairs(conv.map_batches(
        to_docs, batch_format="pyarrow"), threshold=0.5)
    out = pairs.map_batches(
        lambda t: t.rename_columns(["conv_a", "conv_b", "est_jaccard"]),
        batch_format="pyarrow")
    # return a concrete Arrow table (the pair set is bounded): a corpus
    # with NO near-dup dialogs is a legitimate zero-row result, and
    # Dataset.to_pandas drops the column names of an all-empty Dataset —
    # the typed empty table keeps the schema contract either way
    import ray

    empty = pa.table({"conv_a": pa.array([], pa.int64()),
                      "conv_b": pa.array([], pa.int64()),
                      "est_jaccard": pa.array([], pa.float64())})
    blocks = [b for b in ray.get(out.to_arrow_refs()) if len(b)]
    return pa.concat_tables([empty] + [b.select(empty.column_names)
                                       for b in blocks])


def events_daily_growth(sf_dir: str):
    """Trend monitoring: daily event counts per type with the previous
    day's count alongside (the growth RATE is the caller's division —
    integer counts, no float grain). One grouped count onto the tiny
    (type x day) keyspace, then the bucketed lag() exchange of
    ops.analytic.partitioned_analytics — the day-over-day anomaly
    primitive of pipeline monitoring."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["event_type", "ts"])

    def day_key(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "day": pc.floor_temporal(t.column("ts"), unit="day")})

    daily = grouped_agg(ev.map_batches(day_key, batch_format="pyarrow"),
                        ["event_type", "day"], [("day", "count", "n")])
    led = partitioned_analytics(daily, ["event_type"], ["day"],
                                [("lag", "n", "prev_n")])

    def fill(t: pa.Table) -> pa.Table:
        # first day of a type has no predecessor: 0, not NULL — a NULL
        # int column round-trips to float NaN in pandas and breaks the
        # cross-engine value hash
        return t.set_column(
            t.schema.get_field_index("prev_n"), "prev_n",
            pc.fill_null(t.column("prev_n"), 0).cast(pa.int64()))

    return led.map_batches(fill, batch_format="pyarrow")


def docs_dup_pairs_by_source(sf_dir: str):
    """Near-dup DIAGNOSTICS rollup: which source pairs duplicate each
    other — MinHash candidate pairs joined back to each side's source
    label (two adaptive broadcast/hash joins against the tiny
    (doc_id, source) projection), collapsed to unordered source pairs
    with a grouped count. The "is source B a re-crawl of source A"
    question a curation run answers before dropping anything."""
    from easyner_ray.ops.dedup import minhash_lsh_pairs
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    docs = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])
    # checkpoint the candidate pairs: the two adaptive joins each probe
    # schema + byte size, and an unmaterialized pairs plan re-runs the
    # whole shingle->minhash->band chain per probe (plans are trees)
    pairs = minhash_lsh_pairs(
        docs.select_columns(["doc_id", "text"]), threshold=0.2).materialize()
    src = docs.map_batches(
        lambda t: t.select(["doc_id", "source"]), batch_format="pyarrow")
    a_side = src.map_batches(
        lambda t: t.rename_columns(["doc_a", "src_of_a"]),
        batch_format="pyarrow")
    b_side = src.map_batches(
        lambda t: t.rename_columns(["doc_b", "src_of_b"]),
        batch_format="pyarrow")
    j = adaptive_join(adaptive_join(pairs, a_side, on="doc_a"),
                      b_side, on="doc_b")

    def canon_pair(t: pa.Table) -> pa.Table:
        a = t.column("src_of_a").combine_chunks()
        b = t.column("src_of_b").combine_chunks()
        return pa.table({"src_a": pc.min_element_wise(a, b),
                         "src_b": pc.max_element_wise(a, b)})

    out = grouped_agg(j.map_batches(canon_pair, batch_format="pyarrow"),
                      ["src_a", "src_b"], [("src_a", "count", "n_pairs")])
    # a dup-free corpus yields zero blocks: typed Arrow return (see
    # conv_minhash_pairs)
    import ray

    empty = pa.table({"src_a": pa.array([], pa.string()),
                      "src_b": pa.array([], pa.string()),
                      "n_pairs": pa.array([], pa.int64())})
    blocks = [t for t in ray.get(out.to_arrow_refs()) if len(t)]
    return pa.concat_tables([empty] + [t.select(empty.column_names)
                                       for t in blocks])


def docs_top_ngrams(sf_dir: str):
    """WIMBD-style corpus census: the 20 most frequent word trigrams
    with multiplicity — boilerplate phrases, template fragments and
    license headers surface here before any dedup decision
    (ops.textstats.top_ngrams: per-batch gram-count partials -> one
    grouped sum over the gram keyspace -> deterministic global top-k)."""
    from easyner_ray.ops.textstats import top_ngrams

    return top_ngrams(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), k=20)


def events_ewma(sf_dir: str):
    """Per-user EWMA (decay 0.5) of event value over the user's full
    ordered history — the drift/trend summary of monitoring pipelines
    (ops.analytic.ewma_final: one hash-bucket exchange on user_id,
    per-bucket sort, exact power-of-two weights + ordered left-fold so
    the SQL oracle's list_reduce is bit-equal pre-round)."""
    from easyner_ray.ops.analytic import ewma_final

    ev = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return ewma_final(ev, ["user_id"], ["ts", "event_id"], "value")


def kg_bridges(sf_dir: str):
    """Bridge (cut) edges of the KG co-occurrence graph: entity pairs
    whose ONLY connecting evidence is the edge itself — the fragile
    links an auditor re-verifies first. Oracle = straight-line
    definitional recompute (per-edge removal + BFS,
    gold_bridges.parquet); the engine runs one Tarjan low-link DFS over
    the broadcast vocab-bounded CSR (ops.graph_analytics.bridges)."""
    import ray

    from easyner_ray.ops.graph_analytics import bridges

    out = bridges(_kg_edge_pairs(sf_dir))
    # a dense co-occurrence graph legitimately has ZERO bridges (every
    # edge sits in a triangle): typed Arrow return keeps the schema
    # contract (see conv_minhash_pairs)
    empty = pa.table({"norm_a": pa.array([], pa.string()),
                      "norm_b": pa.array([], pa.string())})
    blocks = [t for t in ray.get(out.to_arrow_refs()) if len(t)]
    return pa.concat_tables([empty] + [t.select(empty.column_names)
                                       for t in blocks])


def docs_readability(sf_dir: str):
    """Flesch-style readability components per document — exact integer
    word / sentence-terminator / vowel-group run counts; the reading-
    ease formula is the caller's arithmetic (ops.textstats.readability,
    map-only)."""
    from easyner_ray.ops.textstats import readability

    return readability(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]))


def docs_lang_mismatch(sf_dir: str):
    """Label-quality audit: declared ``lang`` metadata vs the LangID
    kernel's prediction, as a (declared, predicted) confusion census —
    the "is this corpus's language column trustworthy" gate run before
    any lang_filter drops data. Rides the lang_id kernel (per-doc
    preds), one adaptive join against the 2-column (doc_id, lang)
    projection, then a grouped count onto the |langs|^2 keyspace."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg
    from easyner_ray.ops.textstats import lang_id

    preds = lang_id(_rp(sf_dir, "documents", columns=["doc_id", "text"]))
    meta = _rp(sf_dir, "documents", columns=["doc_id", "lang"])
    j = adaptive_join(preds.select_columns(["doc_id", "lang_pred"]),
                      meta, on="doc_id")

    def census(t: pa.Table) -> pa.Table:
        return pa.table({"declared": t.column("lang"),
                         "predicted": t.column("lang_pred")})

    return grouped_agg(j.map_batches(census, batch_format="pyarrow"),
                       ["declared", "predicted"],
                       [("declared", "count", "n_docs")])


def docs_length_integrity(sf_dir: str):
    """Ingest-validation gate: per source, how many documents' declared
    ``n_chars`` metadata disagrees with the payload's actual character
    count — the cheap corruption/truncation tripwire a 100 TB ingest
    runs on every shard (map-only: one utf8_length C pass + a grouped
    sum onto the |sources| keyspace)."""
    from easyner_ray.ops.relational import grouped_agg

    d = _rp(sf_dir, "documents", columns=["source", "n_chars", "text"])

    def flags(t: pa.Table) -> pa.Table:
        actual = pc.cast(pc.utf8_length(t.column("text").combine_chunks()),
                         pa.int64())
        bad = pc.cast(pc.not_equal(t.column("n_chars").combine_chunks()
                                   .cast(pa.int64()), actual), pa.int64())
        ones = pc.cast(pc.is_valid(bad), pa.int64())
        return pa.table({"source": t.column("source"),
                         "n_docs": ones, "n_mismatch": bad})

    return grouped_agg(d.map_batches(flags, batch_format="pyarrow"),
                       ["source"], [("n_docs", "sum", "n_docs"),
                                    ("n_mismatch", "sum", "n_mismatch")])


def kg_shortest_paths(sf_dir: str):
    """Shortest evidence chains from the first two watchlist seeds to
    every reachable entity: hop count plus the reconstructed
    ``seed -> ... -> node`` path under the deterministic
    min-name-predecessor rule — the "how are these connected" audit
    query (ops.graph_analytics.shortest_paths: broadcast-CSR fan, one
    level-synchronous BFS task per seed, one-pass predecessor derive,
    whole-level path concatenation). Oracle = straight-line dict BFS
    recompute (gold_shortest_paths.parquet)."""
    from easyner_ray.ops.graph_analytics import shortest_paths

    return shortest_paths(_kg_edge_pairs(sf_dir),
                          ("zetamycin", "actozine"))


def docs_dedup_retention(sf_dir: str):
    """Dedup IMPACT report per source: MinHash candidate pairs under
    pairwise keep-first semantics (any doc appearing as the larger id
    of a pair is dropped) rolled up to (source, n_docs, n_dropped) —
    the "which sources does dedup hit hardest" budget question answered
    BEFORE committing to the drop. One distinct-drop set (grouped
    distinct over the pair stream's doc_b side), one adaptive join
    against the 2-column (doc_id, source) projection, one grouped sum
    onto the |sources| keyspace."""
    from easyner_ray.ops.dedup import minhash_lsh_pairs
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    docs = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])
    pairs = minhash_lsh_pairs(
        docs.select_columns(["doc_id", "text"]), threshold=0.2)
    dropped = grouped_agg(
        pairs.map_batches(
            lambda t: pa.table({
                "doc_id": pc.max_element_wise(
                    t.column("doc_a").combine_chunks(),
                    t.column("doc_b").combine_chunks()),
                "one": pa.array([1] * len(t), pa.int64())}),
            batch_format="pyarrow"),
        ["doc_id"], [("one", "max", "__seen")])
    meta = docs.map_batches(lambda t: t.select(["doc_id", "source"]),
                            batch_format="pyarrow")
    j = adaptive_join(meta, dropped, on="doc_id", how="left")

    def flags(t: pa.Table) -> pa.Table:
        hit = pc.cast(pc.is_valid(t.column("__seen").combine_chunks()),
                      pa.int64())
        ones = pc.cast(pc.greater_equal(hit, 0), pa.int64())
        return pa.table({"source": t.column("source"),
                         "n_docs": ones, "n_dropped": hit})

    return grouped_agg(j.map_batches(flags, batch_format="pyarrow"),
                       ["source"], [("n_docs", "sum", "n_docs"),
                                    ("n_dropped", "sum", "n_dropped")])


def events_type_transitions(sf_dir: str):
    """Behavioral bigram census: per-user consecutive event-type
    transitions (ordered by ts, event_id) counted into the
    |types|^2 matrix — the funnel/next-action primitive
    (ops.analytic.partitioned_analytics lead() exchange on user_id,
    then a grouped count)."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])
    led = partitioned_analytics(ev, ["user_id"], ["ts", "event_id"],
                                [("lead", "event_type", "next_type")])

    def prune(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t.column("next_type"))
        t = t.filter(keep)
        return pa.table({"event_type": t.column("event_type"),
                         "next_type": t.column("next_type")})

    return grouped_agg(led.map_batches(prune, batch_format="pyarrow"),
                       ["event_type", "next_type"],
                       [("event_type", "count", "n")])


def events_interarrival(sf_dir: str):
    """Per-user inter-event gap profile -> (user_id, n_gaps,
    total_gap_s, max_gap_s): exact integer seconds between consecutive
    events (ordered by ts, event_id) — the burstiness/engagement-decay
    signal (mean gap is the caller's division). Same bucketed lag()
    exchange as events_running_totals."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    led = partitioned_analytics(ev, ["user_id"], ["ts", "event_id"],
                                [("lag", "ts", "prev_ts")])

    def gaps(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t.column("prev_ts"))
        t = t.filter(keep)
        us = pc.cast(pc.subtract(
            t.column("ts").combine_chunks().cast(pa.int64()),
            t.column("prev_ts").combine_chunks().cast(pa.int64())),
            pa.int64())
        s = pc.divide(us, 1_000_000)
        ones = pc.cast(pc.greater_equal(s, s), pa.int64())
        return pa.table({"user_id": t.column("user_id"),
                         "n_gaps": ones, "gap_s": s})

    return grouped_agg(led.map_batches(gaps, batch_format="pyarrow"),
                       ["user_id"], [("n_gaps", "sum", "n_gaps"),
                                     ("gap_s", "sum", "total_gap_s"),
                                     ("gap_s", "max", "max_gap_s")])


def events_user_type_entropy(sf_dir: str):
    """Behavioral-diversity profile per user -> (user_id, n_events,
    n_types, entropy): Shannon entropy of the user's event-type
    distribution — the segmentation feature separating single-purpose
    accounts from diverse ones. Two-phase grouped (user, type) counts
    collapse the corpus to the |users| x |types| keyspace FIRST; the
    per-user entropy kernel then runs on that bounded table (one
    hash-bucket exchange, descending-probability accumulation order,
    round 4 like docs_lexical_diversity)."""
    import numpy as np

    from easyner_ray.ops.relational import add_hash_bucket, grouped_agg

    ev = _rp(sf_dir, "events", columns=["user_id", "event_type"])
    counts = grouped_agg(ev, ["user_id", "event_type"],
                         [("event_type", "count", "tf")])

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket"])
        if len(t) == 0:
            return pa.schema(
                [pa.field("user_id", pa.int64()),
                 pa.field("n_events", pa.int64()),
                 pa.field("n_types", pa.int64()),
                 pa.field("entropy", pa.float64())]).empty_table()
        idx = pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("tf", "descending"),
            ("event_type", "ascending")])
        t = t.take(idx)
        ids = t.column("user_id").combine_chunks()
        enc = ids.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        tf = np.asarray(t.column("tf"), dtype=np.float64)
        n_ev = np.bincount(codes, weights=tf)
        n_ty = np.bincount(codes)
        p = tf / n_ev[codes]
        ent = np.bincount(codes, weights=-p * np.log(p))
        return pa.table({
            "user_id": enc.dictionary,
            "n_events": pa.array(n_ev.astype(np.int64), pa.int64()),
            "n_types": pa.array(n_ty.astype(np.int64), pa.int64()),
            "entropy": pa.array([round(float(v), 4) for v in ent],
                                pa.float64())})

    bucketed = counts.map_batches(
        lambda t: add_hash_bucket(t, ["user_id"], 32),
        batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow")


def docs_quality_percentile(sf_dir: str):
    """Per-SOURCE quality calibration: each document's percent_rank of
    stopword_ratio within its source -> (doc_id, source,
    stopword_ratio, pct) — the per-domain threshold practice (a 0.3
    stopword ratio is great for code, poor for prose; global cutoffs
    misfire). stopword_ratio is an exact int/int division so both
    engines produce identical float64; percent_rank = (rank-1)/(n-1)
    is ints-only — bit-stable with no rounding grain. Rides the
    quality kernel + one bucketed rank exchange
    (ops.analytic.partitioned_analytics, rank_prefix=1)."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import adaptive_join
    from easyner_ray.ops.textstats import quality_scores

    d = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])
    qs = quality_scores(d.select_columns(["doc_id", "text"]))
    meta = d.map_batches(lambda t: t.select(["doc_id", "source"]),
                         batch_format="pyarrow")
    j = adaptive_join(
        qs.map_batches(lambda t: t.select(["doc_id", "stopword_ratio"]),
                       batch_format="pyarrow"),
        meta, on="doc_id")
    ranked = partitioned_analytics(
        j, ["source"], ["stopword_ratio", "doc_id"],
        [("percent_rank", None, "pct")], rank_prefix=1)
    return ranked.map_batches(
        lambda t: t.select(["doc_id", "source", "stopword_ratio", "pct"]),
        batch_format="pyarrow")


def knn_ivf_incremental(sf_dir: str):
    """Incremental ANN-index lifecycle, end to end: build the persisted
    IVF index from the BASE slice (vec_id % 5 != 0), append the delta
    slice (vec_id % 5 == 0) WITHOUT retraining centroids
    (ops.similarity.append_ivf_index — O(delta) nightly ingest), then
    answer the standard 4-query top-10 through the partition-pruned
    indexed read (knn_ivf_indexed). Certifies the incremental property:
    results equal a full query over base+delta with base-trained
    centroids (gold_knn_ivf_incremental.parquet)."""
    import tempfile

    from easyner_ray.ops.similarity import (append_ivf_index,
                                            build_ivf_index,
                                            knn_ivf_indexed)

    emb = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def part(keep_base: bool):
        def f(t: pa.Table) -> pa.Table:
            import numpy as np

            ids = np.asarray(t.column("vec_id").combine_chunks(),
                             dtype=np.int64)
            m = (ids % 5) == 0
            return t.filter(pa.array(~m if keep_base else m))
        return emb.map_batches(f, batch_format="pyarrow")

    idx_dir = tempfile.mkdtemp(prefix="ivf_incr_")
    # sort the base slice: the filter map stage breaks Ray's block-order
    # guarantee, and train_centroids samples the FIRST 4096 rows — the
    # sort pins the sample to vec_id order (= file order here), which is
    # what the gold recompute specifies
    build_ivf_index(part(True).sort("vec_id"), idx_dir)
    append_ivf_index(idx_dir, part(False))
    return knn_ivf_indexed(idx_dir, _query_vectors(sf_dir), k=10) \
        .select_columns(["query_id", "rank", "vec_id"])


def docs_corpus_card(sf_dir: str):
    """One-row corpus DATASHEET: doc / source / lang counts, total
    chars and whitespace-token counts, empty-doc count — the headline
    numbers of a dataset card, computed in one streaming pass of
    map-only partials plus two tiny distinct rollups (|sources| and
    |langs| keyspaces). All exact integers."""
    import ray

    from easyner_ray.ops.relational import grouped_agg

    d = _rp(sf_dir, "documents", columns=["source", "lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column("text").combine_chunks()
        chars = pc.cast(pc.utf8_length(txt), pa.int64())
        toks = pc.cast(pc.count_substring_regex(txt, r"[^\s]+"),
                       pa.int64())
        return pa.table({
            "n_docs": pa.array([len(t)], pa.int64()),
            "total_chars": pa.array(
                [pc.sum(chars).as_py() or 0], pa.int64()),
            "total_tokens": pa.array(
                [pc.sum(toks).as_py() or 0], pa.int64()),
            "n_empty": pa.array(
                [pc.sum(pc.cast(pc.equal(chars, 0), pa.int64())).as_py()
                 or 0], pa.int64())})

    sums = {"n_docs": 0, "total_chars": 0, "total_tokens": 0, "n_empty": 0}
    for b in ray.get(d.map_batches(
            partial, batch_format="pyarrow").to_arrow_refs()):
        for k in sums:
            col = b.column(k)
            sums[k] += pc.sum(col).as_py() or 0
    n_sources = grouped_agg(d.select_columns(["source"]), ["source"],
                            [("source", "count", "__c")]).count()
    n_langs = grouped_agg(d.select_columns(["lang"]), ["lang"],
                          [("lang", "count", "__c")]).count()
    return pa.table({
        "n_docs": pa.array([sums["n_docs"]], pa.int64()),
        "n_sources": pa.array([n_sources], pa.int64()),
        "n_langs": pa.array([n_langs], pa.int64()),
        "total_chars": pa.array([sums["total_chars"]], pa.int64()),
        "total_tokens": pa.array([sums["total_tokens"]], pa.int64()),
        "n_empty": pa.array([sums["n_empty"]], pa.int64())})


def docs_token_histogram(sf_dir: str):
    """Token-count distribution of the corpus in fixed-width bins of 64
    -> (bucket, n_docs), bucket = n_tokens // 64 — the length-
    distribution diagnostic behind every min/max-token threshold
    choice. Map-only partial counts onto the tiny bucket keyspace."""
    import numpy as np

    from easyner_ray.ops.relational import grouped_agg
    from easyner_ray.ops.textstats import WS_TOKEN_RE

    d = _rp(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        n = np.asarray(pc.count_substring_regex(
            t.column("text").combine_chunks(), WS_TOKEN_RE),
            dtype=np.int64)
        return pa.table({"bucket": pa.array(n // 64, pa.int64()),
                         "one": pa.array(np.ones(len(n), np.int64))})

    return grouped_agg(d.map_batches(partial, batch_format="pyarrow"),
                       ["bucket"], [("one", "sum", "n_docs")])


def events_burst(sf_dir: str):
    """Burst detection per user: the maximum number of events inside
    ANY sliding 1-hour window of the user's history -> (user_id,
    max_burst) — the rate-limit / abuse tripwire. One hash-bucket
    exchange on user_id, then a pure-numpy two-pointer window count
    per bucket (searchsorted of ts+1h into the user's sorted ts run) —
    no per-event Python, exact integers."""
    import numpy as np

    from easyner_ray.ops.relational import add_hash_bucket

    ev = _rp(sf_dir, "events", columns=["user_id", "ts"])

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket"])
        if len(t) == 0:
            return pa.schema([pa.field("user_id", pa.int64()),
                              pa.field("max_burst", pa.int64())]) \
                .empty_table()
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending")])
        t = t.take(idx)
        uid = np.asarray(t.column("user_id").combine_chunks(),
                         dtype=np.int64)
        ts = np.asarray(t.column("ts").combine_chunks()
                        .cast(pa.int64()), dtype=np.int64)
        n = len(t)
        starts = np.flatnonzero(np.concatenate(
            [[True], uid[1:] != uid[:-1]]))
        seg_len = np.diff(np.append(starts, n))
        start_of = np.repeat(starts, seg_len)
        end_of = start_of + np.repeat(seg_len, seg_len)
        # count events in [ts_i, ts_i + 1h) within the user's run. ts is
        # sorted only WITHIN runs, so build a strictly increasing global
        # key: per-run relative time plus cumulative run bases spaced by
        # (run span + window + 1) — probes can never cross a run
        # boundary, and one global searchsorted answers every window
        W = 3_600_000_000  # 1h in microseconds
        ends = starts + seg_len
        run_min = ts[starts]
        run_max = ts[ends - 1]
        span = run_max - run_min
        base = np.concatenate([[0], np.cumsum(span + W + 1)[:-1]])
        adj = (ts - np.repeat(run_min, seg_len)
               + np.repeat(base, seg_len))
        upper = np.searchsorted(adj, adj + W, side="left")
        w = np.minimum(upper, end_of) - np.arange(n)
        out = np.maximum.reduceat(w, starts)
        return pa.table({
            "user_id": t.column("user_id").take(pa.array(starts)),
            "max_burst": pa.array(out.astype(np.int64), pa.int64())})

    bucketed = ev.map_batches(
        lambda t: add_hash_bucket(t, ["user_id"], 32),
        batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow")


def conv_window_dedup(sf_dir: str):
    """Training-EXAMPLE dedup: exact duplicate (context, target) SFT
    windows across the whole corpus -> (context, target, n_copies,
    first_conv) for every window occurring >= 2 times — whole-dialog
    dedup misses these (two different conversations re-deriving the
    same exchange), and duplicated examples are what actually skew SFT
    gradients. Rides context_windows (bucketed shifted-column
    assembly), then one grouped count over the window keyspace."""
    from easyner_ray.ops.conversations import context_windows
    from easyner_ray.ops.relational import grouped_agg

    w = context_windows(
        _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "role", "text"]),
        k=3)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "context": t.column("context"),
            "target": t.column("target"),
            "conv_id": t.column("conv_id"),
            "one": pa.array([1] * len(t), pa.int64())})

    g = grouped_agg(w.map_batches(one, batch_format="pyarrow"),
                    ["context", "target"],
                    [("one", "sum", "n_copies"),
                     ("conv_id", "min", "first_conv")])
    out = g.filter(lambda r: r["n_copies"] >= 2)
    # a dedup-clean corpus yields zero rows: typed Arrow return (see
    # conv_minhash_pairs)
    import ray

    empty = pa.table({"context": pa.array([], pa.string()),
                      "target": pa.array([], pa.string()),
                      "n_copies": pa.array([], pa.int64()),
                      "first_conv": pa.array([], pa.string())})
    blocks = [t for t in ray.get(out.to_arrow_refs()) if len(t)]
    return pa.concat_tables([empty] + [t.select(empty.column_names)
                                       for t in blocks])


def tpch_q3_revenue(sf_dir: str):
    """TPC-H Q3 analog (shipping-priority revenue): BUILDING-segment
    customers' orders placed before 1998-01-01, lineitems shipped after
    it, top-10 orders by revenue. The canonical 3-table
    selective-join showcase: both fact-side reads are pruned to the
    filter columns, lineitem revenue is partially aggregated per
    orderkey INSIDE the batch before any exchange, and both joins are
    adaptive (broadcast under the byte gate). The top-10 cut sorts on
    the ROUNDED revenue with an orderkey tie-break so the cut is
    deterministic cross-engine."""
    from datetime import datetime

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    cutoff = datetime(1998, 1, 1)
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), "BUILDING"))
                   .select(["c_custkey"])
                   .rename_columns(["o_custkey"]),
        batch_format="pyarrow")
    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.less(t.column("o_orderdate"),
                                   pa.scalar(cutoff))),
        batch_format="pyarrow")
    o_side = adaptive_join(orders, cust, on="o_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate"])
                   .rename_columns(["l_orderkey", "o_orderdate"]),
        batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])

    def rev_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"),
                                pa.scalar(cutoff)))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      t.column("l_discount")))
        g = pa.Table.from_arrays(
            [t.column("l_orderkey"), rev], names=["l_orderkey", "rev"]) \
            .group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    j = adaptive_join(li.map_batches(rev_partial, batch_format="pyarrow"),
                      o_side, on="l_orderkey")
    agg = grouped_agg(j, ["l_orderkey", "o_orderdate"],
                      [("rev", "sum", "rev")])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "o_orderdate": t.column("o_orderdate"),
            "revenue": pc.round(t.column("rev"), 4)})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["revenue", "l_orderkey"], descending=[True, False]) \
        .limit(10)


def tpch_q5_region_revenue(sf_dir: str):
    """TPC-H Q5 analog (local-supplier volume): revenue per ASIA nation
    where the supplier and the ordering customer share the nation — the
    classic 6-table join. Dimension chain (region -> nation ->
    supplier / customer) stays broadcast-sized; the two fact joins are
    adaptive; the customer-nation == supplier-nation predicate is a
    post-join vectorized filter; final rollup onto the |nations|
    keyspace with round-4 revenue."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    region = _rp(sf_dir, "region", columns=["r_regionkey", "r_name"])
    region = region.map_batches(
        lambda t: t.filter(pc.equal(t.column("r_name"), "ASIA"))
                   .select(["r_regionkey"])
                   .rename_columns(["n_regionkey"]),
        batch_format="pyarrow")
    nation = adaptive_join(
        _rp(sf_dir, "nation",
            columns=["n_nationkey", "n_name", "n_regionkey"]),
        region, on="n_regionkey")
    supp = adaptive_join(
        _rp(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        nation.map_batches(
            lambda t: t.select(["n_nationkey", "n_name"])
                       .rename_columns(["s_nationkey", "n_name"]),
            batch_format="pyarrow"),
        on="s_nationkey")
    supp = supp.map_batches(
        lambda t: t.rename_columns(["l_suppkey", "s_nationkey", "n_name"]),
        batch_format="pyarrow")

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    o_side = adaptive_join(
        orders.map_batches(
            lambda t: t.rename_columns(["o_orderkey", "c_custkey"]),
            batch_format="pyarrow"),
        cust, on="c_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "c_nationkey"])
                   .rename_columns(["l_orderkey", "c_nationkey"]),
        batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "l_suppkey": t.column("l_suppkey"),
                         "rev": r})

    j = adaptive_join(
        adaptive_join(li.map_batches(rev, batch_format="pyarrow"),
                      supp, on="l_suppkey"),
        o_side, on="l_orderkey")

    def local_only(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("s_nationkey"), t.column("c_nationkey"))
        t = t.filter(keep)
        return pa.table({"n_name": t.column("n_name"),
                         "rev": t.column("rev")})

    agg = grouped_agg(j.map_batches(local_only, batch_format="pyarrow"),
                      ["n_name"], [("rev", "sum", "rev")])
    return agg.map_batches(
        lambda t: pa.table({"n_name": t.column("n_name"),
                            "revenue": pc.round(t.column("rev"), 4)}),
        batch_format="pyarrow")


def lineitem_pruned_profile(sf_dir: str):
    """Read-level filter-pushdown showcase: lineitems shipped on/after
    2000-01-01, profiled per returnflag -> (l_returnflag, n, sum_qty).
    The predicate is an Arrow dataset expression handed to
    ``read_parquet(filter=...)`` — row groups outside the date range
    never leave storage (the prune-at-the-read contract; at 100 TB this
    is the difference between scanning a year and scanning a decade).
    Quantities are integral doubles: the sum is exact below 2^53 and is
    emitted as int64."""
    import pyarrow.dataset as pads
    from datetime import datetime

    import ray.data as rd

    from easyner_ray.ops.relational import grouped_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_shipdate"],
        filter=pads.field("l_shipdate") >= datetime(2000, 1, 1))

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "one": pa.array([1] * len(t), pa.int64()),
            "qty": pc.cast(t.column("l_quantity"), pa.int64())})

    return grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["l_returnflag"], [("one", "sum", "n"),
                                          ("qty", "sum", "sum_qty")])


def events_heatmap(sf_dir: str):
    """Activity heatmap census: event counts per (ISO day-of-week,
    hour-of-day) cell -> (dow, hour, n) — the ops-dashboard staple and
    the load-shape input to batch-window scheduling. Map-only temporal
    kernels onto the fixed 7 x 24 keyspace."""
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["ts"])

    def cells(t: pa.Table) -> pa.Table:
        ts = t.column("ts").combine_chunks()
        return pa.table({
            # pyarrow day_of_week: Monday=0 -> +1 = ISO dow (Mon=1)
            "dow": pc.cast(pc.add(pc.day_of_week(ts), 1), pa.int64()),
            "hour": pc.cast(pc.hour(ts), pa.int64()),
            "one": pa.array([1] * len(t), pa.int64())})

    return grouped_agg(ev.map_batches(cells, batch_format="pyarrow"),
                       ["dow", "hour"], [("one", "sum", "n")])


def kg_entity_lifespan(sf_dir: str):
    """Entity lifespan census -> (norm, first_ts, last_ts, n_mentions,
    n_convs): when each entity first and last appears in the corpus,
    how often, and across how many conversations — the "is this entity
    current or historical" audit column of a temporal KG. One adaptive
    join of mentions to turn timestamps, a (norm, conv) rollup, then a
    vocab-bounded grouped final."""
    from easyner_ray.ops.graph_analytics import _SEP
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    def mention_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"),
            pc.cast(t.column("turn_idx"), pa.string()), _SEP)
        return pa.Table.from_arrays(
            [t.column("norm"), t.column("conv_id"), k],
            names=["norm", "conv_id", "__k"])

    def turn_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"),
            pc.cast(t.column("turn_idx"), pa.string()), _SEP)
        return pa.Table.from_arrays([k, t.column("ts")],
                                    names=["__k", "ts"])

    m = _mentions(sf_dir).map_batches(mention_key,
                                      batch_format="pyarrow")
    tr = _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "ts"]) \
        .map_batches(turn_key, batch_format="pyarrow")
    j = adaptive_join(m, tr, on="__k")
    per_conv = grouped_agg(j, ["norm", "conv_id"],
                           [("ts", "min", "first_ts"),
                            ("ts", "max", "last_ts"),
                            ("ts", "count", "n_mentions")])
    return grouped_agg(per_conv, ["norm"],
                       [("first_ts", "min", "first_ts"),
                        ("last_ts", "max", "last_ts"),
                        ("n_mentions", "sum", "n_mentions"),
                        ("conv_id", "count", "n_convs")])


def docs_cluster_keywords(sf_dir: str):
    """Cluster LABELING: the top-3 TF-IDF terms of each embedding
    cluster -> (cluster, rank, term, score) — the standard "what is
    this cluster about" readout after semantic clustering (topic
    browsing, pruning decisions). Composes the distributed Lloyd
    k-means assignments (vec_id = doc_id in this corpus) with the
    exact tfidf kernel via one adaptive join, a (cluster, term)
    grouped sum on rounded scores, and the bucketed vectorized
    topk_per_group — deterministic at the rounded grain with a term
    tie-break."""
    from easyner_ray.ops.relational import (adaptive_join, grouped_agg,
                                            topk_per_group)
    from easyner_ray.ops.similarity import kmeans
    from easyner_ray.ops.textstats import tfidf

    _corpus(sf_dir)  # gold keyed to this sf_dir
    em = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _, assign = kmeans(em, k=6, iters=4)
    assign = assign.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster"]),
        batch_format="pyarrow")
    tf = tfidf(_rp(sf_dir, "documents", columns=["doc_id", "text"]))
    j = adaptive_join(
        tf.map_batches(lambda t: t.select(["doc_id", "term", "tfidf"]),
                       batch_format="pyarrow"),
        assign, on="doc_id")
    agg = grouped_agg(j.map_batches(
        lambda t: t.select(["cluster", "term", "tfidf"]),
        batch_format="pyarrow"),
        ["cluster", "term"], [("tfidf", "sum", "score")])
    scored = agg.map_batches(
        lambda t: pa.table({"cluster": t.column("cluster"),
                            "term": t.column("term"),
                            "score": pc.round(t.column("score"), 4)}),
        batch_format="pyarrow")
    return topk_per_group(scored, ["cluster"], "score", 3,
                          descending=True, tie_cols=["term"],
                          rank_name="rank") \
        .select_columns(["cluster", "rank", "term", "score"])


def docs_jsonl_roundtrip(sf_dir: str):
    """Source-format certification for the JSONL path: stream the
    documents table out through Ray's JSON sink and back through
    ``read_json``, then profile the round-tripped corpus (doc count +
    total chars + id checksum) — proves the non-Parquet ingest path
    preserves every row and every code point. The oracle computes the
    same profile straight off the Parquet table, so any JSON
    escape/precision loss would hash-mismatch."""
    import tempfile

    import ray
    import ray.data as rd

    d = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out_dir = tempfile.mkdtemp(prefix="jsonl_rt_")
    d.write_json(out_dir)
    back = rd.read_json(out_dir)

    def partial(t: pa.Table) -> pa.Table:
        chars = pc.cast(pc.utf8_length(t.column("text").combine_chunks()),
                        pa.int64())
        return pa.table({
            "n_docs": pa.array([len(t)], pa.int64()),
            "total_chars": pa.array([pc.sum(chars).as_py() or 0],
                                    pa.int64()),
            "id_sum": pa.array(
                [pc.sum(t.column("doc_id")).as_py() or 0], pa.int64())})

    sums = {"n_docs": 0, "total_chars": 0, "id_sum": 0}
    for b in ray.get(back.map_batches(
            partial, batch_format="pyarrow").to_arrow_refs()):
        for k in sums:
            sums[k] += pc.sum(b.column(k)).as_py() or 0
    return pa.table({k: pa.array([v], pa.int64())
                     for k, v in sums.items()})


def tpch_q10_returned_items(sf_dir: str):
    """TPC-H Q10 analog (returned-item reporting): top-20 customers by
    revenue lost to 'R'-flagged lineitems on orders placed in 1996-Q1.
    Shape: lineitem revenue is filtered + partially aggregated per
    orderkey INSIDE each batch (the fact table never leaves the read
    stage at full width), the quarter-pruned orders side maps orderkey
    -> custkey, and the customer/nation dimension chain joins broadcast
    under the adaptive byte gate. The top-20 cut sorts on ROUNDED
    revenue with a custkey tie-break so the cut is deterministic
    cross-engine."""
    from datetime import datetime

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    lo, hi = datetime(1996, 1, 1), datetime(1996, 4, 1)
    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
            pc.less(t.column("o_orderdate"), pa.scalar(hi))))
            .select(["o_orderkey", "o_custkey"])
            .rename_columns(["l_orderkey", "c_custkey"]),
        batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_extendedprice", "l_discount",
                      "l_returnflag"])

    def rev_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      t.column("l_discount")))
        g = pa.Table.from_arrays(
            [t.column("l_orderkey"), rev], names=["l_orderkey", "rev"]) \
            .group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    j = adaptive_join(li.map_batches(rev_partial, batch_format="pyarrow"),
                      orders, on="l_orderkey")
    per_cust = grouped_agg(j, ["c_custkey"], [("rev", "sum", "rev")])

    cust = _rp(sf_dir, "customer",
               columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    nat = _rp(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nat = nat.map_batches(
        lambda t: t.rename_columns(["c_nationkey", "n_name"]),
        batch_format="pyarrow")
    cust = adaptive_join(cust, nat, on="c_nationkey")
    out = adaptive_join(per_cust, cust, on="c_custkey")

    def finish(t: pa.Table) -> pa.Table:
        # quantize exactly the way DuckDB's round(x, 4) does —
        # rint(x * 1e4) / 1e4 in doubles — so the rounded column is
        # bit-identical cross-engine (pc.round(x, 4) takes a different
        # path and can land on the neighbouring double)
        rev4 = pc.divide(
            pc.round(pc.multiply(t.column("rev"), pa.scalar(10000.0)),
                     ndigits=0, round_mode="half_towards_infinity"),
            pa.scalar(10000.0))
        return pa.table({
            "c_custkey": t.column("c_custkey"),
            "c_name": t.column("c_name"),
            "n_name": t.column("n_name"),
            "c_acctbal": t.column("c_acctbal"),
            "revenue": rev4})

    return out.map_batches(finish, batch_format="pyarrow") \
        .sort(["revenue", "c_custkey"], descending=[True, False]) \
        .limit(20)


def embeddings_pca(sf_dir: str):
    """Exact top-4 PCA projection of the 64-dim embeddings — the
    decorrelating project-once step (vs the JL random projection in
    ``embeddings_rp_reduce``) before ANN / semantic dedup at scale.
    Moments are integer-exact distributed partials (block layout cannot
    move a bit); oracle = straight-line recompute (gold_pca.parquet)."""
    from easyner_ray.ops.similarity import pca_project

    _, ds = pca_project(_rp(sf_dir, "embeddings",
                            columns=["vec_id", "embedding"]), k=4)
    return ds


def kg_random_walks(sf_dir: str):
    """Deterministic node2vec-style walk corpus over the KG
    co-occurrence graph: 2 walks of length 4 from every entity,
    exploded (start, walk_id, step, node) — the training-data
    generator for graph-embedding models (DeepWalk with p=q=1), riding
    the memoized edge upstream shared by the graph family. Oracle =
    straight-line recompute (gold_random_walks.parquet); all-integer
    stepping, so the match is exact."""
    from easyner_ray.ops.graph_analytics import random_walks

    return random_walks(_kg_edge_pairs(sf_dir),
                        walks_per_node=2, walk_len=4)


def kg_walk_skipgrams(sf_dir: str):
    """Skip-gram (center, context) training pairs within a +-2 window
    inside each deterministic KG walk — the word2vec-ready artifact
    downstream of ``kg_random_walks`` (DeepWalk's second half). Emitted
    directly from the in-worker steps matrix (no self-join exchange);
    the oracle IS the self-join, over the walks gold table."""
    from easyner_ray.ops.graph_analytics import random_walks

    return random_walks(_kg_edge_pairs(sf_dir), walks_per_node=2,
                        walk_len=4, emit="skipgrams", window=2)


# ---------------------------------------------------------------------------
# Round-5 session-12: completing the TPC-H analog family over the
# reduced schemas (no partsupp table, no commit/receipt dates — Q4's
# lateness predicate is adapted to shipdate vs orderdate+90d and Q22's
# prospect filter to "no URGENT order"). Each keeps the canonical
# execution shape of its TPC-H original: Q6 pure scan+agg, Q4 EXISTS
# semi, Q13 outer-join count distribution, Q14 conditional-agg ratio,
# Q18 HAVING semi, Q22 scalar-subquery + anti-join.
# ---------------------------------------------------------------------------

def _duck_round(col, digits: int):
    """round(x, d) exactly the way DuckDB computes it — rint half away
    from zero on x*10^d, then unscale — so rounded doubles are
    bit-identical cross-engine (pc.round(x, d) takes a different code
    path and can land on the neighbouring double)."""
    scale = pa.scalar(float(10 ** digits))
    return pc.divide(
        pc.round(pc.multiply(col, scale), ndigits=0,
                 round_mode="half_towards_infinity"), scale)


def tpch_q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 analog (forecasting-revenue change): one-row
    sum(extendedprice * discount) over 1996 shipments with discount in
    [0.05, 0.07] and quantity < 24 — the pure scan-and-aggregate
    query. 4-column pruned read, per-batch one-row partials (the batch
    collapses to two scalars before anything leaves the task), tiny
    driver-side final — no exchange at any scale."""
    import ray
    from datetime import datetime

    li = _rp(sf_dir, "lineitem",
             columns=["l_shipdate", "l_discount", "l_quantity",
                      "l_extendedprice"])
    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(t.column("l_shipdate"), pa.scalar(hi))),
            pc.and_(
                pc.and_(pc.greater_equal(t.column("l_discount"), 0.05),
                        pc.less_equal(t.column("l_discount"), 0.07)),
                pc.less(t.column("l_quantity"), 24.0)))
        t = t.filter(m)
        rev = pc.sum(pc.multiply(t.column("l_extendedprice"),
                                 t.column("l_discount"))).as_py() or 0.0
        return pa.table({"rev": pa.array([rev], pa.float64()),
                         "n": pa.array([len(t)], pa.int64())})

    rev, n = 0.0, 0
    for b in ray.get(li.map_batches(
            partial, batch_format="pyarrow").to_arrow_refs()):
        rev += pc.sum(b.column("rev")).as_py() or 0.0
        n += pc.sum(b.column("n")).as_py() or 0
    out = pa.table({"revenue": pa.array([rev], pa.float64()),
                    "n_items": pa.array([n], pa.int64())})
    return pa.Table.from_arrays(
        [_duck_round(out.column("revenue"), 4), out.column("n_items")],
        names=["revenue", "n_items"])


def tpch_q4_late_orders(sf_dir: str):
    """TPC-H Q4 analog (order-priority checking): per-priority count of
    1996-Q3 orders with at least one lineitem shipped more than 90 days
    after the order date (the reduced schema has no commit/receipt
    dates; shipdate-vs-orderdate+90d keeps Q4's EXISTS-semi shape).
    The quarter-pruned order slice (keyspace-bounded) broadcasts under
    the adaptive gate; lineitem streams through the join and collapses
    to distinct orderkeys per batch before the one small exchange."""
    from datetime import datetime, timedelta

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    lo, hi = datetime(1996, 7, 1), datetime(1996, 10, 1)
    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
            pc.less(t.column("o_orderdate"), pa.scalar(hi))))
            .rename_columns(["l_orderkey", "o_orderdate",
                             "o_orderpriority"]),
        batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    j = adaptive_join(li, orders, on="l_orderkey")

    def late_distinct(t: pa.Table) -> pa.Table:
        cut = pc.add(t.column("o_orderdate"),
                     pa.scalar(timedelta(days=90)))
        t = t.filter(pc.greater(t.column("l_shipdate"), cut))
        return t.select(["l_orderkey", "o_orderpriority"]) \
            .group_by(["l_orderkey", "o_orderpriority"]) \
            .aggregate([]).rename_columns(
                ["l_orderkey", "o_orderpriority"])

    dedup = grouped_agg(
        j.map_batches(late_distinct, batch_format="pyarrow"),
        ["l_orderkey", "o_orderpriority"],
        [("l_orderkey", "count", "__c")])
    counts = grouped_agg(dedup, ["o_orderpriority"],
                         [("l_orderkey", "count", "order_count")])
    return counts.map_batches(
        lambda t: pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "order_count": t.column("order_count").cast(pa.int64())}),
        batch_format="pyarrow").sort("o_orderpriority")


def tpch_q13_custdist(sf_dir: str):
    """TPC-H Q13 analog (customer order-count distribution): orders per
    customer EXCLUDING urgent ones, left-joined back onto every
    customer (zero-order customers count in the c_count=0 bin), then
    the distribution (c_count, custdist). The fact side collapses to
    per-custkey partial counts inside each batch; both exchanges are
    customer-keyspace-bounded; the final histogram is |distinct
    counts|-sized."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    orders = _rp(sf_dir, "orders",
                 columns=["o_custkey", "o_orderpriority"])

    def per_cust_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("o_orderpriority"),
                                  "1-URGENT"))
        return t.group_by(["o_custkey"]).aggregate(
            [("o_custkey", "count")]).rename_columns(
                ["o_custkey", "c_count"])

    counts = grouped_agg(
        orders.map_batches(per_cust_partial, batch_format="pyarrow"),
        ["o_custkey"], [("c_count", "sum", "c_count")]).map_batches(
        lambda t: t.rename_columns(["c_custkey", "c_count"]),
        batch_format="pyarrow")

    cust = _rp(sf_dir, "customer", columns=["c_custkey"])
    withc = adaptive_join(cust, counts, on="c_custkey", how="left")

    def hist_partial(t: pa.Table) -> pa.Table:
        cc = pc.fill_null(t.column("c_count"), 0).cast(pa.int64())
        return pa.Table.from_arrays([cc], names=["c_count"]) \
            .group_by(["c_count"]).aggregate([("c_count", "count")]) \
            .rename_columns(["c_count", "custdist"])

    hist = grouped_agg(
        withc.map_batches(hist_partial, batch_format="pyarrow"),
        ["c_count"], [("custdist", "sum", "custdist")])
    return hist.map_batches(
        lambda t: pa.table({
            "c_count": t.column("c_count"),
            "custdist": t.column("custdist").cast(pa.int64())}),
        batch_format="pyarrow") \
        .sort(["custdist", "c_count"], descending=[True, True])


def tpch_q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 analog (promotion effect): one-row percentage of
    1996-09 shipment revenue attributable to PROMO-type parts —
    conditional aggregation over a fact->dimension join. The part
    dimension collapses to (p_partkey, is_promo) and broadcasts;
    lineitem streams through it and each batch collapses to two
    scalars; no fact-side exchange at any scale."""
    import ray
    from datetime import datetime

    from easyner_ray.ops.relational import adaptive_join

    part = _rp(sf_dir, "part", columns=["p_partkey", "p_type"])
    part = part.map_batches(
        lambda t: pa.table({
            "l_partkey": t.column("p_partkey"),
            "is_promo": pc.equal(t.column("p_type"), "PROMO")}),
        batch_format="pyarrow")

    lo, hi = datetime(1996, 9, 1), datetime(1996, 10, 1)
    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])
    li = li.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
            pc.less(t.column("l_shipdate"), pa.scalar(hi)))),
        batch_format="pyarrow")
    j = adaptive_join(li, part, on="l_partkey")

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      t.column("l_discount")))
        promo = pc.if_else(t.column("is_promo"), rev, 0.0)
        return pa.table({
            "promo": pa.array([pc.sum(promo).as_py() or 0.0]),
            "total": pa.array([pc.sum(rev).as_py() or 0.0])})

    promo, total = 0.0, 0.0
    for b in ray.get(j.map_batches(
            partial, batch_format="pyarrow").to_arrow_refs()):
        promo += pc.sum(b.column("promo")).as_py() or 0.0
        total += pc.sum(b.column("total")).as_py() or 0.0
    pct = pa.table({"v": pa.array(
        [100.0 * promo / total if total else 0.0], pa.float64())})
    return pa.Table.from_arrays([_duck_round(pct.column("v"), 6)],
                                names=["promo_revenue"])


def tpch_q18_large_orders(sf_dir: str):
    """TPC-H Q18 analog (large-volume customers): orders whose total
    lineitem quantity exceeds 300, with customer attribution, top-100
    by order value. The HAVING side is per-batch partial quantity sums
    -> one orderkey-bounded exchange -> a SMALL qualifying set that
    broadcasts back as a semi-join filter on orders; the customer
    dimension broadcasts under the gate. Sort key (o_totalprice desc,
    o_orderkey) makes the cut deterministic cross-engine."""
    from easyner_ray.ops.relational import (adaptive_join,
                                            adaptive_semi_join,
                                            grouped_agg)

    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey"]).aggregate(
            [("l_quantity", "sum")]).rename_columns(
                ["l_orderkey", "qty"])

    qty = grouped_agg(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["l_orderkey"], [("qty", "sum", "qty")])
    big = qty.map_batches(
        lambda t: t.filter(pc.greater(t.column("qty"), 300.0))
                   .rename_columns(["o_orderkey", "qty"]),
        batch_format="pyarrow").materialize()

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate",
                          "o_totalprice"])
    orders = adaptive_semi_join(
        orders, big.select_columns(["o_orderkey"]), on="o_orderkey")
    orders = adaptive_join(orders, big, on="o_orderkey")

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cust = cust.map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_name"]),
        batch_format="pyarrow")
    out = adaptive_join(orders, cust, on="o_custkey")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t.column("o_custkey"),
            "c_name": t.column("c_name"),
            "o_orderkey": t.column("o_orderkey"),
            "o_orderdate": t.column("o_orderdate"),
            "o_totalprice": t.column("o_totalprice"),
            "total_qty": _duck_round(t.column("qty"), 2)})

    return out.map_batches(finish, batch_format="pyarrow") \
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False]) \
        .limit(100)


def tpch_q22_dormant_accounts(sf_dir: str):
    """TPC-H Q22 analog (global sales opportunity): per-nation count +
    balance of above-average-balance customers with NO urgent order
    (the reduced schema has no phone column; 'never placed an URGENT
    order' keeps Q22's scalar-subquery + NOT EXISTS anti-join shape).
    The average is a two-scalar partial reduce; the urgent-customer key
    set collapses to distinct custkeys before the adaptive anti join;
    the final rollup is |nations|-sized."""
    import ray

    from easyner_ray.ops.relational import adaptive_semi_join, grouped_agg

    cust = _rp(sf_dir, "customer",
               columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def avg_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t.column("c_acctbal"), 0.0))
        return pa.table({
            "s": pa.array([pc.sum(pos.column("c_acctbal")).as_py()
                           or 0.0]),
            "n": pa.array([len(pos)], pa.int64())})

    s, n = 0.0, 0
    for b in ray.get(cust.map_batches(
            avg_partial, batch_format="pyarrow").to_arrow_refs()):
        s += pc.sum(b.column("s")).as_py() or 0.0
        n += pc.sum(b.column("n")).as_py() or 0
    avg_bal = s / n if n else 0.0

    rich = cust.map_batches(
        lambda t: t.filter(pc.greater(t.column("c_acctbal"),
                                      pa.scalar(avg_bal))),
        batch_format="pyarrow")

    urgent = _rp(sf_dir, "orders",
                 columns=["o_custkey", "o_orderpriority"])
    urgent_keys = grouped_agg(
        urgent.map_batches(
            lambda t: t.filter(pc.equal(t.column("o_orderpriority"),
                                        "1-URGENT"))
                       .select(["o_custkey"])
                       .rename_columns(["c_custkey"]),
            batch_format="pyarrow"),
        ["c_custkey"], [("c_custkey", "count", "__c")]) \
        .select_columns(["c_custkey"])

    dormant = adaptive_semi_join(rich, urgent_keys, on="c_custkey",
                                 anti=True)
    agg = grouped_agg(dormant, ["c_nationkey"],
                      [("c_custkey", "count", "numcust"),
                       ("c_acctbal", "sum", "tot")])
    return agg.map_batches(
        lambda t: pa.table({
            "c_nationkey": t.column("c_nationkey"),
            "numcust": t.column("numcust").cast(pa.int64()),
            "totacctbal": _duck_round(t.column("tot"), 2)}),
        batch_format="pyarrow").sort("c_nationkey")


def kg_fuzzy_alias_pairs(sf_dir: str):
    """Fuzzy alias candidates over the KG node vocabulary: every pair of
    distinct normalized entity names within edit distance 1, found via
    FastSS deletion-neighborhood blocking (``ops.fuzzy.edit1_pairs``) —
    never an all-pairs scan. Distinct names come from a vocab-bounded
    tree-final aggregate over the corpus mention stream. Engine-added
    entity-resolution layer above the reference's exact-key merge
    (reference entity_merger2.py)."""
    from easyner_ray.ops.fuzzy import edit1_pairs
    from easyner_ray.ops.relational import grouped_agg

    names = grouped_agg(
        _mentions(sf_dir).select_columns(["norm"]),
        ["norm"], [("norm", "count", "__c")],
        final="tree",  # name keyspace is vocabulary-bounded
    ).select_columns(["norm"])
    return edit1_pairs(names, column="norm").sort(["a", "b"])


def kg_fuzzy_alias_clusters(sf_dir: str):
    """Alias resolution over the fuzzy pair table: connected components
    of the edit-distance<=1 graph; each paired name maps to its
    cluster's lexicographically smallest member (the canonical alias).
    Reuses dup_groups' min-label machinery with string ids."""
    from easyner_ray.ops.fuzzy import alias_clusters, edit1_pairs
    from easyner_ray.ops.relational import grouped_agg

    names = grouped_agg(
        _mentions(sf_dir).select_columns(["norm"]),
        ["norm"], [("norm", "count", "__c")],
        final="tree",
    ).select_columns(["norm"])
    return alias_clusters(edit1_pairs(names, column="norm")).sort("name")


def kg_fuzzy_nel(sf_dir: str):
    """Typo-tolerant entity linking: corpus mention norms with NO exact
    alias entry, linked to every alias term within edit distance 1 via
    the two-table FastSS join (``ops.fuzzy.edit1_join``); each (norm,
    term) carries the term's smallest KB id (deterministic when a term
    maps to several ids). The fuzzy recovery layer above the exact
    broadcast NEL (stages/nel.py; reference nel.py's exact dict lookup)."""
    import pyarrow.parquet as pq
    import ray

    from easyner_ray.ops.fuzzy import edit1_join
    from easyner_ray.ops.relational import (adaptive_join,
                                            adaptive_semi_join, grouped_agg)

    alias = pq.read_table(os.path.join(_corpus(sf_dir), "alias.parquet"))
    terms = ray.data.from_arrow(
        pa.Table.from_arrays([alias.column("term").unique()], names=["term"]))

    names = grouped_agg(
        _mentions(sf_dir).select_columns(["norm"]),
        ["norm"], [("norm", "count", "__c")],
        final="tree",
    ).select_columns(["norm"])
    unlinked = adaptive_semi_join(names, terms.rename_columns(["norm"]),
                                  on="norm", anti=True)
    pairs = edit1_join(unlinked, terms, left_col="norm", right_col="term") \
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("left"), t.column("right")],
                names=["norm", "term"]),
            batch_format="pyarrow")
    # smallest KB id per term (terms can map to several ids), then attach
    term_ids = ray.data.from_arrow(
        alias.group_by("term").aggregate([("id", "min")])
             .rename_columns(["term", "id"]))
    out = adaptive_join(pairs, term_ids, on="term")
    return out.select_columns(["norm", "term", "id"]).sort(["norm", "term"])


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_user_pivot(sf_dir: str):
    """Per-user wide feature row: count and value sum per event type as
    pivoted columns (ops.relational.pivot_wide — conditional aggregation
    inside the partial, one shuffle of pre-aggregated rows)."""
    from easyner_ray.ops.relational import pivot_wide

    ev = _rp(sf_dir, "events", columns=["user_id", "event_type", "value"])
    wide = pivot_wide(ev, key="user_id", pivot_col="event_type",
                      value_col="value", categories=list(EVENT_TYPES))

    def fin(t: pa.Table) -> pa.Table:
        arrays, names = [t.column("user_id")], ["user_id"]
        for c in EVENT_TYPES:
            arrays.append(t.column(f"{c}_n").cast(pa.int64()))
            names.append(f"{c}_n")
            arrays.append(_duck_round(t.column(f"{c}_sum"), 2))
            names.append(f"{c}_sum")
        return pa.Table.from_arrays(arrays, names=names)

    return wide.map_batches(fin, batch_format="pyarrow").sort("user_id")


def lineitem_melt(sf_dir: str):
    """Wide-to-long unpivot of lineitem's four numeric measures into
    (orderkey, linenumber, measure, value) — ops.relational.melt, a
    per-batch columnar reshape with no shuffle (the sort here is only
    for the deterministic oracle compare)."""
    from easyner_ray.ops.relational import melt

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_quantity",
                      "l_extendedprice", "l_discount", "l_tax"])
    out = melt(li, id_cols=["l_orderkey", "l_linenumber"],
               value_cols=["l_quantity", "l_extendedprice",
                           "l_discount", "l_tax"],
               var_name="measure", value_name="value")
    return out.sort(["l_orderkey", "l_linenumber", "measure"])


def docs_epoch_shuffle(sf_dir: str):
    """Seeded deterministic global shuffle for epoch ordering: every doc
    gets ``shuffle_key = (doc_id * 2654435761 + epoch) % 2^32`` (Knuth
    multiplicative hash, the same family as orders_hash_sample) and the
    corpus is range-sorted by it — a distributed sort, no driver
    materialization. Reading the output in order IS the epoch-1
    permutation; rerunning with another epoch reshuffles reproducibly."""
    epoch = 1

    docs = _rp(sf_dir, "documents", columns=["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        k = (ids * np.uint64(2654435761) + np.uint64(epoch)) % np.uint64(1 << 32)
        return pa.Table.from_arrays(
            [t.column("doc_id"), pa.array(k.astype(np.int64))],
            names=["doc_id", "shuffle_key"])

    return docs.map_batches(key, batch_format="pyarrow") \
        .sort(["shuffle_key", "doc_id"])


def conv_entity_sequence(sf_dir: str):
    """Per-conversation entity-sequence signature: distinct entity norms
    joined in first-mention order (ordered string_agg) plus the distinct
    count — the sequence key downstream template/near-dup passes compare.
    Two phases, both bounded: grouped min first-position per (conv,
    norm), then ops.relational.grouped_string_agg (vectorized in-bucket
    ListArray + binary_join, no per-group Python)."""
    from easyner_ray.ops.relational import grouped_agg, grouped_string_agg

    m = _mentions(sf_dir)

    def pos(t: pa.Table) -> pa.Table:
        p = pc.add(
            pc.add(pc.multiply(t.column("turn_idx").cast(pa.int64()),
                               pa.scalar(1_000_000, pa.int64())),
                   pc.multiply(t.column("sent_idx").cast(pa.int64()),
                               pa.scalar(1_000, pa.int64()))),
            t.column("mention_idx").cast(pa.int64()))
        return pa.Table.from_arrays(
            [t.column("conv_id"), t.column("norm"), p],
            names=["conv_id", "norm", "pos"])

    firsts = grouped_agg(m.map_batches(pos, batch_format="pyarrow"),
                         ["conv_id", "norm"], [("pos", "min", "pos")])
    out = grouped_string_agg(firsts, key="conv_id", val="norm",
                             order_cols=["pos"], sep=",",
                             out="entity_seq")
    return out.rename_columns(["conv_id", "entity_seq", "n_entities"]) \
        .sort("conv_id")


def docs_split_no_leakage(sf_dir: str):
    """Leakage-safe train/val split: exact-duplicate documents always
    land in the SAME split by hashing the dup group's representative
    (min doc_id per identical text) instead of the doc's own id — the
    guard that keeps a val doc's verbatim copy out of train. Pipeline:
    md5-digest partials -> grouped min rep per digest -> digest join
    back (adaptive broadcast/hash) -> split_assign on rep."""
    import hashlib

    from easyner_ray.ops.relational import (adaptive_join, bucketed_final,
                                            split_assign)

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def dig(t: pa.Table) -> pa.Table:
        digest = pa.array(
            [hashlib.md5((x or "").encode()).hexdigest()
             for x in t.column("text").to_pylist()], pa.string())
        return pa.Table.from_arrays([t.column("doc_id"), digest],
                                    names=["doc_id", "digest"])

    with_digest = docs.map_batches(dig, batch_format="pyarrow")
    reps = bucketed_final(
        with_digest.map_batches(
            lambda t: t.group_by("digest").aggregate([("doc_id", "min")])
                       .rename_columns(["digest", "rep"]),
            batch_format="pyarrow"),
        ["digest"], pa_aggs=[("rep", "min")], out_names=["rep"])
    joined = adaptive_join(with_digest, reps, on="digest")
    out = split_assign(joined.select_columns(["doc_id", "rep"]), "rep",
                       [("train", 0.9), ("val", 1.0)])
    return out.select_columns(["doc_id", "rep", "split"]).sort("doc_id")


def events_autocorr(sf_dir: str):
    """Lag-k autocorrelation of the per-type daily event-count series
    (lags 1/2/3/7 — the day-over-day and weekly-cycle probes): collapse
    the corpus to the tiny (type x day) keyspace first, then one
    bucketed segment-kernel exchange computes every (type, lag) Pearson
    coefficient vectorized (ops.analytic.grouped_autocorr). The
    seasonality census a monitoring pipeline runs before alerting on
    volume anomalies."""
    from easyner_ray.ops.analytic import grouped_autocorr
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["event_type", "ts"])

    def day_key(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "day": pc.floor_temporal(t.column("ts"), unit="day")})

    daily = grouped_agg(ev.map_batches(day_key, batch_format="pyarrow"),
                        ["event_type", "day"], [("day", "count", "n")])
    return grouped_autocorr(daily, ["event_type"], ["day"], "n",
                            lags=(1, 2, 3, 7))


def docs_nb_source_pred(sf_dir: str):
    """Label-recovery census via distributed multinomial Naive Bayes
    (ops.classify): fit source-given-text on the corpus, score every
    doc, emit (doc_id, source, pred_source, score) — the quality-
    classifier shape of CCNet/GPT-3-style curation with a closed-form,
    oracle-checkable fit. Two vocab-keyspace aggregates + one map-only
    scoring pass; the (V x C) model broadcasts once."""
    from easyner_ray.ops.classify import naive_bayes_predict

    return naive_bayes_predict(
        _rp(sf_dir, "documents", columns=["doc_id", "source", "text"]),
        vocab_size=512)


def embedding_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: each vector's
    most-similar DIFFERENT-label neighbor (ops.similarity.hard_negatives
    — broadcast matrix, map-only batches, score rounded before argmax).
    Oracle = straight-line recompute (gold_hard_negatives.parquet)."""
    from easyner_ray.ops.similarity import hard_negatives

    _corpus(sf_dir)  # gold table keyed to this sf_dir
    return hard_negatives(
        _rp(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"]))


def embedding_kcenter(sf_dir: str):
    """Greedy k-center coreset (diversity subset selection, Sener &
    Savarese 2018): 16 selection rounds, each one broadcast + one
    map-only farthest-point pass (ops.similarity.kcenter_select).
    Oracle = straight-line recompute (gold_kcenter.parquet)."""
    from easyner_ray.ops.similarity import kcenter_select

    _corpus(sf_dir)
    return kcenter_select(
        _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"]), k=16)


def tpch_q7_nation_volume(sf_dir: str):
    """TPC-H Q7 analog (volume shipping between two nations): revenue
    per (supplier nation, customer nation, ship year) for the
    NATION_1 <-> NATION_2 pair, both directions. Both dimension chains
    (supplier->nation, customer->nation) prune to the two nations BEFORE
    touching a fact table, so the order and lineitem streams are
    semi-reduced early; the two fact joins are adaptive
    (broadcast under the byte gate, hash-shuffle above); per-batch
    partial aggregation collapses to the 2 x 2 x years keyspace before
    the final tiny rollup."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    pair = ("NATION_1", "NATION_2")
    nation = _rp(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nation = nation.map_batches(
        lambda t: t.filter(pc.is_in(t.column("n_name"),
                                    value_set=pa.array(pair))),
        batch_format="pyarrow")

    supp = adaptive_join(
        _rp(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        nation.map_batches(
            lambda t: t.rename_columns(["s_nationkey", "supp_nation"]),
            batch_format="pyarrow"),
        on="s_nationkey").map_batches(
        lambda t: t.select(["s_suppkey", "supp_nation"])
                   .rename_columns(["l_suppkey", "supp_nation"]),
        batch_format="pyarrow")

    cust = adaptive_join(
        _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        nation.map_batches(
            lambda t: t.rename_columns(["c_nationkey", "cust_nation"]),
            batch_format="pyarrow"),
        on="c_nationkey").map_batches(
        lambda t: t.select(["c_custkey", "cust_nation"]),
        batch_format="pyarrow")

    o_side = adaptive_join(
        _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
        .map_batches(lambda t: t.rename_columns(["l_orderkey", "c_custkey"]),
                     batch_format="pyarrow"),
        cust, on="c_custkey").map_batches(
        lambda t: t.select(["l_orderkey", "cust_nation"]),
        batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount", "l_shipdate"])
    j = adaptive_join(adaptive_join(li, supp, on="l_suppkey"),
                      o_side, on="l_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        # keep only cross-nation flows (each side already restricted to
        # the pair, so != IS the (1,2)|(2,1) disjunction)
        t = t.filter(pc.not_equal(t.column("supp_nation"),
                                  t.column("cust_nation")))
        vol = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        yr = pc.year(t.column("l_shipdate")).cast(pa.int64())
        g = pa.table({"supp_nation": t.column("supp_nation"),
                      "cust_nation": t.column("cust_nation"),
                      "l_year": yr, "v": vol}) \
            .group_by(["supp_nation", "cust_nation", "l_year"]) \
            .aggregate([("v", "sum")])
        return g.rename_columns(["supp_nation", "cust_nation", "l_year",
                                 "v"])

    agg = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["supp_nation", "cust_nation", "l_year"],
                      [("v", "sum", "revenue")])
    return agg.map_batches(lambda t: _round4(t, ["revenue"]),
                           batch_format="pyarrow")


def tpch_q15_top_supplier(sf_dir: str):
    """TPC-H Q15 analog (top supplier): per-supplier revenue over a
    3-month ship window, return the supplier(s) achieving the maximum.
    The scan prunes 4 columns + the date window at the read edge;
    per-batch per-suppkey partials collapse to the |supplier| keyspace
    (100 rows), the max is a driver scalar off that small table, and
    the supplier-name join is a broadcast. Revenue is rounded BEFORE
    the max comparison on both engines (the SQL view does the same), so
    the equality filter is grain-stable."""
    import datetime as _dt

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1996, 4, 1)
    li = _rp(sf_dir, "lineitem",
             columns=["l_suppkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(t.column("l_shipdate"), pa.scalar(hi)))
        t = t.filter(m)
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"s_suppkey": t.column("l_suppkey"), "v": rev}) \
            .group_by(["s_suppkey"]).aggregate([("v", "sum")]) \
            .rename_columns(["s_suppkey", "v"])

    rev = grouped_agg(li.map_batches(partial, batch_format="pyarrow"),
                      ["s_suppkey"], [("v", "sum", "total_revenue")])
    rev = rev.map_batches(
        lambda t: _round4(t, ["total_revenue"]),
        batch_format="pyarrow").materialize()  # |supplier| keyspace
    best = max((r["total_revenue"] for r in rev.take_all()), default=None)
    top = rev.map_batches(
        lambda t, b=best: t.filter(pc.equal(t.column("total_revenue"), b))
        if b is not None else t.slice(0, 0),
        batch_format="pyarrow")
    out = adaptive_join(
        top, _rp(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        on="s_suppkey")
    return out.select_columns(["s_suppkey", "s_name", "total_revenue"])


def tpch_q17_small_quantity(sf_dir: str):
    """TPC-H Q17 analog (small-quantity-order revenue): average yearly
    revenue lost if orders below 20% of a part's average quantity were
    not filled, for one brand/type slice -> ONE row (avg_yearly).
    The correlated per-part subquery becomes a first pass over the
    part-pruned lineitem stream (per-partkey sum/count partials onto the
    filtered-|part| keyspace), a broadcast threshold map, then a second
    map-only pass with the quantity gate; the pruned stream is
    checkpointed once so the two passes share the scan."""
    import ray

    from easyner_ray.ops.relational import grouped_agg

    parts = _rp(sf_dir, "part", columns=["p_partkey", "p_brand", "p_type"])
    pk = parts.map_batches(
        lambda t: t.filter(pc.and_(
            pc.equal(t.column("p_brand"), "Brand#3"),
            pc.equal(t.column("p_type"), "SMALL"))).select(["p_partkey"]),
        batch_format="pyarrow")
    pk_ids = pa.concat_tables(
        [ray.get(r) for r in pk.materialize().to_arrow_refs()]
    ).column("p_partkey").combine_chunks()
    pk_ref = ray.put(pk_ids)

    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_quantity", "l_extendedprice"])
    pruned = li.map_batches(
        lambda t: t.filter(pc.is_in(t.column("l_partkey"),
                                    value_set=ray.get(pk_ref))),
        batch_format="pyarrow").materialize()  # shared by both passes

    stats = grouped_agg(
        pruned.map_batches(
            lambda t: pa.table({"l_partkey": t.column("l_partkey"),
                                "q": t.column("l_quantity"),
                                "c": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow"),
        ["l_partkey"], [("q", "sum", "sq"), ("c", "sum", "n")])
    thr_rows = stats.take_all()  # filtered-|part| keyspace (small)
    thr_keys = pa.array([r["l_partkey"] for r in thr_rows], pa.int64())
    thr_vals = np.array([0.2 * (r["sq"] / r["n"]) for r in thr_rows])
    thr_ref = ray.put((thr_keys, thr_vals))

    def gate(t: pa.Table) -> pa.Table:
        keys_b, vals_b = ray.get(thr_ref)
        idx = pc.index_in(t.column("l_partkey"), value_set=keys_b)
        lim = pa.array(
            vals_b[np.asarray(idx.fill_null(0), dtype=np.int64)]
            * np.asarray(pc.is_valid(idx), dtype=np.float64),
            pa.float64())
        keep = pc.less(t.column("l_quantity"), lim)
        s = pc.sum(t.filter(keep).column("l_extendedprice"))
        return pa.table({"s": pa.array([s.as_py()], pa.float64()),
                         "n": pa.array([int(pc.sum(keep).as_py() or 0)],
                                       pa.int64())})

    parts_sum = pruned.map_batches(gate, batch_format="pyarrow").take_all()
    total = sum(p["s"] for p in parts_sum if p["s"] is not None)
    n = sum(p["n"] for p in parts_sum)
    import ray.data as rd
    if n == 0:  # SQL sum over an empty set is NULL
        return rd.from_arrow(pa.table(
            {"avg_yearly": pa.array([None], pa.float64())}))
    return rd.from_arrow(pa.table(
        {"avg_yearly": pa.array([round(total / 7.0, 4)], pa.float64())}))


def tpch_q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 analog (discounted revenue under a 3-way disjunctive
    brand/size/quantity predicate) -> ONE row (revenue). The part
    dimension prunes to the three brand/size windows and broadcasts as
    a partkey -> case-class map; the lineitem stream is map-only (class
    lookup + per-class quantity window + one scalar partial per batch);
    no fact-side shuffle at any scale."""
    import ray

    cases = [("Brand#1", 15, 1.0, 11.0),
             ("Brand#2", 25, 10.0, 20.0),
             ("Brand#3", 35, 20.0, 30.0)]

    parts = _rp(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])

    def classify(t: pa.Table) -> pa.Table:
        cls = pa.nulls(len(t), pa.int8())
        for i, (brand, max_size, _lo, _hi) in enumerate(cases):
            m = pc.and_(pc.and_(
                pc.equal(t.column("p_brand"), brand),
                pc.greater_equal(t.column("p_size"), 1)),
                pc.less_equal(t.column("p_size"), max_size))
            cls = pc.if_else(m, pa.scalar(i, pa.int8()), cls)
        out = pa.table({"p_partkey": t.column("p_partkey"), "cls": cls})
        return out.filter(pc.is_valid(cls))

    pmap = pa.concat_tables([ray.get(r) for r in parts.map_batches(
        classify, batch_format="pyarrow").materialize().to_arrow_refs()])
    pref = ray.put((pmap.column("p_partkey").combine_chunks(),
                    pmap.column("cls").combine_chunks()))
    lows = np.array([c[2] for c in cases])
    highs = np.array([c[3] for c in cases])

    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_quantity", "l_extendedprice",
                      "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keys, cls = ray.get(pref)
        idx = pc.index_in(t.column("l_partkey"), value_set=keys)
        t = t.filter(pc.is_valid(idx))
        idx = idx.filter(pc.is_valid(idx))
        c = np.asarray(cls.take(idx), dtype=np.int64)
        qn = np.asarray(t.column("l_quantity").combine_chunks(),
                        dtype=np.float64)
        keep = (qn >= lows[c]) & (qn <= highs[c])
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        s = float(pc.sum(rev.filter(pa.array(keep))).as_py() or 0.0)
        return pa.table({"s": pa.array([s], pa.float64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    rows = li.map_batches(partial, batch_format="pyarrow").take_all()
    total = sum(r["s"] for r in rows)
    n = sum(r["n"] for r in rows)
    import ray.data as rd
    if n == 0:
        return rd.from_arrow(pa.table(
            {"revenue": pa.array([None], pa.float64())}))
    return rd.from_arrow(pa.table(
        {"revenue": pa.array([round(total, 4)], pa.float64())}))


def events_markov_stationary(sf_dir: str):
    """Stationary distribution of the user-behavior Markov chain: the
    per-user event-type transition counts (the events_type_transitions
    census) row-normalize into a |types| x |types| matrix, and 50 fixed
    power iterations from the uniform vector give the long-run type mix
    -> (event_type, stationary_p). Rows with no outgoing transitions
    redistribute uniformly (the dangling correction, as in pagerank).
    The corpus-sized work is exactly the one lead() exchange already
    inside the transition census; the matrix itself is types^2 (tiny),
    so the iteration runs on the driver with the shared rounding grain
    (round-9 per step, spec-deterministic on both engines; oracle =
    straight-line recompute, gold_markov_stationary.parquet)."""
    import ray.data as rd

    rows = events_type_transitions(sf_dir).take_all()
    types = sorted({r["event_type"] for r in rows}
                   | {r["next_type"] for r in rows})
    k = len(types)
    if k == 0:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "stationary_p": pa.array([], pa.float64())}))
    idx = {t: i for i, t in enumerate(types)}
    mat = np.zeros((k, k))
    for r in rows:
        mat[idx[r["event_type"]], idx[r["next_type"]]] = r["n"]
    rs = mat.sum(axis=1, keepdims=True)
    p = np.where(rs > 0, mat / np.where(rs == 0, 1.0, rs), 1.0 / k)
    x = np.round(np.full(k, 1.0 / k), 9)
    for _ in range(50):
        x = np.round(x @ p, 9)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "stationary_p": pa.array(np.round(x, 4), pa.float64())}))


def events_theil_sen(sf_dir: str):
    """Robust daily-volume trend per event type: Theil–Sen slope (median
    of pairwise day-over-day slopes) over the per-type daily count
    series — the outlier-proof drift detector (one burst day cannot
    swing it, unlike OLS). Collapse to the tiny (type x day) keyspace
    first; the pairwise kernel runs per series inside one bucketed
    exchange (ops.analytic.grouped_theil_sen). Days enter as integer
    epoch days so slope units are events/day."""
    from easyner_ray.ops.analytic import grouped_theil_sen
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["event_type", "ts"])

    def day_key(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day")
        epoch_day = pc.divide(day.cast(pa.int64()), 86400000000)
        return pa.table({"event_type": t.column("event_type"),
                         "d": epoch_day})

    daily = grouped_agg(ev.map_batches(day_key, batch_format="pyarrow"),
                        ["event_type", "d"], [("d", "count", "n")])
    return grouped_theil_sen(daily, ["event_type"], "d", "n")


def events_trimmed_mean(sf_dir: str):
    """Robust central tendency per event type: the mean of values inside
    the [p10, p90] interpolated-quantile band (value-threshold trimmed
    mean, ties inclusive — the exact SQL spec, not a rank trim). The
    quantile thresholds come from the existing grouped quantile_cont
    refinement core (type-sized keyspace); the band mean is then one
    broadcast threshold map + a grouped sum/count — two streaming
    passes, no corpus shuffle."""
    import ray

    from easyner_ray.ops.relational import grouped_agg
    from easyner_ray.ops.sketch import grouped_quantiles_cont

    ev = _rp(sf_dir, "events", columns=["event_type", "value"])

    qt = grouped_quantiles_cont(ev, "value", [0.1, 0.9], by="event_type")
    lo, hi = {}, {}
    for r in qt.to_pylist():
        (lo if r["q"] == 0.1 else hi)[r["event_type"]] = r["value"]
    types = pa.array(sorted(lo), pa.string())
    lo_v = np.array([lo[t] for t in sorted(lo)])
    hi_v = np.array([hi[t] for t in sorted(lo)])
    ref = ray.put((types, lo_v, hi_v))

    def band(t: pa.Table) -> pa.Table:
        ty, lv, hv = ray.get(ref)
        idx = pc.index_in(t.column("event_type"), value_set=ty)
        t = t.filter(pc.is_valid(idx))
        i = np.asarray(idx.filter(pc.is_valid(idx)).cast(pa.int64()))
        v = np.asarray(t.column("value").combine_chunks(), dtype=np.float64)
        keep = (v >= lv[i]) & (v <= hv[i])
        return pa.table({"event_type": t.column("event_type"),
                         "v": t.column("value")}).filter(pa.array(keep))

    agg = grouped_agg(ev.map_batches(band, batch_format="pyarrow"),
                      ["event_type"],
                      [("v", "sum", "s"), ("v", "count", "n")])

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        n = t.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t.column("event_type"),
            "n_kept": pa.array(n.astype(np.int64), pa.int64()),
            "trimmed_mean": pa.array(np.round(s / n, 4), pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def docs_curriculum(sf_dir: str):
    """Length-based curriculum ordering: every document's global rank
    under (n_chars asc, doc_id asc) — shortest-first scheduling, the
    standard warm-up curriculum for sequence models. The one primitive
    this needs is a GLOBAL row_number, built scale-safe in
    ops.relational.global_row_number: one range-partitioned sort + two
    block-grain passes with an O(blocks) first-key -> offset broadcast
    (driver never holds rows)."""
    from easyner_ray.ops.relational import global_row_number

    return global_row_number(
        _rp(sf_dir, "documents", columns=["doc_id", "n_chars"]),
        ["n_chars", "doc_id"]).select_columns(["doc_id", "n_chars", "rank"])


def embedding_triplets(sf_dir: str):
    """Batch-hard triplet mining corpus-wide (hardest positive + hardest
    negative per anchor) — the metric-learning training-pair builder
    next to embedding_hard_negatives (ops.similarity.triplet_mining;
    oracle = straight-line recompute, gold_triplets.parquet)."""
    from easyner_ray.ops.similarity import triplet_mining

    _corpus(sf_dir)
    return triplet_mining(
        _rp(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"]))


def events_ks_drift(sf_dir: str):
    """Distribution-drift census: per event type, the two-sample
    Kolmogorov–Smirnov statistic of its value distribution against the
    whole corpus (ops.sketch.grouped_ks_vs_global) — the
    train/serve-skew detector run before trusting a per-type model or
    threshold."""
    from easyner_ray.ops.sketch import grouped_ks_vs_global

    return grouped_ks_vs_global(
        _rp(sf_dir, "events", columns=["event_type", "value"]),
        "event_type", "value")


def events_type_hour_mi(sf_dir: str):
    """Independence audit between event type and hour-of-day: Pearson
    chi-square statistic (all cells, zero-observed included), degrees of
    freedom, and mutual information in nats over the joint distribution
    -> ONE row. The corpus collapses to the (types x 24) contingency
    keyspace in one grouped count; the statistics are driver arithmetic
    on that tiny table. The "is behavior time-dependent at all" gate
    before building per-hour models."""
    import math

    import ray.data as rd

    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["event_type", "ts"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table({"t": t.column("event_type"),
                         "h": pc.hour(t.column("ts")).cast(pa.int64())})

    ct = grouped_agg(ev.map_batches(keys, batch_format="pyarrow"),
                     ["t", "h"], [("t", "count", "c")]).take_all()
    if not ct:
        return rd.from_arrow(pa.table({
            "chi2": pa.array([None], pa.float64()),
            "dof": pa.array([None], pa.int64()),
            "mi": pa.array([None], pa.float64())}))
    types = sorted({r["t"] for r in ct})
    hours = sorted({r["h"] for r in ct})
    obs = np.zeros((len(types), len(hours)))
    ti = {t: i for i, t in enumerate(types)}
    hi = {h: i for i, h in enumerate(hours)}
    for r in ct:
        obs[ti[r["t"]], hi[r["h"]]] = r["c"]
    n = obs.sum()
    exp = obs.sum(axis=1, keepdims=True) * obs.sum(axis=0, keepdims=True) / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    nz = obs > 0
    mi = float((obs[nz] / n * np.log(obs[nz] * n
                                     / (exp[nz] * n))).sum())
    dof = (len(types) - 1) * (len(hours) - 1)
    return rd.from_arrow(pa.table({
        "chi2": pa.array([round(chi2, 4)], pa.float64()),
        "dof": pa.array([dof], pa.int64()),
        "mi": pa.array([round(mi, 4)], pa.float64())}))


def kg_degree_powerlaw(sf_dir: str):
    """Degree-distribution summary of the KG: node count, min/max
    degree, and the continuous power-law MLE exponent
    ``alpha = 1 + n / sum(ln(d / d_min))`` (Clauset et al. 2009 eq. 3.1
    with d_min = the observed minimum) -> ONE row. Rides the memoized
    edge table + the vocab-keyspace degree aggregate; the MLE is driver
    arithmetic on that tiny table. The "is this graph scale-free"
    sanity check before assuming hub-skew mitigations matter."""
    import math

    import ray.data as rd

    from easyner_ray.ops.graph_analytics import degree_stats

    rows = degree_stats(_kg_edge_pairs(sf_dir)).take_all()
    if not rows:
        return rd.from_arrow(pa.table({
            "n_nodes": pa.array([0], pa.int64()),
            "d_min": pa.array([None], pa.int64()),
            "d_max": pa.array([None], pa.int64()),
            "alpha": pa.array([None], pa.float64())}))
    degs = [r["degree"] for r in rows]
    dmin = min(degs)
    s = sum(math.log(d / dmin) for d in degs)
    alpha = (1.0 + len(degs) / s) if s > 0 else None
    return rd.from_arrow(pa.table({
        "n_nodes": pa.array([len(degs)], pa.int64()),
        "d_min": pa.array([dmin], pa.int64()),
        "d_max": pa.array([max(degs)], pa.int64()),
        "alpha": pa.array([round(alpha, 4) if alpha is not None else None],
                          pa.float64())}))


def kg_rich_club(sf_dir: str, k: int = 10):
    """Rich-club coefficient at degree > k: the edge density among the
    hub set (phi = directed edge rows inside the club / n(n-1)) — do
    the KG's hubs preferentially talk to each other? One broadcast of
    the club node set (vocab-bounded) + one filtered pass over the
    memoized edge table."""
    import ray
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import degree_stats

    deg = degree_stats(_kg_edge_pairs(sf_dir)).take_all()
    club = pa.array(sorted(r["norm"] for r in deg if r["degree"] > k),
                    pa.string())
    n_club = len(club)
    if n_club < 2:
        return rd.from_arrow(pa.table({
            "n_club": pa.array([n_club], pa.int64()),
            "e_club": pa.array([0], pa.int64()),
            "phi": pa.array([None], pa.float64())}))
    club_ref = ray.put(club)

    def inside(t: pa.Table) -> pa.Table:
        cb = ray.get(club_ref)
        keep = pc.and_(pc.is_in(t.column("subj"), value_set=cb),
                       pc.is_in(t.column("obj"), value_set=cb))
        return pa.table({"e": pa.array(
            [int(pc.sum(keep.cast(pa.int64())).as_py() or 0)], pa.int64())})

    e_club = sum(r["e"] for r in _kg_edge_pairs(sf_dir).map_batches(
        inside, batch_format="pyarrow").take_all())
    return rd.from_arrow(pa.table({
        "n_club": pa.array([n_club], pa.int64()),
        "e_club": pa.array([e_club], pa.int64()),
        "phi": pa.array([round(e_club / (n_club * (n_club - 1)), 4)],
                        pa.float64())}))


def kg_community_conductance(sf_dir: str):
    """Cut quality of the LPA partition: per community, total incident
    edge weight (vol), weight crossing the boundary (cut), and
    conductance = cut / vol — the "are these communities real" score
    next to kg_modularity. Two adaptive joins of the broadcast
    (norm, community) assignment onto the memoized edge table, then
    community-keyspace grouped sums."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    assign = _kg_lpa(sf_dir)
    edges = _kg_edge_pairs(sf_dir)

    j = adaptive_join(
        adaptive_join(
            edges,
            assign.map_batches(
                lambda t: t.rename_columns(["subj", "community"]),
                batch_format="pyarrow"),
            on="subj"),
        assign.map_batches(
            lambda t: t.rename_columns(["obj", "obj_comm"]),
            batch_format="pyarrow"),
        on="obj").materialize()  # feeds vol + cut

    vol = grouped_agg(
        j.map_batches(lambda t: t.select(["community", "weight"]),
                      batch_format="pyarrow"),
        ["community"], [("weight", "sum", "vol")])
    cut = grouped_agg(
        j.map_batches(
            lambda t: t.filter(pc.not_equal(
                t.column("community"), t.column("obj_comm")))
            .select(["community", "weight"]),
            batch_format="pyarrow"),
        ["community"], [("weight", "sum", "cut")])

    out = adaptive_join(vol, cut, on="community", how="left")

    def finish(t: pa.Table) -> pa.Table:
        v = t.column("vol").combine_chunks().cast(pa.float64())
        if "cut" in t.schema.names:
            c = pc.fill_null(t.column("cut").combine_chunks(), 0) \
                .cast(pa.float64())
        else:  # no cross-community edge anywhere: the cut side is a
            # schema-less empty dataset and the left join passes the
            # left blocks through untouched
            c = pa.array(np.zeros(len(t)), pa.float64())
        t2 = pa.table({
            "community": t.column("community"),
            "vol": t.column("vol").combine_chunks().cast(pa.int64()),
            "cut": c.cast(pa.int64()),
            "conductance": pc.divide(c, v)})
        return _round4(t2, ["conductance"])

    return out.map_batches(finish, batch_format="pyarrow")


def docs_source_vocab_overlap(sf_dir: str):
    """Source-pair vocabulary Jaccard: for every unordered pair of
    sources, |common distinct terms| / |union| — the "are these two
    crawls the same domain" diagnostic before merging or deduping
    across sources. One distinct (source, term) rollup (vocab x sources
    keyspace), per-source sizes (tiny), and a term-keyed adaptive
    self-join whose output is sum-of-squares-of-per-term-source-counts
    bounded — never the corpus."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg
    from easyner_ray.ops.textstats import _tf_partial

    docs = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def src_terms(t: pa.Table) -> pa.Table:
        pairs = _tf_partial(t, "doc_id", "text")
        row_of = pc.index_in(pairs.column("doc_id"),
                             value_set=t.column("doc_id").combine_chunks())
        src = t.column("source").combine_chunks().take(row_of)
        return pa.Table.from_arrays([src, pairs.column("term")],
                                    names=["source", "term"]) \
            .group_by(["source", "term"]).aggregate([])

    st = grouped_agg(
        docs.map_batches(src_terms, batch_format="pyarrow"),
        ["source", "term"], [("term", "count", "__c")],
    ).select_columns(["source", "term"]).materialize()  # feeds sizes + join

    sizes = {r["source"]: r["n"] for r in grouped_agg(
        st, ["source"], [("term", "count", "n")]).take_all()}

    j = adaptive_join(
        st, st.map_batches(
            lambda t: t.rename_columns(["src_b", "term"]),
            batch_format="pyarrow"),
        on="term")

    def ordered(t: pa.Table) -> pa.Table:
        keep = pc.less(t.column("source"), t.column("src_b"))
        t = t.filter(keep)
        return pa.Table.from_arrays(
            [t.column("source"), t.column("src_b")],
            names=["src_a", "src_b"])

    inter = grouped_agg(j.map_batches(ordered, batch_format="pyarrow"),
                        ["src_a", "src_b"], [("src_a", "count", "n_common")])

    def finish(t: pa.Table) -> pa.Table:
        na = np.array([sizes[s] for s in t.column("src_a").to_pylist()],
                      dtype=np.float64)
        nb = np.array([sizes[s] for s in t.column("src_b").to_pylist()],
                      dtype=np.float64)
        i = t.column("n_common").combine_chunks().cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        t = t.append_column("jaccard",
                            pa.array(i / (na + nb - i), pa.float64()))
        return _round4(t, ["jaccard"])

    return inter.map_batches(finish, batch_format="pyarrow")


# --- TPC-H analog completion: Q2, Q8, Q9, Q11, Q12, Q16, Q20, Q21 ------------
# The testdata schema has no partsupp table, so the part<->supplier
# relationships flow through the lineitem bridge (DISTINCT (l_partkey,
# l_suppkey)); ps_supplycost-driven predicates become s_acctbal / shipped-
# quantity analogs. Each keeps the original query's SHAPE (correlated min,
# global-share HAVING, multi-exists, conditional-count pivot) and the
# scale discipline of the rest of the family: pruned reads, dimension
# chains reduced before any fact join, per-batch partial aggregation
# below every exchange, adaptive joins (broadcast under the byte gate).


def _distinct_pairs(ds, cols: list[str]):
    """DISTINCT over ``cols``: per-batch dedup (group_by inside the map,
    collapsing repeats before the exchange) then one grouped final on the
    pair keyspace. Returns a dataset of exactly ``cols``."""
    from easyner_ray.ops.relational import grouped_agg

    def pre(t: pa.Table) -> pa.Table:
        g = t.select(cols).group_by(cols).aggregate([([], "count_all")])
        return g.select(cols)

    first = ds.map_batches(pre, batch_format="pyarrow")
    g = grouped_agg(first, cols, [(cols[0], "count", "_n")])
    return g.map_batches(lambda t: t.select(cols), batch_format="pyarrow")


def _dim_table(sf_dir: str, table: str) -> pa.Table:
    """Driver-side read of a FIXED-SIZE dimension (nation: 25 rows,
    region: 5 — constant in SF by the TPC-H schema contract). A full
    Dataset execution for 25 rows costs a ~0.5 s scheduling floor per
    query; one local footer+page read costs microseconds and the table
    broadcasts from the driver exactly like any other ray.put side."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"))


def tpch_q2_min_acctbal_supplier(sf_dir: str):
    """TPC-H Q2 analog (minimum-cost supplier, reduced schema): for each
    size-25 LARGE part, the EUROPE supplier with the LOWEST account
    balance among suppliers that actually shipped it (the lineitem
    bridge stands in for partsupp; s_acctbal for ps_supplycost) ->
    (s_acctbal, s_name, n_name, p_partkey, p_name) ordered by acctbal,
    nation, supplier, part, top 100. The correlated min subquery is a
    grouped min over the bridge joined back on equality — two passes
    over the SAME deduped bridge, no correlated per-row work."""
    import ray

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    # dimension chain: region EUROPE -> nationkeys -> suppliers (tiny)
    nat_t = _dim_table(sf_dir, "nation")
    reg_t = _dim_table(sf_dir, "region")
    eur = reg_t.filter(pc.equal(reg_t.column("r_name"), "EUROPE")) \
        .column("r_regionkey")
    nat_eur = nat_t.filter(pc.is_in(nat_t.column("n_regionkey"),
                                    value_set=eur))
    nk = nat_eur.column("n_nationkey").combine_chunks()
    nname = nat_eur.column("n_name").combine_chunks()
    nk_ref = ray.put((nk, nname))

    supp = _rp(sf_dir, "supplier",
               columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])

    def supp_dim(t: pa.Table) -> pa.Table:
        keys, names = ray.get(nk_ref)
        idx = pc.index_in(t.column("s_nationkey"), value_set=keys)
        t = t.append_column("n_name", names.take(idx.fill_null(0)))
        return t.filter(pc.is_valid(idx)) \
            .select(["s_suppkey", "s_name", "s_acctbal", "n_name"]) \
            .rename_columns(["l_suppkey", "s_name", "s_acctbal", "n_name"])

    supp_eur = supp.map_batches(supp_dim, batch_format="pyarrow")

    # part slice -> broadcast partkey -> p_name map
    parts = _rp(sf_dir, "part",
                columns=["p_partkey", "p_name", "p_size", "p_type"])
    pm = pa.concat_tables(ray.get(parts.map_batches(
        lambda t: t.filter(pc.and_(
            pc.equal(t.column("p_size"), 25),
            pc.equal(t.column("p_type"), "LARGE")))
        .select(["p_partkey", "p_name"]),
        batch_format="pyarrow").materialize().to_arrow_refs()))
    p_ref = ray.put((pm.column("p_partkey").combine_chunks(),
                     pm.column("p_name").combine_chunks()))

    li = _rp(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    li = li.map_batches(
        lambda t: t.filter(pc.is_in(t.column("l_partkey"),
                                    value_set=ray.get(p_ref)[0])),
        batch_format="pyarrow")
    bridge = adaptive_join(_distinct_pairs(li, ["l_partkey", "l_suppkey"]),
                           supp_eur, on="l_suppkey").materialize()

    best = grouped_agg(bridge, ["l_partkey"],
                       [("s_acctbal", "min", "min_bal")])
    cand = adaptive_join(bridge, best, on="l_partkey")

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("s_acctbal"), t.column("min_bal")))
        keys, names = ray.get(p_ref)
        idx = pc.index_in(t.column("l_partkey"), value_set=keys)
        t = t.append_column("p_name", names.take(idx.fill_null(0)))
        return pa.table({"s_acctbal": t.column("s_acctbal"),
                         "s_name": t.column("s_name"),
                         "n_name": t.column("n_name"),
                         "p_partkey": t.column("l_partkey"),
                         "p_name": t.column("p_name")})

    return cand.map_batches(finish, batch_format="pyarrow") \
        .sort(["s_acctbal", "n_name", "s_name", "p_partkey"],
              descending=[False, False, False, False]).limit(100)


def tpch_q8_market_share(sf_dir: str):
    """TPC-H Q8 analog (national market share): among 1996-1997 orders
    by ASIA-region customers for STANDARD-type parts, NATION_3
    suppliers' share of revenue per order year -> (o_year,
    nation_volume, total_volume, mkt_share). Dimension chains reduce
    both fact streams before their joins; the share is computed from
    the round-4 sums on both engines (round-6 ratio) so the division
    is cross-engine deterministic."""
    from datetime import datetime

    import ray

    from easyner_ray.ops.relational import (adaptive_join,
                                            adaptive_semi_join,
                                            grouped_agg)

    # ASIA customers (dim chain kept lazy; semi-reduces orders)
    nat_t = _dim_table(sf_dir, "nation")
    reg_t = _dim_table(sf_dir, "region")
    asia = reg_t.filter(pc.equal(reg_t.column("r_name"), "ASIA")) \
        .column("r_regionkey")
    nk = nat_t.filter(pc.is_in(nat_t.column("n_regionkey"),
                               value_set=asia)) \
        .column("n_nationkey").combine_chunks()
    nk_ref = ray.put(nk)

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.is_in(t.column("c_nationkey"),
                                    value_set=ray.get(nk_ref)))
        .select(["c_custkey"]).rename_columns(["o_custkey"]),
        batch_format="pyarrow")

    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
            pc.less(t.column("o_orderdate"), pa.scalar(hi)))),
        batch_format="pyarrow")
    o_side = adaptive_semi_join(orders, cust, on="o_custkey").map_batches(
        lambda t: pa.table({
            "l_orderkey": t.column("o_orderkey"),
            "o_year": pc.year(t.column("o_orderdate")).cast(pa.int64())}),
        batch_format="pyarrow")

    # STANDARD parts -> broadcast key set
    parts = _rp(sf_dir, "part", columns=["p_partkey", "p_type"])
    pk = pa.concat_tables(ray.get(parts.map_batches(
        lambda t: t.filter(pc.equal(t.column("p_type"), "STANDARD"))
        .select(["p_partkey"]),
        batch_format="pyarrow").materialize().to_arrow_refs())) \
        .column("p_partkey").combine_chunks()
    pk_ref = ray.put(pk)

    # supplier -> nation name (the numerator tag)
    supp = _rp(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nat_names = (nat_t.column("n_nationkey").combine_chunks(),
                 nat_t.column("n_name").combine_chunks())
    nn_ref = ray.put(nat_names)

    def supp_dim(t: pa.Table) -> pa.Table:
        keys, names = ray.get(nn_ref)
        idx = pc.index_in(t.column("s_nationkey"), value_set=keys)
        return pa.table({"l_suppkey": t.column("s_suppkey"),
                         "supp_nation": names.take(idx.fill_null(0))})

    supp_d = supp.map_batches(supp_dim, batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda t: t.filter(pc.is_in(t.column("l_partkey"),
                                    value_set=ray.get(pk_ref))),
        batch_format="pyarrow")
    j = adaptive_join(adaptive_join(li, supp_d, on="l_suppkey"),
                      o_side, on="l_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        vol = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        num = pc.if_else(pc.equal(t.column("supp_nation"), "NATION_3"),
                         vol, pa.scalar(0.0))
        g = pa.table({"o_year": t.column("o_year"), "num": num,
                      "den": vol}) \
            .group_by(["o_year"]).aggregate([("num", "sum"), ("den", "sum")])
        return g.rename_columns(["o_year", "num", "den"])

    agg = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["o_year"], [("num", "sum", "num"),
                                   ("den", "sum", "den")])

    def finish(t: pa.Table) -> pa.Table:
        # FINAL |years|-row table: Python round (the _round4 device) —
        # pc.round can land one ulp off DuckDB's decimal rounding.
        num = [round(v, 4) for v in t.column("num").to_pylist()]
        den = [round(v, 4) for v in t.column("den").to_pylist()]
        share = [None if d == 0 else round(n / d, 6)
                 for n, d in zip(num, den)]
        return pa.table({
            "o_year": t.column("o_year"),
            "nation_volume": pa.array(num, pa.float64()),
            "total_volume": pa.array(den, pa.float64()),
            "mkt_share": pa.array(share, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow").sort("o_year")


def tpch_q9_nation_profit(sf_dir: str):
    """TPC-H Q9 analog (product-type profit, reduced schema): revenue
    (no ps_supplycost in this schema) per (supplier nation, order year)
    over parts named '%widget%' -> (nation, o_year, sum_profit) ordered
    by nation asc, year desc. Lineitem partials collapse onto
    (l_orderkey, nation) BEFORE the orders join ships a year column,
    then the final rolls onto the |nations| x |years| keyspace."""
    import ray

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    parts = _rp(sf_dir, "part", columns=["p_partkey", "p_name"])
    pk = pa.concat_tables(ray.get(parts.map_batches(
        lambda t: t.filter(pc.match_substring(t.column("p_name"), "widget"))
        .select(["p_partkey"]),
        batch_format="pyarrow").materialize().to_arrow_refs())) \
        .column("p_partkey").combine_chunks()
    pk_ref = ray.put(pk)

    nat_t = _dim_table(sf_dir, "nation")
    nn_ref = ray.put((nat_t.column("n_nationkey").combine_chunks(),
                      nat_t.column("n_name").combine_chunks()))

    supp = _rp(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def supp_dim(t: pa.Table) -> pa.Table:
        keys, names = ray.get(nn_ref)
        idx = pc.index_in(t.column("s_nationkey"), value_set=keys)
        return pa.table({"l_suppkey": t.column("s_suppkey"),
                         "nation": names.take(idx.fill_null(0))})

    supp_d = supp.map_batches(supp_dim, batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda t: t.filter(pc.is_in(t.column("l_partkey"),
                                    value_set=ray.get(pk_ref))),
        batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        amt = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = pa.table({"l_orderkey": t.column("l_orderkey"),
                      "nation": t.column("nation"), "amt": amt}) \
            .group_by(["l_orderkey", "nation"]).aggregate([("amt", "sum")])
        return g.rename_columns(["l_orderkey", "nation", "amt"])

    li_n = adaptive_join(li, supp_d, on="l_suppkey") \
        .map_batches(partial, batch_format="pyarrow")

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    o_side = orders.map_batches(
        lambda t: pa.table({
            "l_orderkey": t.column("o_orderkey"),
            "o_year": pc.year(t.column("o_orderdate")).cast(pa.int64())}),
        batch_format="pyarrow")

    j = adaptive_join(li_n, o_side, on="l_orderkey")
    agg = grouped_agg(j, ["nation", "o_year"],
                      [("amt", "sum", "sum_profit")])
    return agg.map_batches(lambda t: _round4(t, ["sum_profit"]),
                           batch_format="pyarrow") \
        .sort(["nation", "o_year"], descending=[False, True])


def tpch_q11_important_parts(sf_dir: str):
    """TPC-H Q11 analog (important stock, reduced schema): per-part
    shipped value (l_extendedprice * l_quantity) from NATION_2
    suppliers, keeping parts whose value exceeds the per-part average
    (the global-scalar HAVING) -> (l_partkey, value) ordered by value
    desc. The global-sum
    HAVING is the classic two-pass: grouped round-4 values, then a
    scalar partial pass for the threshold (tiny driver reduce), then a
    vectorized filter — the fact stream is scanned once."""
    import ray

    from easyner_ray.ops.relational import grouped_agg

    nat_t = _dim_table(sf_dir, "nation")
    nk = nat_t.filter(pc.equal(nat_t.column("n_name"), "NATION_2")) \
        .column("n_nationkey")
    supp = _rp(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    sk = pa.concat_tables(ray.get(supp.map_batches(
        lambda t: t.filter(pc.is_in(t.column("s_nationkey"),
                                    value_set=nk))
        .select(["s_suppkey"]),
        batch_format="pyarrow").materialize().to_arrow_refs())) \
        .column("s_suppkey").combine_chunks()
    sk_ref = ray.put(sk)

    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_suppkey", "l_extendedprice",
                      "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("l_suppkey"),
                              value_set=ray.get(sk_ref)))
        val = pc.multiply(t.column("l_extendedprice"),
                          t.column("l_quantity"))
        g = pa.table({"l_partkey": t.column("l_partkey"), "val": val}) \
            .group_by(["l_partkey"]).aggregate([("val", "sum")])
        return g.rename_columns(["l_partkey", "val"])

    per_part = grouped_agg(li.map_batches(partial, batch_format="pyarrow"),
                           ["l_partkey"], [("val", "sum", "val")]) \
        .map_batches(
            lambda t: pa.table({"l_partkey": t.column("l_partkey"),
                                "value": pc.round(t.column("val"), 4)}),
            batch_format="pyarrow").materialize()

    tot_rows = per_part.map_batches(
        lambda t: pa.table({"s": pa.array(
            [pc.sum(t.column("value")).as_py() or 0.0], pa.float64()),
            "n": pa.array([len(t)], pa.int64())}),
        batch_format="pyarrow").take_all()
    total = sum(r["s"] for r in tot_rows)
    n_parts = sum(r["n"] for r in tot_rows)
    # above-AVERAGE gate (not a fixed fraction): TPC-H's SF-dependent
    # 0.0001/SF constant would go degenerate at a fixed test SF; the
    # mean threshold keeps the HAVING-over-global-scalar shape and a
    # non-trivial result at every scale.
    threshold = round(total / n_parts, 4) if n_parts else 0.0

    # the distributed pass keeps the vectorized pc.round grain; the
    # FINAL small table re-rounds with Python round (_round4) to kill
    # the one-ulp pc.round/DuckDB divergence on ~1e6-magnitude values.
    filt = per_part.map_batches(
        lambda t: _round4(t.filter(pc.greater(t.column("value"),
                                              pa.scalar(threshold))),
                          ["value"]),
        batch_format="pyarrow").materialize()
    if filt.count() == 0:  # empty nation slice / all-equal values:
        # sorting a fully-empty stream loses the schema (and Ray's
        # from_arrow(empty) drops columns in to_pandas) — return the
        # typed empty Arrow table itself (a legal queries() result).
        return pa.schema([("l_partkey", pa.int64()),
                          ("value", pa.float64())]).empty_table()
    return filt.sort(["value", "l_partkey"], descending=[True, False])


def tpch_q12_late_lines(sf_dir: str):
    """TPC-H Q12 analog (shipping-lag priority pivot, reduced schema —
    no l_shipmode/commitdate): 1997-shipped lineitems classed LATE
    (shipped > 90 days after the order date) vs ONTIME, counting
    critical-priority (1-URGENT / 2-HIGH) and other orders per class ->
    (lag_class, high_line_count, low_line_count). Exact-integer
    conditional counts; the one fact join is adaptive; partials
    collapse onto the 2-row keyspace inside every batch."""
    from datetime import datetime

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)
    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    li = li.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
            pc.less(t.column("l_shipdate"), pa.scalar(hi)))),
        batch_format="pyarrow")

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(lambda t: t.rename_columns(
            ["l_orderkey", "o_orderdate", "o_orderpriority"]),
            batch_format="pyarrow")
    j = adaptive_join(li, orders, on="l_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        ship_us = t.column("l_shipdate").cast(pa.int64())
        ord_us = t.column("o_orderdate").cast(pa.int64())
        late = pc.greater(pc.subtract(ship_us, ord_us),
                          pa.scalar(90 * 86400 * 1_000_000))
        cls = pc.if_else(late, "LATE", "ONTIME")
        crit = pc.is_in(t.column("o_orderpriority"),
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        hi_c = crit.cast(pa.int64())
        lo_c = pc.invert(crit).cast(pa.int64())
        g = pa.table({"lag_class": cls, "h": hi_c, "l": lo_c}) \
            .group_by(["lag_class"]).aggregate([("h", "sum"), ("l", "sum")])
        return g.rename_columns(["lag_class", "h", "l"])

    agg = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["lag_class"], [("h", "sum", "high_line_count"),
                                      ("l", "sum", "low_line_count")])
    return agg.sort("lag_class")


def tpch_q16_supplier_census(sf_dir: str):
    """TPC-H Q16 analog (supplier-part census, reduced schema): count
    of distinct suppliers that shipped each (p_brand, p_type, p_size)
    slice — sizes {1,4,9,16,25,36,49}, excluding Brand#5 and PROMO
    parts, and excluding low-balance suppliers (s_acctbal < 1000, the
    complaints-subquery analog) -> (p_brand, p_type, p_size,
    supplier_cnt) ordered by count desc then attrs. The part<->supplier
    relation is the deduped lineitem bridge; COUNT(DISTINCT) is a
    second distinct on (attrs, suppkey) then a grouped count — both
    distincts collapse per batch before their exchange."""
    import ray

    from easyner_ray.ops.relational import grouped_agg

    sizes = pa.array([1, 4, 9, 16, 25, 36, 49], pa.int64())
    parts = _rp(sf_dir, "part",
                columns=["p_partkey", "p_brand", "p_type", "p_size"])
    pm = pa.concat_tables(ray.get(parts.map_batches(
        lambda t: t.filter(pc.and_(pc.and_(
            pc.not_equal(t.column("p_brand"), "Brand#5"),
            pc.not_equal(t.column("p_type"), "PROMO")),
            pc.is_in(t.column("p_size").cast(pa.int64()),
                     value_set=sizes))),
        batch_format="pyarrow").materialize().to_arrow_refs()))
    p_ref = ray.put((pm.column("p_partkey").combine_chunks(),
                     pm.column("p_brand").combine_chunks(),
                     pm.column("p_type").combine_chunks(),
                     pm.column("p_size").combine_chunks()))

    supp = _rp(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])
    bad = pa.concat_tables(ray.get(supp.map_batches(
        lambda t: t.filter(pc.less(t.column("s_acctbal"), 1000.0))
        .select(["s_suppkey"]),
        batch_format="pyarrow").materialize().to_arrow_refs())) \
        .column("s_suppkey").combine_chunks()
    bad_ref = ray.put(bad)

    li = _rp(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pre(t: pa.Table) -> pa.Table:
        keys = ray.get(p_ref)[0]
        t = t.filter(pc.and_(
            pc.is_in(t.column("l_partkey"), value_set=keys),
            pc.invert(pc.is_in(t.column("l_suppkey"),
                               value_set=ray.get(bad_ref)))))
        return t

    pairs = _distinct_pairs(li.map_batches(pre, batch_format="pyarrow"),
                            ["l_partkey", "l_suppkey"])

    def attrs(t: pa.Table) -> pa.Table:
        keys, brand, typ, size = ray.get(p_ref)
        idx = pc.index_in(t.column("l_partkey"), value_set=keys)
        return pa.table({"p_brand": brand.take(idx),
                         "p_type": typ.take(idx),
                         "p_size": size.take(idx),
                         "l_suppkey": t.column("l_suppkey")})

    tagged = _distinct_pairs(
        pairs.map_batches(attrs, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "l_suppkey"])
    agg = grouped_agg(tagged, ["p_brand", "p_type", "p_size"],
                      [("l_suppkey", "count", "supplier_cnt")])
    return agg.sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
                    descending=[True, False, False, False])


def tpch_q20_dominant_suppliers(sf_dir: str):
    """TPC-H Q20 analog (excess-supply suppliers, reduced schema):
    suppliers that dominated the 1997 supply of some PROMO
    part — shipped more than half of that part's 1997 total quantity
    (the ps_availqty > 0.5 * sum(l_quantity) analog) -> (s_name,
    n_name) sorted. Per-(part, supplier) quantity partials roll up
    once; the per-part total is a second grouped pass over that SAME
    (already tiny-keyed) result; the dominance gate is a vectorized
    post-join filter; the supplier dimension never touches a fact
    stream."""
    import ray

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    parts = _rp(sf_dir, "part", columns=["p_partkey", "p_type"])
    pk = pa.concat_tables(ray.get(parts.map_batches(
        lambda t: t.filter(pc.equal(t.column("p_type"), "PROMO"))
        .select(["p_partkey"]),
        batch_format="pyarrow").materialize().to_arrow_refs())) \
        .column("p_partkey").combine_chunks()
    pk_ref = ray.put(pk)

    from datetime import datetime
    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)
    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
            pc.less(t.column("l_shipdate"), pa.scalar(hi))),
            pc.is_in(t.column("l_partkey"), value_set=ray.get(pk_ref))))
        g = t.select(["l_partkey", "l_suppkey", "l_quantity"]) \
            .group_by(["l_partkey", "l_suppkey"]) \
            .aggregate([("l_quantity", "sum")])
        return g.rename_columns(["l_partkey", "l_suppkey", "qty"])

    ps = grouped_agg(li.map_batches(partial, batch_format="pyarrow"),
                     ["l_partkey", "l_suppkey"], [("qty", "sum", "qty")]) \
        .map_batches(
            lambda t: pa.table({"l_partkey": t.column("l_partkey"),
                                "l_suppkey": t.column("l_suppkey"),
                                "qty": pc.round(t.column("qty"), 4)}),
            batch_format="pyarrow").materialize()

    tot = grouped_agg(ps, ["l_partkey"], [("qty", "sum", "tot")]) \
        .map_batches(
            lambda t: pa.table({"l_partkey": t.column("l_partkey"),
                                "tot": pc.round(t.column("tot"), 4)}),
            batch_format="pyarrow")

    j = adaptive_join(ps, tot, on="l_partkey")
    dom = j.map_batches(
        lambda t: t.filter(pc.greater(
            t.column("qty"), pc.multiply(pa.scalar(0.5), t.column("tot"))))
        .select(["l_suppkey"]),
        batch_format="pyarrow")
    dom_keys = _distinct_pairs(dom, ["l_suppkey"])
    sk = pa.concat_tables([b for b in ray.get(
        dom_keys.materialize().to_arrow_refs()) if len(b)] or
        [pa.schema([("l_suppkey", pa.int64())]).empty_table()]) \
        .column("l_suppkey").combine_chunks()
    sk_ref = ray.put(sk)

    nat_t = _dim_table(sf_dir, "nation")
    nk_ref = ray.put((nat_t.column("n_nationkey").combine_chunks(),
                      nat_t.column("n_name").combine_chunks()))

    supp = _rp(sf_dir, "supplier",
               columns=["s_suppkey", "s_name", "s_nationkey"])

    def finish(t: pa.Table) -> pa.Table:
        keys, names = ray.get(nk_ref)
        idx = pc.index_in(t.column("s_nationkey"), value_set=keys)
        t = t.append_column("n_name", names.take(idx.fill_null(0)))
        t = t.filter(pc.is_in(t.column("s_suppkey"),
                              value_set=ray.get(sk_ref)))
        return t.select(["s_name", "n_name"])

    return supp.map_batches(finish, batch_format="pyarrow").sort("s_name")


def tpch_q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 analog (suppliers who kept orders waiting, reduced
    schema — no commit/receipt dates): on multi-supplier 'F'-status
    orders, the supplier whose latest line ships STRICTLY after every
    other supplier's latest line "kept the order waiting"; count such
    orders per supplier -> (s_name, numwait) top-100 by count desc.
    The EXISTS (another supplier) / NOT EXISTS (another equally-late
    supplier) pair becomes: per-(order, supplier) max-shipdate rollup,
    per-order (count, max) rollup, then a winners-join where the
    uniqueness gate is 'exactly one supplier at the order max' —
    exact-integer semantics, three grouped exchanges on shrinking
    keyspaces, no correlated scans."""
    import ray

    from easyner_ray.ops.relational import (adaptive_join,
                                            adaptive_semi_join,
                                            grouped_agg)

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    fkeys = orders.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderstatus"), "F"))
        .select(["o_orderkey"]).rename_columns(["l_orderkey"]),
        batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    li = adaptive_semi_join(li, fkeys, on="l_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey", "l_suppkey"]) \
            .aggregate([("l_shipdate", "max")])
        return g.rename_columns(["l_orderkey", "l_suppkey", "sd"])

    per_supp = grouped_agg(li.map_batches(partial, batch_format="pyarrow"),
                           ["l_orderkey", "l_suppkey"],
                           [("sd", "max", "sd")]).materialize()

    per_order = grouped_agg(
        per_supp.map_batches(
            lambda t: pa.table({"l_orderkey": t.column("l_orderkey"),
                                "sd": t.column("sd"),
                                "c": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow"),
        ["l_orderkey"], [("c", "sum", "nsupp"), ("sd", "max", "omax")])

    j = adaptive_join(per_supp, per_order, on="l_orderkey")
    winners = j.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("nsupp"), 2),
            pc.equal(t.column("sd"), t.column("omax"))))
        .select(["l_orderkey", "l_suppkey"]),
        batch_format="pyarrow")

    uniq = grouped_agg(
        winners.map_batches(
            lambda t: pa.table({"l_orderkey": t.column("l_orderkey"),
                                "l_suppkey": t.column("l_suppkey"),
                                "c": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow"),
        ["l_orderkey"], [("c", "sum", "nw"), ("l_suppkey", "min", "w")])
    waits = uniq.map_batches(
        lambda t: t.filter(pc.equal(t.column("nw"), 1))
        .select(["w"]).rename_columns(["l_suppkey"]),
        batch_format="pyarrow")
    counts = grouped_agg(
        waits.map_batches(
            lambda t: t.append_column(
                "c", pa.array(np.ones(len(t), np.int64))),
            batch_format="pyarrow"),
        ["l_suppkey"], [("c", "sum", "numwait")])

    supp = _rp(sf_dir, "supplier", columns=["s_suppkey", "s_name"]) \
        .map_batches(lambda t: t.rename_columns(["l_suppkey", "s_name"]),
                     batch_format="pyarrow")
    out = adaptive_join(counts, supp, on="l_suppkey").map_batches(
        lambda t: t.select(["s_name", "numwait"]),
        batch_format="pyarrow")
    return out.sort(["numwait", "s_name"],
                    descending=[True, False]).limit(100)


# --- data-layout family: Z-order clustering + range partitioning ------------


def events_zorder_layout(sf_dir: str):
    """Z-order (Morton) clustering key over (user_id, ts) for every
    event -> (event_id, zkey). The OPTIMIZE ZORDER primitive: writing
    the table sorted by zkey makes fragment min/max stats selective on
    BOTH columns, so later reads filtering on either user or time skip
    most fragments. One tiny statistics pass + one streaming integer
    map; the quantization is exact int64 floor arithmetic, so the SQL
    oracle reproduces the key bit-for-bit."""
    from easyner_ray.ops.layout import zorder_keys

    ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return zorder_keys(ev, ["user_id", "ts"], id_col="event_id") \
        .sort("event_id")


def events_zorder_skip(sf_dir: str):
    """Fragment-skipping payoff audit: bucket events 256 ways by (a)
    the top 8 bits of the (user_id, ts) Z-order key and (b) arrival
    order (event_id range), record per-bucket min/max of BOTH ts and
    user_id — the stats a sink manifest keeps — and count how many
    buckets a reader could SKIP under (i) a fixed 3-day window
    predicate and (ii) a bottom-decile user-range predicate -> one row
    (n_buckets_z, n_buckets_linear, z_time_skipped,
    linear_time_skipped, z_user_skipped, linear_user_skipped).
    Arrival order is already time-coherent (events land roughly in ts
    order) so it prunes the time predicate; it prunes NOTHING on the
    user predicate — the Z-order layout prunes both, which is the
    whole point of interleaving. Single streaming pass, two tiny
    bucket-keyspace rollups."""
    from datetime import datetime, timezone

    from easyner_ray.ops.layout import _interleave, column_minmax_int
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    mm = column_minmax_int(ev, ["user_id", "ts", "event_id"])
    # naive-UTC epoch micros (the storage convention; DuckDB epoch_us
    # of a naive TIMESTAMP literal matches) — never the local zone
    t1 = int(datetime(2024, 1, 10,
                      tzinfo=timezone.utc).timestamp() * 1_000_000)
    t2 = int(datetime(2024, 1, 13,
                      tzinfo=timezone.utc).timestamp() * 1_000_000)
    top = (1 << 16) - 1

    def buckets(t: pa.Table) -> pa.Table:
        tus = t.column("ts").cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t.column("user_id").cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t.column("event_id").cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        qs = []
        for arr, c in ((uid, "user_id"), (tus, "ts")):
            mn, mx = mm[c]
            span = mx - mn
            qs.append(np.zeros(len(t), np.int64) if span <= 0
                      else (arr - mn) * top // span)
        zb = _interleave(qs, 16) >> np.int64(24)
        mni, mxi = mm["event_id"]
        span_i = mxi - mni
        lb = (np.zeros(len(t), np.int64) if span_i <= 0
              else (eid - mni) * 255 // span_i)
        return pa.table({"zb": pa.array(zb, pa.int64()),
                         "lb": pa.array(lb, pa.int64()),
                         "tus": pa.array(tus, pa.int64()),
                         "uid": pa.array(uid, pa.int64())})

    tagged = ev.map_batches(buckets, batch_format="pyarrow").materialize()
    mnu, mxu = mm["user_id"]
    u_hi = mnu + (mxu - mnu) // 10  # bottom-decile user-range predicate

    def skip_counts(bucket_col: str):
        g = grouped_agg(tagged, [bucket_col],
                        [("tus", "min", "tmn"), ("tus", "max", "tmx"),
                         ("uid", "min", "umn"), ("uid", "max", "umx")])
        rows = g.take_all()  # <= 256 rows
        t_skip = sum(1 for r in rows if r["tmx"] < t1 or r["tmn"] >= t2)
        u_skip = sum(1 for r in rows if r["umn"] > u_hi)
        return len(rows), t_skip, u_skip

    nz, zt, zu = skip_counts("zb")
    nl, lt, lu = skip_counts("lb")
    return pa.table({
        "n_buckets_z": pa.array([nz], pa.int64()),
        "n_buckets_linear": pa.array([nl], pa.int64()),
        "z_time_skipped": pa.array([zt], pa.int64()),
        "linear_time_skipped": pa.array([lt], pa.int64()),
        "z_user_skipped": pa.array([zu], pa.int64()),
        "linear_user_skipped": pa.array([lu], pa.int64())})


def events_range_partition(sf_dir: str):
    """Balanced range-partition assignment for a skew-proof sorted
    write: 8 partitions of events by value, cut at the exact octile
    values (histogram-refined, no sort) -> (event_id, part). part =
    #cuts strictly below the value, so DuckDB's quantile_disc octiles
    reproduce the assignment exactly."""
    from easyner_ray.ops.layout import range_partition_ids

    ev = _rp(sf_dir, "events", columns=["event_id", "value"])
    return range_partition_ids(ev, "value", 8, id_col="event_id") \
        .sort("event_id")


_CLUSTERED_CACHE: dict = {}


def events_pruned_window(sf_dir: str):
    """End-to-end data-skipping drill through the clustered sink: write
    the events table as Z-order range partitions over (user_id, ts)
    (cached per corpus under /tmp), then answer a 3-day-window x
    user-range predicate via the stat-pruned reader -> the matching
    (event_id, user_id, value) rows, sorted. The driver's oracle is the
    plain SQL filter, so this row-for-row gates that manifest pruning
    never drops or duplicates a row — the property a 100 TB read
    planner must not get wrong."""
    import tempfile
    from datetime import datetime

    from easyner_ray.state.clustered import read_pruned, write_clustered

    key = ("clustered_events", sf_dir)
    root = _CLUSTERED_CACHE.get(key)
    if root is None:
        import zlib
        root = os.path.join(
            tempfile.gettempdir(),
            f"easyner_clustered_{zlib.crc32(sf_dir.encode()):08x}")
        ev = _rp(sf_dir, "events",
                 columns=["event_id", "user_id", "ts", "value"])
        if not os.path.exists(os.path.join(root, "_SUCCESS")):
            write_clustered(ev, root, cols=["user_id", "ts"],
                            num_partitions=32)
        _CLUSTERED_CACHE[key] = root

    ds, _report = read_pruned(
        root, {"ts": (datetime(2024, 1, 10), datetime(2024, 1, 13)),
               "user_id": (0, 9)},
        columns=["event_id", "user_id", "ts", "value"])
    if ds is None:
        return pa.schema([("event_id", pa.int64()),
                          ("user_id", pa.int64()),
                          ("value", pa.float64())]).empty_table()
    return ds.map_batches(
        lambda t: t.select(["event_id", "user_id", "value"]),
        batch_format="pyarrow").sort("event_id")


def conv_loss_masks(sf_dir: str):
    """SFT loss-mask layout: per turn, the token span it occupies in
    its assembled conversation ([tok_start, tok_end) under the corpus
    whitespace-token convention) and whether those tokens TRAIN
    (assistant turns) or are context-only (user/tool/system) ->
    (conv_id, turn_idx, role, n_tokens, tok_start, tok_end, train).
    This is the artifact a packing + masked-cross-entropy data loader
    consumes. One vectorized regex count per batch, then the same ONE
    bucketed exchange as events_running_totals for the per-conversation
    running offset; integer cumsum is exact (< 2^53)."""
    from easyner_ray.ops.analytic import partitioned_analytics

    tr = _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "role", "text"])

    def tok(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column("text"),
                                     r"[^\s]+").cast(pa.int64())
        return pa.table({"conv_id": t.column("conv_id"),
                         "turn_idx": t.column("turn_idx"),
                         "role": t.column("role"),
                         "n_tokens": n})

    base = tr.map_batches(tok, batch_format="pyarrow")
    out = partitioned_analytics(base, ["conv_id"], ["turn_idx"],
                                [("cumsum", "n_tokens", "tok_end")])

    def finish(t: pa.Table) -> pa.Table:
        end = t.column("tok_end").cast(pa.int64())
        n = t.column("n_tokens").cast(pa.int64())
        train = pc.equal(t.column("role"), "assistant").cast(pa.int64())
        return pa.table({"conv_id": t.column("conv_id"),
                         "turn_idx": t.column("turn_idx").cast(pa.int64()),
                         "role": t.column("role"),
                         "n_tokens": n,
                         "tok_start": pc.subtract(end, n),
                         "tok_end": end,
                         "train": train})

    return out.map_batches(finish, batch_format="pyarrow") \
        .sort(["conv_id", "turn_idx"])


def conv_packed_sft(sf_dir: str):
    """Conversation-level sequence packing for SFT: whole conversations
    (the atomic SFT unit — splitting one would orphan its context)
    greedily packed into 2048-token budget sequences, shard-local like
    docs_packed_sharded: bucket = Knuth hash of the numeric conv id
    mod 8, so no task ever cumsums the whole corpus -> (conv_id,
    bucket, n_tokens, cum, pack_id). Composite pack identity
    (bucket, pack_id); pairs with conv_loss_masks (the in-pack token
    spans) to drive a packing + masked-loss data loader. One grouped
    rollup onto the conversation keyspace, then the standard bucketed
    cumsum exchange."""
    import numpy as np

    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import _KNUTH32, grouped_agg

    tr = _transcripts_cols(sf_dir, ["conv_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column("text"),
                                     r"[^\s]+").cast(pa.int64())
        g = pa.table({"conv_id": t.column("conv_id"), "n": n}) \
            .group_by(["conv_id"]).aggregate([("n", "sum")])
        return g.rename_columns(["conv_id", "n"])

    totals = grouped_agg(tr.map_batches(tok, batch_format="pyarrow"),
                         ["conv_id"], [("n", "sum", "n_tokens")])

    mask32 = np.uint64(0xFFFFFFFF)
    mult = np.uint64(_KNUTH32)

    def bucketize(t: pa.Table) -> pa.Table:
        cid = pc.utf8_slice_codeunits(t.column("conv_id"), 4, 99) \
            .cast(pa.int64())
        k = np.asarray(cid.combine_chunks()).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = ((k * mult) & mask32) % np.uint64(8)
        return pa.table({"conv_id": t.column("conv_id"),
                         "bucket": pa.array(b.astype(np.int64), pa.int64()),
                         "n_tokens": t.column("n_tokens").cast(pa.int64())})

    cum = partitioned_analytics(
        totals.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"], ["conv_id"], [("cumsum", "n_tokens", "cum")])

    def pack(t: pa.Table) -> pa.Table:
        c = t.column("cum").cast(pa.int64())
        start = pc.subtract(c, t.column("n_tokens"))
        pid = pc.floor(pc.divide(start.cast(pa.float64()),
                                 2048.0)).cast(pa.int64())
        return pa.table({"conv_id": t.column("conv_id"),
                         "bucket": t.column("bucket"),
                         "n_tokens": t.column("n_tokens"),
                         "cum": c, "pack_id": pid})

    return cum.map_batches(pack, batch_format="pyarrow") \
        .sort(["bucket", "conv_id"])


def kg_edge_neighborhood(sf_dir: str):
    """Stat-pruned entity-neighborhood read off the clustered
    edge-serving layout: the fused edge table is written ONCE per
    corpus as (subj, obj) Z-order range partitions (cached under /tmp),
    then every edge whose subject starts with 'a'..'e' is answered from
    manifests + intersecting fragments only -> (subj, pred, obj,
    weight) sorted. The driver oracle recomputes the same range from
    the gold mention table, gating that layout + prune never drop or
    duplicate an edge."""
    import tempfile
    import zlib

    from easyner_ray.pipelines.kg import write_clustered_edges
    from easyner_ray.state.clustered import read_pruned

    key = ("clustered_edges", sf_dir)
    root = _CLUSTERED_CACHE.get(key)
    if root is None:
        root = os.path.join(
            tempfile.gettempdir(),
            f"easyner_cedges_{zlib.crc32(sf_dir.encode()):08x}")
        if not os.path.exists(os.path.join(root, "edges_clustered",
                                           "_SUCCESS")):
            edges = _kg_edges_fused(sf_dir)
            write_clustered_edges(edges, root, num_partitions=16)
        _CLUSTERED_CACHE[key] = root

    lo, hi = "a", "ezzzzzzz"
    ds, _rep = read_pruned(os.path.join(root, "edges_clustered"),
                           {"subj": (lo, hi)})
    if ds is None:
        return pa.schema([("subj", pa.string()), ("pred", pa.string()),
                          ("obj", pa.string()),
                          ("weight", pa.int64())]).empty_table()
    return ds.map_batches(
        lambda t: pa.table({"subj": t.column("subj"),
                            "pred": t.column("pred"),
                            "obj": t.column("obj"),
                            "weight": t.column("weight").cast(pa.int64())}),
        batch_format="pyarrow").sort(["subj", "obj"])


def conv_tool_errors(sf_dir: str):
    """Per-tool failure census over agent transcripts: among tool-role
    turns, how many outputs carry a failure marker (error / exception /
    timeout / failed, case-insensitive) -> (tool, n_outputs, n_errors,
    error_rate). The agent-ops health dashboard primitive: a tool whose
    error rate spikes is the first thing an operator of a transcript
    pipeline pages on. One vectorized regex pass, partials onto the
    tool-sized keyspace, tree final."""
    from easyner_ray.ops.relational import grouped_agg

    tr = _transcripts_cols(sf_dir, ["conv_id", "role", "text", "tool"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t.column("role"), "tool"),
                             pc.is_valid(t.column("tool"))))
        err = pc.match_substring_regex(
            t.column("text"),
            r"(?i)(error|exception|timeout|failed)").cast(pa.int64())
        g = pa.table({"tool": t.column("tool"), "e": err,
                      "c": pa.array(np.ones(len(t), np.int64))}) \
            .group_by(["tool"]).aggregate([("e", "sum"), ("c", "sum")])
        return g.rename_columns(["tool", "e", "c"])

    agg = grouped_agg(tr.map_batches(prep, batch_format="pyarrow"),
                      ["tool"], [("e", "sum", "n_errors"),
                                 ("c", "sum", "n_outputs")],
                      final="tree")

    def finish(t: pa.Table) -> pa.Table:
        e = t.column("n_errors").to_pylist()
        n = t.column("n_outputs").to_pylist()
        rate = pa.array([round(a / b, 4) for a, b in zip(e, n)],
                        pa.float64())
        return pa.table({"tool": t.column("tool"),
                         "n_outputs": pa.array(n, pa.int64()),
                         "n_errors": pa.array(e, pa.int64()),
                         "error_rate": rate})

    return agg.map_batches(finish, batch_format="pyarrow").sort("tool")


def events_rolling_mean(sf_dir: str):
    """Per-user 5-row rolling average of event value — the SQL frame
    ``avg(value) OVER (PARTITION BY user ORDER BY ts, event_id ROWS
    BETWEEN 4 PRECEDING AND CURRENT ROW)``, the moving-average monitor
    every metrics pipeline runs -> (event_id, rolling_avg[4dp]). Same
    ONE bucketed exchange as the other analytics; the frame kernel is
    a vectorized cumsum rebase (extended precision, frame-bounded
    error)."""
    from easyner_ray.ops.analytic import partitioned_analytics

    ev = _rp(sf_dir, "events",
             columns=["user_id", "event_id", "ts", "value"])
    out = partitioned_analytics(ev, ["user_id"], ["ts", "event_id"],
                                [("rolling_mean", "value:5", "ra")])
    # Python-round grain (the _round4 device, same as
    # events_running_totals): pc.round lands one ulp off DuckDB's
    # decimal rounding on ~1e2-magnitude frame means
    return out.map_batches(
        lambda t: _round4(pa.table({"event_id": t.column("event_id"),
                                    "rolling_avg": t.column("ra")}),
                          ["rolling_avg"]),
        batch_format="pyarrow").sort("event_id")


def events_rolling_extrema(sf_dir: str):
    """Per-user 7-row rolling min AND max of event value (the
    drawdown / envelope monitor) -> (event_id, roll_min, roll_max).
    SQL frame min/max OVER ROWS BETWEEN 6 PRECEDING AND CURRENT ROW;
    float min/max select an existing element, so the values are
    bit-exact cross-engine with NO rounding grain."""
    from easyner_ray.ops.analytic import partitioned_analytics

    ev = _rp(sf_dir, "events",
             columns=["user_id", "event_id", "ts", "value"])
    out = partitioned_analytics(ev, ["user_id"], ["ts", "event_id"],
                                [("rolling_min", "value:7", "roll_min"),
                                 ("rolling_max", "value:7", "roll_max")])
    return out.map_batches(
        lambda t: t.select(["event_id", "roll_min", "roll_max"]),
        batch_format="pyarrow").sort("event_id")


def events_value_vs_first(sf_dir: str):
    """Delta from each user's FIRST event value (the baseline-drift
    monitor): first_value(value) OVER (PARTITION BY user ORDER BY ts,
    event_id) and the current-minus-baseline delta -> (event_id,
    first_value, delta[4dp]). Subtraction of two stored doubles is
    exact to representation, so only the delta needs the round grain."""
    from easyner_ray.ops.analytic import partitioned_analytics

    ev = _rp(sf_dir, "events",
             columns=["user_id", "event_id", "ts", "value"])
    out = partitioned_analytics(ev, ["user_id"], ["ts", "event_id"],
                                [("first_value", "value", "first_value")])
    return out.map_batches(
        lambda t: _round4(pa.table({
            "event_id": t.column("event_id"),
            "first_value": t.column("first_value"),
            "delta": pc.subtract(t.column("value"),
                                 t.column("first_value"))}), ["delta"]),
        batch_format="pyarrow").sort("event_id")


def events_mode_bucket(sf_dir: str):
    """Grouped MODE with a deterministic tie rule: per event type, the
    most frequent value decile bucket (floor(value/10), ties broken by
    the smaller bucket) -> (event_type, mode_bucket, n). SQL's mode()
    leaves ties unspecified, so both engines state the rule explicitly:
    count per (type, bucket) — partials collapse per batch — then a
    top-1 per group on (count desc, bucket asc)."""
    from easyner_ray.ops.relational import grouped_agg, topk_per_group

    ev = _rp(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        b = pc.floor(pc.divide(t.column("value"), 10.0)).cast(pa.int64())
        g = pa.table({"event_type": t.column("event_type"), "bucket": b,
                      "c": pa.array(np.ones(len(t), np.int64))}) \
            .group_by(["event_type", "bucket"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "bucket", "c"])

    counts = grouped_agg(ev.map_batches(prep, batch_format="pyarrow"),
                         ["event_type", "bucket"], [("c", "sum", "n")])
    # top-1 by (n desc, bucket asc): encode the tie-break into one
    # order column — n * 2^20 - bucket (buckets are small non-negative)
    keyed = counts.map_batches(
        lambda t: t.append_column(
            "o", pc.subtract(pc.multiply(t.column("n"),
                                         pa.scalar(1 << 20, pa.int64())),
                             t.column("bucket"))),
        batch_format="pyarrow")
    top = topk_per_group(keyed, ["event_type"], "o", 1)
    return top.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type"),
                            "mode_bucket": t.column("bucket"),
                            "n": t.column("n")}),
        batch_format="pyarrow").sort("event_type")


def events_first_last_span(sf_dir: str):
    """Per-user first/last event values on every row (the full-frame
    first_value / last_value pair) plus the span -> (event_id,
    first_value, last_value, span[4dp]). last_value uses the
    UNBOUNDED FOLLOWING frame both engines spell out."""
    from easyner_ray.ops.analytic import partitioned_analytics

    ev = _rp(sf_dir, "events",
             columns=["user_id", "event_id", "ts", "value"])
    out = partitioned_analytics(ev, ["user_id"], ["ts", "event_id"],
                                [("first_value", "value", "first_value"),
                                 ("last_value", "value", "last_value")])
    return out.map_batches(
        lambda t: _round4(pa.table({
            "event_id": t.column("event_id"),
            "first_value": t.column("first_value"),
            "last_value": t.column("last_value"),
            "span": pc.subtract(t.column("last_value"),
                                t.column("first_value"))}), ["span"]),
        batch_format="pyarrow").sort("event_id")


def conv_key_turns(sf_dir: str):
    """Extractive key-turn selection: per conversation, the single turn
    whose DISTINCT terms carry the highest total conversation-IDF
    (ln(N_convs / df)), ties to the earlier turn -> (conv_id, turn_idx,
    score). The extractive-summary / retrieval-snippet primitive over
    transcripts. Distinct (conv, term) rows collapse per batch before
    the df rollup; idf joins back adaptively; the per-(conv, turn) sum
    is one grouped exchange; the argmax is top-1 per conversation on
    the ROUND-4 score (both engines round before the argmax, the
    docs_nb_source_pred device, so near-ties cut identically)."""
    from easyner_ray.ops.relational import (adaptive_join, grouped_agg,
                                            topk_per_group)
    from easyner_ray.ops.textstats import TFIDF_SPLIT_RE

    tr = _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "text"])

    def terms(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(t.column("text").combine_chunks())
        lists = pc.split_pattern_regex(txt, TFIDF_SPLIT_RE)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        g = pa.table({
            "conv_id": t.column("conv_id").take(parent.filter(keep)),
            "turn_idx": t.column("turn_idx").take(parent.filter(keep)),
            "term": flat.filter(keep)}) \
            .group_by(["conv_id", "turn_idx", "term"]) \
            .aggregate([([], "count_all")])
        return g.select(["conv_id", "turn_idx", "term"])

    ctt = grouped_agg(
        tr.map_batches(terms, batch_format="pyarrow"),
        ["conv_id", "turn_idx", "term"],
        [("term", "count", "_n")]).map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "term"]),
        batch_format="pyarrow").materialize()

    # df over conversations (distinct conv first, then count per term)
    cterm = grouped_agg(
        ctt.map_batches(
            lambda t: t.select(["conv_id", "term"])
            .group_by(["conv_id", "term"]).aggregate([([], "count_all")])
            .select(["conv_id", "term"]),
            batch_format="pyarrow"),
        ["conv_id", "term"], [("term", "count", "_n")])
    df = grouped_agg(
        cterm.map_batches(
            lambda t: pa.table({"term": t.column("term"),
                                "c": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow"),
        ["term"], [("c", "sum", "df")])

    n_rows = _transcripts_cols(sf_dir, ["conv_id"]).map_batches(
        lambda t: t.group_by(["conv_id"]).aggregate([([], "count_all")])
        .select(["conv_id"]),
        batch_format="pyarrow")
    n_convs = grouped_agg(
        n_rows, ["conv_id"], [("conv_id", "count", "_n")]).count()

    idf = df.map_batches(
        lambda t: pa.table({
            "term": t.column("term"),
            "idf": pc.ln(pc.divide(pa.scalar(float(n_convs)),
                                   t.column("df").cast(pa.float64())))}),
        batch_format="pyarrow")

    scored = grouped_agg(
        adaptive_join(ctt, idf, on="term"),
        ["conv_id", "turn_idx"], [("idf", "sum", "score")])
    keyed = scored.map_batches(
        lambda t: pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx").cast(pa.int64()),
            "score": pc.round(t.column("score"), 4)}),
        batch_format="pyarrow")
    # argmax on (score desc, turn_idx asc): encode into one order col.
    # Round-4 scores step by >= 1e-4, so score * 2^30 separates distinct
    # scores by >= ~1.07e5 — far above any real conversation's turn
    # count, so the turn_idx tie-break can never override a score edge.
    ordered = keyed.map_batches(
        lambda t: t.append_column(
            "o", pc.subtract(pc.multiply(t.column("score"),
                                         pa.scalar(float(1 << 30))),
                             t.column("turn_idx").cast(pa.float64()))),
        batch_format="pyarrow")
    top = topk_per_group(ordered, ["conv_id"], "o", 1)
    return top.map_batches(
        lambda t: _round4(t.select(["conv_id", "turn_idx", "score"]),
                          ["score"]),
        batch_format="pyarrow").sort("conv_id")


def events_rolling_zscore(sf_dir: str):
    """Frame-local anomaly score: each event's value standardized
    against its user's trailing 8-row window (rolling mean and SAMPLE
    stddev over ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) ->
    (event_id, roll_mean, roll_std, zscore). The streaming-anomaly
    complement of the global events_zscore; head of each frame
    (n < 2) has NULL std and NULL z. Round-4 grain on all three.
    Oracle: derived gold (straight-line recompute of the identical
    from-zero longdouble frame accumulation — SQL window engines sum
    in segment-tree order, which lands one ulp off round boundaries)."""
    from easyner_ray.ops.analytic import partitioned_analytics

    ev = _rp(sf_dir, "events",
             columns=["user_id", "event_id", "ts", "value"])
    out = partitioned_analytics(ev, ["user_id"], ["ts", "event_id"],
                                [("rolling_mean_exact", "value:8", "rm"),
                                 ("rolling_std_exact", "value:8", "rs")])

    def finish(t: pa.Table) -> pa.Table:
        z = pc.divide(pc.subtract(t.column("value"), t.column("rm")),
                      t.column("rs"))
        # frame-head NULLs (n < 2) coalesce to -999999.0 for the
        # value-hash compare — NaN never hash-matches (the
        # events_running_totals device); real NULL semantics pinned by
        # the unit tests.
        sent = pa.scalar(-999999.0, pa.float64())
        return _round4(pa.table({
            "event_id": t.column("event_id"),
            "roll_mean": t.column("rm"),
            "roll_std": t.column("rs").fill_null(sent),
            "zscore": z.fill_null(sent)}),
            ["roll_mean", "roll_std", "zscore"])

    return out.map_batches(finish, batch_format="pyarrow") \
        .sort("event_id")


def events_value_deciles(sf_dir: str):
    """Per-type decile assignment — ntile(10) over (value, event_id)
    within each event type -> (event_id, decile). Exact-integer SQL
    ntile semantics (first `rem` tiles one row bigger), the
    quantile-BUCKETING complement of events_value_quantiles' cut
    points; one bucketed exchange."""
    from easyner_ray.ops.analytic import partitioned_analytics

    ev = _rp(sf_dir, "events",
             columns=["event_type", "event_id", "value"])
    out = partitioned_analytics(ev, ["event_type"],
                                ["value", "event_id"],
                                [("ntile", "10", "decile")])
    return out.map_batches(
        lambda t: t.select(["event_id", "decile"]),
        batch_format="pyarrow").sort("event_id")


def events_user_value_share(sf_dir: str):
    """Each user's share of their event type's total value — the
    ORDER-less partition-total window (sum(value) OVER (PARTITION BY
    type)) realized as the two-phase grouped sum it IS at scale:
    per-(type, user) partials, a type-keyspace rollup broadcast back,
    and a round-6 ratio of the two round-4 sums -> (event_type,
    user_id, user_value, type_value, share)."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    ev = _rp(sf_dir, "events",
             columns=["event_type", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]) \
            .aggregate([("value", "sum")])
        return g.rename_columns(["event_type", "user_id", "v"])

    per_user = grouped_agg(ev.map_batches(partial, batch_format="pyarrow"),
                           ["event_type", "user_id"],
                           [("v", "sum", "v")]).materialize()
    per_type = grouped_agg(per_user, ["event_type"],
                           [("v", "sum", "tv")])
    j = adaptive_join(per_user, per_type, on="event_type")

    def finish(t: pa.Table) -> pa.Table:
        uv = [round(x, 4) for x in t.column("v").to_pylist()]
        tv = [round(x, 4) for x in t.column("tv").to_pylist()]
        share = [None if b == 0 else round(a / b, 6)
                 for a, b in zip(uv, tv)]
        return pa.table({
            "event_type": t.column("event_type"),
            "user_id": t.column("user_id"),
            "user_value": pa.array(uv, pa.float64()),
            "type_value": pa.array(tv, pa.float64()),
            "share": pa.array(share, pa.float64())})

    return j.map_batches(finish, batch_format="pyarrow") \
        .sort(["event_type", "user_id"])


def events_near_pairs(sf_dir: str):
    """Temporal self-join: ordered pairs of SAME-user events of
    DIFFERENT types within one hour of each other -> (event_id_a,
    event_id_b, dt_us), a-before-b under (ts, event_id) order. The
    interaction-mining primitive (which actions co-occur in a session
    window?) and the one self-range-join shape the engine had not yet
    exercised: per-user bucketed exchange (whole users co-locate, the
    partitioned_analytics shape), then a vectorized two-pointer — one
    searchsorted over each user run's sorted timestamps, pairs emitted
    by repeat/arange, never an all-pairs product."""
    import numpy as np

    from easyner_ray.ops.relational import add_hash_bucket

    W_US = 3600 * 1_000_000

    ev = _rp(sf_dir, "events",
             columns=["user_id", "event_id", "event_type", "ts"])
    bucketed = ev.map_batches(
        lambda t: add_hash_bucket(t, ["user_id"], 32),
        batch_format="pyarrow")

    def kernel(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending"),
                                            ("event_id", "ascending")])
        t = t.take(idx)
        n = len(t)
        empty = pa.table({"event_id_a": pa.array([], pa.int64()),
                          "event_id_b": pa.array([], pa.int64()),
                          "dt_us": pa.array([], pa.int64())})
        if n < 2:
            return empty
        uid = np.asarray(t.column("user_id").combine_chunks(),
                         dtype=np.int64)
        tus = t.column("ts").cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        eid = np.asarray(t.column("event_id").combine_chunks(),
                         dtype=np.int64)
        etype = t.column("event_type").combine_chunks() \
            .dictionary_encode()
        ecode = np.asarray(etype.indices, dtype=np.int64)
        # per-user runs
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = uid[1:] != uid[:-1]
        run_id = np.cumsum(change) - 1
        # ts is sorted only WITHIN a user run — lift each run onto its
        # own disjoint key band (gap > W) so ONE global searchsorted
        # answers every run's window without cross-run leakage
        mn = tus.min()
        span = (tus.max() - mn) + W_US + 1
        key = run_id * span + (tus - mn)
        hi = np.searchsorted(key, key + W_US, side="right")
        cnt = np.maximum(hi - np.arange(n) - 1, 0)  # partners after i
        if cnt.sum() == 0:
            return empty
        a = np.repeat(np.arange(n), cnt)
        offs = np.arange(len(a)) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        b = a + 1 + offs
        keep = ecode[a] != ecode[b]
        a, b = a[keep], b[keep]
        return pa.table({
            "event_id_a": pa.array(eid[a], pa.int64()),
            "event_id_b": pa.array(eid[b], pa.int64()),
            "dt_us": pa.array(tus[b] - tus[a], pa.int64())})

    out = bucketed.groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow")
    return out.sort(["event_id_a", "event_id_b"])


def part_discount_slope(sf_dir: str):
    """Grouped OLS regression: per brand, the slope and intercept of
    quantity regressed on discount over that brand's lineitems (does
    discounting move volume?) -> (p_brand, n, slope, intercept). The
    regression-aggregate family (SQL regr_slope / regr_intercept) in
    its scale shape: the five sufficient statistics (n, Sx, Sy, Sxx,
    Sxy) accumulate as per-batch partials onto the |brand| keyspace,
    the closed form evaluates on the tiny final table with the
    Python-round grain."""
    import ray

    from easyner_ray.ops.relational import grouped_agg

    parts = _rp(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pm = pa.concat_tables(ray.get(parts.materialize().to_arrow_refs()))
    p_ref = ray.put((pm.column("p_partkey").combine_chunks(),
                     pm.column("p_brand").combine_chunks()))

    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keys, brands = ray.get(p_ref)
        idx = pc.index_in(t.column("l_partkey"), value_set=keys)
        brand = brands.take(idx.fill_null(0))
        x = t.column("l_discount")
        y = t.column("l_quantity")
        g = pa.table({
            "p_brand": brand,
            "n": pa.array(np.ones(len(t), np.int64)),
            "sx": x, "sy": y,
            "sxx": pc.multiply(x, x), "sxy": pc.multiply(x, y)}) \
            .group_by(["p_brand"]).aggregate(
                [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                 ("sxx", "sum"), ("sxy", "sum")])
        return g.rename_columns(["p_brand", "n", "sx", "sy", "sxx",
                                 "sxy"])

    agg = grouped_agg(li.map_batches(partial, batch_format="pyarrow"),
                      ["p_brand"],
                      [("n", "sum", "n"), ("sx", "sum", "sx"),
                       ("sy", "sum", "sy"), ("sxx", "sum", "sxx"),
                       ("sxy", "sum", "sxy")])

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_pylist()
        sx = t.column("sx").to_pylist()
        sy = t.column("sy").to_pylist()
        sxx = t.column("sxx").to_pylist()
        sxy = t.column("sxy").to_pylist()
        slope, icept = [], []
        for ni, a, b, aa, ab in zip(n, sx, sy, sxx, sxy):
            den = ni * aa - a * a
            if den == 0:
                slope.append(None)
                icept.append(None)
                continue
            m = (ni * ab - a * b) / den
            slope.append(round(m, 4))
            icept.append(round((b - m * a) / ni, 4))
        return pa.table({"p_brand": t.column("p_brand"),
                         "n": pa.array(n, pa.int64()),
                         "slope": pa.array(slope, pa.float64()),
                         "intercept": pa.array(icept, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow").sort("p_brand")


def part_discount_corr(sf_dir: str):
    """Grouped Pearson correlation: per brand, corr(l_discount,
    l_quantity) — the SQL corr() aggregate via the six sufficient
    statistics (adds Syy to the regression partials); NULL when either
    side is constant (DuckDB corr semantics) -> (p_brand, n, r)."""
    import math

    import ray

    from easyner_ray.ops.relational import grouped_agg

    parts = _rp(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pm = pa.concat_tables(ray.get(parts.materialize().to_arrow_refs()))
    p_ref = ray.put((pm.column("p_partkey").combine_chunks(),
                     pm.column("p_brand").combine_chunks()))

    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keys, brands = ray.get(p_ref)
        idx = pc.index_in(t.column("l_partkey"), value_set=keys)
        brand = brands.take(idx.fill_null(0))
        x = t.column("l_discount")
        y = t.column("l_quantity")
        g = pa.table({
            "p_brand": brand,
            "n": pa.array(np.ones(len(t), np.int64)),
            "sx": x, "sy": y,
            "sxx": pc.multiply(x, x), "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y)}) \
            .group_by(["p_brand"]).aggregate(
                [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                 ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        return g.rename_columns(["p_brand", "n", "sx", "sy", "sxx",
                                 "syy", "sxy"])

    agg = grouped_agg(li.map_batches(partial, batch_format="pyarrow"),
                      ["p_brand"],
                      [("n", "sum", "n"), ("sx", "sum", "sx"),
                       ("sy", "sum", "sy"), ("sxx", "sum", "sxx"),
                       ("syy", "sum", "syy"), ("sxy", "sum", "sxy")])

    def finish(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()  # |brands| rows
        r_out = []
        for r in rows:
            vx = r["n"] * r["sxx"] - r["sx"] * r["sx"]
            vy = r["n"] * r["syy"] - r["sy"] * r["sy"]
            if vx <= 0 or vy <= 0:
                r_out.append(None)
                continue
            cov = r["n"] * r["sxy"] - r["sx"] * r["sy"]
            r_out.append(round(cov / math.sqrt(vx * vy), 4))
        return pa.table({
            "p_brand": pa.array([r["p_brand"] for r in rows], pa.string()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "r": pa.array(r_out, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow").sort("p_brand")


def events_value_moments(sf_dir: str):
    """Higher-moment profile per event type: sample variance, skewness
    and excess kurtosis from the raw power sums (S1..S4 partials onto
    the |types| keyspace; both engines evaluate the SAME explicitly
    stated closed forms, so no builtin's private formula is involved)
    -> (event_type, n, mean, var_samp, skewness, kurtosis_excess),
    round-4. The shape-of-the-distribution monitor that catches value
    drift a mean/variance dashboard misses."""
    from easyner_ray.ops.relational import grouped_agg

    ev = _rp(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value")
        v2 = pc.multiply(v, v)
        g = pa.table({"event_type": t.column("event_type"),
                      "n": pa.array(np.ones(len(t), np.int64)),
                      "s1": v, "s2": v2,
                      "s3": pc.multiply(v2, v),
                      "s4": pc.multiply(v2, v2)}) \
            .group_by(["event_type"]).aggregate(
                [("n", "sum"), ("s1", "sum"), ("s2", "sum"),
                 ("s3", "sum"), ("s4", "sum")])
        return g.rename_columns(["event_type", "n", "s1", "s2", "s3",
                                 "s4"])

    agg = grouped_agg(ev.map_batches(partial, batch_format="pyarrow"),
                      ["event_type"],
                      [("n", "sum", "n"), ("s1", "sum", "s1"),
                       ("s2", "sum", "s2"), ("s3", "sum", "s3"),
                       ("s4", "sum", "s4")])

    def finish(t: pa.Table) -> pa.Table:
        import math

        rows = t.to_pylist()  # |types| rows
        out = {"event_type": [], "n": [], "mean": [], "var_samp": [],
               "skewness": [], "kurtosis_excess": []}
        for r in rows:
            n, s1, s2, s3, s4 = (r["n"], r["s1"], r["s2"], r["s3"],
                                 r["s4"])
            mu = s1 / n
            m2 = s2 / n - mu * mu
            # repeated multiplication, never pow(): the SQL oracle
            # states the same products, so both engines run identical
            # IEEE operation sequences on their (ulp-close) sums
            m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
            m4 = (s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n)
                  - 3 * mu * mu * mu * mu)
            out["event_type"].append(r["event_type"])
            out["n"].append(n)
            out["mean"].append(round(mu, 4))
            out["var_samp"].append(
                None if n < 2 else round(n * m2 / (n - 1), 4))
            out["skewness"].append(
                None if m2 <= 0
                else round(m3 / (m2 * math.sqrt(m2)), 4))
            out["kurtosis_excess"].append(
                None if m2 <= 0 else round(m4 / (m2 * m2) - 3.0, 4))
        return pa.table({
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "mean": pa.array(out["mean"], pa.float64()),
            "var_samp": pa.array(out["var_samp"], pa.float64()),
            "skewness": pa.array(out["skewness"], pa.float64()),
            "kurtosis_excess": pa.array(out["kurtosis_excess"],
                                        pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort("event_type")


def part_weighted_median_price(sf_dir: str):
    """Grouped WEIGHTED median: per brand, the smallest extended price
    whose cumulative quantity weight reaches half the brand's total
    (the robust 'typical price paid per unit' — an unweighted median
    over-represents small orders) -> (p_brand, w_median). Exact
    element-selection semantics (no interpolation), stated identically
    in SQL as a window-cumsum crossing. Engine: whole brands co-locate
    via the bucketed exchange; per brand one sort + cumsum + crossing
    scan, all numpy."""
    import ray

    from easyner_ray.ops.relational import add_hash_bucket

    parts = _rp(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pm = pa.concat_tables(ray.get(parts.materialize().to_arrow_refs()))
    p_ref = ray.put((pm.column("p_partkey").combine_chunks(),
                     pm.column("p_brand").combine_chunks()))

    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_extendedprice", "l_quantity"])

    def tag(t: pa.Table) -> pa.Table:
        keys, brands = ray.get(p_ref)
        idx = pc.index_in(t.column("l_partkey"), value_set=keys)
        out = pa.table({"p_brand": brands.take(idx.fill_null(0)),
                        "price": t.column("l_extendedprice"),
                        "qty": t.column("l_quantity")})
        return add_hash_bucket(out, ["p_brand"], 16)

    tagged = li.map_batches(tag, batch_format="pyarrow")

    def kernel(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("p_brand", "ascending"),
                                            ("price", "ascending")])
        t = t.take(idx)
        n = len(t)
        if n == 0:
            return pa.table({"p_brand": pa.array([], pa.string()),
                             "w_median": pa.array([], pa.float64())})
        brand = t.column("p_brand").combine_chunks()
        price = t.column("price").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        qty = t.column("qty").combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        enc = brand.dictionary_encode()
        code = np.asarray(enc.indices, dtype=np.int64)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = code[1:] != code[:-1]
        run_start = np.flatnonzero(change)
        run_id = np.cumsum(change) - 1
        cw = np.cumsum(qty)
        base = np.where(run_start > 0, cw[run_start - 1], 0.0)
        seg = cw - base[run_id]                     # per-group cum weight
        run_end = np.append(run_start[1:], n) - 1
        total = seg[run_end]                        # per-run totals
        half = 0.5 * total
        crossed = seg >= half[run_id]
        # first crossing per run (cand ascending -> first occurrence
        # per run id; the run's last row always crosses, so every run
        # resolves)
        cand = np.flatnonzero(crossed)
        runs_c, first_idx = np.unique(run_id[cand], return_index=True)
        first = np.empty(len(run_start), dtype=np.int64)
        first[runs_c] = cand[first_idx]
        out_brand = enc.dictionary.take(
            pa.array(code[run_start], pa.int64()))
        return pa.table({"p_brand": out_brand,
                         "w_median": pa.array(price[first], pa.float64())})

    out = tagged.groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow")
    return out.sort("p_brand")


def conv_reply_latency(sf_dir: str):
    """Reply-latency census by role transition: for every consecutive
    turn pair within a conversation, the seconds between them, rolled
    up per (prev_role, role) -> (prev_role, role, n, mean_latency_s,
    max_latency_s). The agent-ops timing dashboard (how long do tool
    calls take? how fast does the assistant answer?). One bucketed
    lag() exchange (the partitioned_analytics shape), integer-seconds
    floor on both engines, Python-round grain on the tiny final."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    tr = _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "role", "ts"])
    lagged = partitioned_analytics(tr, ["conv_id"], ["turn_idx"],
                                   [("lag", "role", "prev_role"),
                                    ("lag", "ts", "prev_ts")])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("prev_role")))
        dt = pc.divide(
            pc.subtract(t.column("ts").cast(pa.int64()),
                        t.column("prev_ts").cast(pa.int64())),
            pa.scalar(1_000_000, pa.int64()))  # floor int seconds
        g = pa.table({"prev_role": t.column("prev_role"),
                      "role": t.column("role"),
                      "n": pa.array(np.ones(len(t), np.int64)),
                      "s": dt, "mx": dt}) \
            .group_by(["prev_role", "role"]) \
            .aggregate([("n", "sum"), ("s", "sum"), ("mx", "max")])
        return g.rename_columns(["prev_role", "role", "n", "s", "mx"])

    agg = grouped_agg(lagged.map_batches(pairs, batch_format="pyarrow"),
                      ["prev_role", "role"],
                      [("n", "sum", "n"), ("s", "sum", "s"),
                       ("mx", "max", "max_latency_s")], final="tree")

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_pylist()
        s = t.column("s").to_pylist()
        return pa.table({
            "prev_role": t.column("prev_role"),
            "role": t.column("role"),
            "n": pa.array(n, pa.int64()),
            "mean_latency_s": pa.array(
                [round(a / b, 4) for a, b in zip(s, n)], pa.float64()),
            "max_latency_s": t.column("max_latency_s").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["prev_role", "role"])


def conv_context_overflow(sf_dir: str):
    """Context-budget audit: per conversation, total whitespace tokens,
    whether it overflows a 4096-token context, and the earliest turn
    that still fits when keeping the LAST turns (the standard SFT
    truncation: drop history, keep the recent window) ->
    (conv_id, total_tokens, overflow, keep_from_turn). keep_from_turn
    is the smallest turn_idx whose suffix (that turn through the end)
    totals <= 4096; a conversation within budget keeps everything. One
    bucketed suffix-cumsum exchange (cumsum over descending turn order
    via a negated order key), then a conversation-keyspace rollup."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    BUDGET = 4096
    tr = _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "text"])

    def tok(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column("text"),
                                     r"[^\s]+").cast(pa.int64())
        return pa.table({"conv_id": t.column("conv_id"),
                         "turn_idx": t.column("turn_idx").cast(pa.int64()),
                         "neg_idx": pc.negate(
                             t.column("turn_idx").cast(pa.int64())),
                         "n_tokens": n})

    base = tr.map_batches(tok, batch_format="pyarrow")
    # cumsum over neg_idx order == suffix sum over turn order
    suf = partitioned_analytics(base, ["conv_id"], ["neg_idx"],
                                [("cumsum", "n_tokens", "suffix")])

    def mark(t: pa.Table) -> pa.Table:
        s = t.column("suffix").cast(pa.int64())
        fits = pc.less_equal(s, BUDGET)
        # turn candidates that fit; non-fitting rows excluded from min
        keep = pc.if_else(fits, t.column("turn_idx"),
                          pa.scalar(None, pa.int64()))
        g = pa.table({"conv_id": t.column("conv_id"),
                      "tok": t.column("n_tokens"),
                      "cand": keep}) \
            .group_by(["conv_id"]) \
            .aggregate([("tok", "sum"), ("cand", "min")])
        return g.rename_columns(["conv_id", "tok", "cand"])

    agg = grouped_agg(suf.map_batches(mark, batch_format="pyarrow"),
                      ["conv_id"], [("tok", "sum", "total_tokens"),
                                    ("cand", "min", "keep_from_turn")])

    def finish(t: pa.Table) -> pa.Table:
        total = t.column("total_tokens").cast(pa.int64())
        over = pc.greater(total, BUDGET).cast(pa.int64())
        return pa.table({"conv_id": t.column("conv_id"),
                         "total_tokens": total,
                         "overflow": over,
                         "keep_from_turn": t.column("keep_from_turn")
                        .cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort("conv_id")


def orders_monthly_revenue_ma(sf_dir: str):
    """Monthly order revenue with a 3-month trailing moving average —
    the reporting query every finance dashboard runs: a tiny grouped
    rollup onto the |months| keyspace, then the ROWS-frame mean over
    the ordered month series (constant partition key; the series is
    months-sized, so the window work is trivial after the rollup) ->
    (month, revenue, ma3)."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    orders = _rp(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ym = pc.strftime(t.column("o_orderdate"), format="%Y-%m")
        g = pa.table({"month": ym, "r": t.column("o_totalprice")}) \
            .group_by(["month"]).aggregate([("r", "sum")])
        return g.rename_columns(["month", "r"])

    monthly = grouped_agg(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["month"], [("r", "sum", "r")], final="tree")
    keyed = monthly.map_batches(
        lambda t: _round4(pa.table({
            "month": t.column("month"),
            "revenue": t.column("r"),
            "one": pa.array(np.ones(len(t), np.int64))}), ["revenue"]),
        batch_format="pyarrow")
    ma = partitioned_analytics(keyed, ["one"], ["month"],
                               [("rolling_mean", "revenue:3", "ma")])
    return ma.map_batches(
        lambda t: _round4(pa.table({"month": t.column("month"),
                                    "revenue": t.column("revenue"),
                                    "ma3": t.column("ma")}), ["ma3"]),
        batch_format="pyarrow").sort("month")


def conv_tool_latency(sf_dir: str):
    """Per-tool turnaround: seconds from each tool-role turn to the
    NEXT turn in the conversation (how long the pipeline waited on
    that tool) -> (tool, n, mean_latency_s, max_latency_s). The
    lead() complement of conv_reply_latency, grouped by tool name —
    the agent-ops page for slow tools."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    tr = _transcripts_cols(sf_dir, ["conv_id", "turn_idx", "role",
                                    "tool", "ts"])
    led = partitioned_analytics(tr, ["conv_id"], ["turn_idx"],
                                [("lead", "ts", "next_ts")])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(
            pc.equal(t.column("role"), "tool"),
            pc.is_valid(t.column("tool"))),
            pc.is_valid(t.column("next_ts"))))
        dt = pc.divide(
            pc.subtract(t.column("next_ts").cast(pa.int64()),
                        t.column("ts").cast(pa.int64())),
            pa.scalar(1_000_000, pa.int64()))
        g = pa.table({"tool": t.column("tool"),
                      "n": pa.array(np.ones(len(t), np.int64)),
                      "s": dt, "mx": dt}) \
            .group_by(["tool"]) \
            .aggregate([("n", "sum"), ("s", "sum"), ("mx", "max")])
        return g.rename_columns(["tool", "n", "s", "mx"])

    agg = grouped_agg(led.map_batches(pairs, batch_format="pyarrow"),
                      ["tool"], [("n", "sum", "n"), ("s", "sum", "s"),
                                 ("mx", "max", "max_latency_s")],
                      final="tree")

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_pylist()
        s = t.column("s").to_pylist()
        return pa.table({
            "tool": t.column("tool"),
            "n": pa.array(n, pa.int64()),
            "mean_latency_s": pa.array(
                [round(a / b, 4) for a, b in zip(s, n)], pa.float64()),
            "max_latency_s": t.column("max_latency_s").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow").sort("tool")
