"""Train/eval n-gram decontamination — flag training documents that share
token n-grams with a benchmark/eval set (the GPT-3-style "13-gram
overlap" contamination audit, generalized to any n).

Spec (duplicated straight-line in ``sources.gold_derived.
write_contamination_gold`` — the gold is the spec's second, independent
realization):

* token = maximal ``[a-z0-9]+`` run of the lowercased text (the same
  token universe as TF-IDF / BM25);
* token hash = ``zlib.crc32`` of the utf-8 token;
* n-gram fingerprint = Horner polynomial over the n token hashes with
  base ``B = 1099511628211`` (the FNV-1a prime), mod 2^64, stored as the
  reinterpreted SIGNED int64 (parquet/SQL-comparable);
* a document's fingerprint set is DISTINCT (a repeated n-gram counts
  once);
* contamination(train doc) = |fps(doc) ∩ fps(benchmark corpus)|, and the
  report keeps only docs with at least one hit.

Scale shape: fingerprinting is map-only and vectorized — one whole-column
lower+split Arrow kernel, token hashing only over each batch's
DICTIONARY-ENCODED unique tokens (vocabulary-sized Python loop, not
token-count), the window combine is pure numpy uint64 arithmetic, and
per-doc distinctness completes inside the batch (a document is one row).
The intersection is :func:`~easyner_ray.ops.relational.adaptive_semi_join`
on the fingerprint column — broadcast ``pc.is_in`` while the benchmark
fingerprint set is small (the common case: eval sets are tiny next to the
corpus), Ray hash-shuffle semi join above the byte gate — followed by one
per-doc grouped count. Nothing corpus-sized ever reaches the driver.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NGRAM_BASE = np.uint64(1099511628211)  # FNV-1a 64-bit prime
SPLIT_RE = r"[^a-z0-9]+"

_FP_SCHEMA_COLS = ("fp",)


def _fp_schema(id_field: pa.Field) -> pa.Schema:
    return pa.schema([id_field, pa.field("fp", pa.int64())])


def _fingerprint_batch(t: pa.Table, *, n: int, id_col: str,
                       text_col: str) -> pa.Table:
    ids = t.column(id_col).combine_chunks()
    schema = _fp_schema(t.schema.field(id_col))
    text = t.column(text_col).combine_chunks()
    lists = pc.split_pattern_regex(
        pc.utf8_lower(pc.coalesce(text, "")), SPLIT_RE)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    if len(flat) == 0:
        return schema.empty_table()
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parent = parent[keep]
    if len(flat) < n:
        return schema.empty_table()

    # hash only the batch's UNIQUE tokens (vocab-sized loop), broadcast
    # back through the dictionary indices
    enc = flat.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    uniq_h = np.array([zlib.crc32(u.encode("utf-8")) for u in uniq],
                      dtype=np.uint64)
    tok_h = uniq_h[enc.indices.to_numpy(zero_copy_only=False)]

    # valid window starts: all n tokens inside one document
    starts = np.nonzero(parent[: len(parent) - n + 1]
                        == parent[n - 1:])[0]
    if len(starts) == 0:
        return schema.empty_table()
    h = np.zeros(len(starts), dtype=np.uint64)
    for k in range(n):  # Horner combine, n vector ops (n is small)
        h = h * NGRAM_BASE + tok_h[starts + k]

    out = pa.Table.from_arrays(
        [ids.take(pa.array(parent[starts])),
         pa.array(h.view(np.int64), pa.int64())],
        names=[id_col, "fp"])
    # distinct within the doc == globally distinct (doc lives on one row)
    g = out.group_by([id_col, "fp"]).aggregate([])
    return g.select([id_col, "fp"]).cast(schema)


def ngram_fingerprints(docs, *, n: int = 5, id_col: str = "doc_id",
                       text_col: str = "text", batch_size: int = 4096):
    """Documents -> DISTINCT (id, fp) token-n-gram fingerprint pairs."""
    return docs.map_batches(
        lambda t: _fingerprint_batch(t, n=n, id_col=id_col,
                                     text_col=text_col),
        batch_format="pyarrow", batch_size=batch_size)


def build_fp_index(benchmark, path: str, *, n: int = 5,
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """Persist the benchmark corpus' DISTINCT n-gram fingerprint set as
    partitioned Parquet (one ``fp`` int64 column + an ``n`` marker in the
    path) — build once, probe on every curation run (the same
    build-once/query-many split as ``similarity.build_ivf_index``)."""
    from easyner_ray.ops.relational import grouped_agg

    fps = grouped_agg(
        ngram_fingerprints(benchmark, n=n, id_col=id_col,
                           text_col=text_col),
        ["fp"], [("fp", "count", "__c")],
    ).select_columns(["fp"])
    fps.write_parquet(path)
    return path


def contamination(train, benchmark=None, *, n: int = 5,
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_bytes: int = 64 << 20,
                  benchmark_index: str | None = None):
    """-> (id, n_hits) for every TRAIN document sharing >= 1 token n-gram
    with the benchmark corpus; ``n_hits`` counts the doc's DISTINCT
    contaminated n-grams. Drop the flagged ids from the training set (or
    route them to review) to decontaminate.

    Pass EITHER ``benchmark`` (a documents Dataset — fingerprinted
    inline) or ``benchmark_index`` (a parquet path written by
    :func:`build_fp_index` with the SAME ``n`` — the repeated-run path:
    the eval set is fingerprinted once, every curation run just probes)."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_semi_join, grouped_agg

    if (benchmark is None) == (benchmark_index is None):
        raise ValueError("pass exactly one of benchmark / benchmark_index")

    train_fps = ngram_fingerprints(train, n=n, id_col=id_col,
                                   text_col=text_col)
    if benchmark_index is not None:
        bench_fps = rd.read_parquet(benchmark_index, columns=["fp"])
    else:
        bench_fps = ngram_fingerprints(
            benchmark, n=n, id_col=id_col,
            text_col=text_col).select_columns(["fp"])
    hits = adaptive_semi_join(train_fps, bench_fps, on="fp",
                              broadcast_bytes=broadcast_bytes)
    return grouped_agg(hits, [id_col], [("fp", "count", "n_hits")])


def embedding_decontam(corpus, eval_ds, *, threshold: float = 0.5,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       batch_size: int = 2048,
                       round_digits: int | None = 4):
    """Embedding-space decontamination — the semantic complement of the
    n-gram audit above: drop corpus vectors whose MAX cosine similarity
    to ANY held-out eval vector reaches ``threshold`` (paraphrased eval
    leakage that token n-grams miss; see e.g. the semantic-dedup /
    contamination discussion in SemDeDup, arXiv:2303.09540).

    Scale shape: the eval side is the SMALL side by construction — its
    (ids, L2-normalized matrix) pair is assembled once inside a Ray task
    from the dataset's own block refs (never on the driver) and broadcast
    via the object store; the corpus then streams map-only, each batch
    one ``(b, n_eval)`` numpy matmul + row max. No shuffle at all. Output:
    the SURVIVORS ``(id, max_eval_cos)`` with the max rounded for the
    cross-engine hash (Python round, oracle convention).
    """
    import ray

    from easyner_ray.ops.similarity import (_as_matrix, _assemble_matrix,
                                            _normalize)

    ev = eval_ds.select_columns([id_col, vec_col]).materialize()
    if ev.count() == 0:
        # zero-row Ray blocks are schema-less — short-circuit instead of
        # assembling an empty matrix: nothing can be contaminated.
        def passthrough(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column(id_col).combine_chunks(),
                 pa.array([0.0] * len(t), pa.float64())],
                names=[id_col, "max_eval_cos"])
        return corpus.map_batches(passthrough, batch_format="pyarrow",
                                  batch_size=batch_size)
    # _assemble_matrix keys on "vec_id"; rename-free reuse requires the
    # same id column, which both callers in this repo use.
    _ids_ref, mat_ref = _assemble_matrix.remote(vec_col, *ev.to_arrow_refs())

    def score(t: pa.Table) -> pa.Table:
        mat = ray.get(mat_ref)
        vecs = _normalize(_as_matrix(t.column(vec_col)))
        mx = (vecs @ mat.T).max(axis=1) if len(mat) else \
            np.zeros(len(t), dtype=np.float64)
        keep = mx < threshold
        ids = t.column(id_col).combine_chunks().filter(pa.array(keep))
        vals = mx[keep].tolist()
        if round_digits is not None:
            vals = [round(v, round_digits) for v in vals]
        return pa.Table.from_arrays(
            [ids, pa.array(vals, pa.float64())],
            names=[id_col, "max_eval_cos"])

    return corpus.map_batches(score, batch_format="pyarrow",
                              batch_size=batch_size)
