"""Deduplication operators over a documents table.

Four families, each chosen by what "duplicate" means and what scales:

  * :func:`exact_dedup` — identical text. Hash-partition on a text digest,
    keep the smallest doc_id per group. Two-phase: a vectorized per-batch
    ``pyarrow`` group_by collapses each batch first, so the shuffle moves one
    row per (digest, batch) — hot digests (a boilerplate page duplicated a
    million times) are bounded by batch count, not occurrence count.
  * :func:`ngram_jaccard_pairs` — EXACT n-gram Jaccard >= threshold.
    Complete candidate generation via an inverted index on shingles
    (a pair with Jaccard > 0 shares >= 1 shingle, so grouping by shingle and
    pairing within groups misses nothing); intersection sizes come out of a
    (doc_a, doc_b) count aggregate; union sizes ride along on the posting
    rows themselves (each posting carries its doc's shingle-set size).
    Integer outputs (inter, uni) so equality checks are exact.
    Partitioning assumption: one shingle's posting list fits in a task
    (``hot_cap`` drops stopword-like shingles the way search engines drop
    stopwords — documented, deterministic).
  * :func:`minhash_lsh_pairs` — approximate Jaccard at scale. 64 minhash
    permutations (vectorized numpy over crc32 shingle hashes) -> banded LSH
    bucket groupby -> candidate pairs -> similarity estimated from signature
    agreement. The scale path when the full inverted index is too wide.
  * :func:`simhash_pairs` — near-duplicate by Hamming distance over a
    64-bit SimHash; candidates via 4x16-bit band blocking (a pair within
    Hamming distance 3 must agree on >= 1 of 4 bands — pigeonhole).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- exact ----


def _partial_exact(batch: pa.Table, text_col: str) -> pa.Table:
    digest = pa.array(
        [hashlib.md5(t.encode()).hexdigest() if t is not None else ""
         for t in batch.column(text_col).to_pylist()],
        pa.string(),
    )
    t = pa.Table.from_arrays([digest, batch.column("doc_id")], names=["digest", "doc_id"])
    return t.group_by("digest").aggregate([("doc_id", "min"), ("doc_id", "count")]).rename_columns(
        ["digest", "doc_id_min", "n"]
    )


def exact_dedup(docs, text_col: str = "text", batch_size: int = 8192):
    """-> (doc_id, n_copies): the representative (min doc_id) of every
    distinct text plus how many copies existed.

    Texts group on their 128-bit md5 digest (collision odds are
    cryptographically negligible at any corpus size, and the hash cost is
    a rounding error next to reading the text). Final combine is the
    coarse-bucket Arrow path — digest cardinality ~= corpus size, far
    beyond Python-per-group.
    """
    from easyner_ray.ops.relational import bucketed_final

    partial = docs.map_batches(
        lambda b: _partial_exact(b, text_col), batch_format="pyarrow", batch_size=batch_size
    )
    agg = bucketed_final(partial, ["digest"],
                         pa_aggs=[("doc_id_min", "min"), ("n", "sum")],
                         out_names=["doc_id", "n_copies"])
    return agg.select_columns(["doc_id", "n_copies"])


def build_digest_index(docs, path: str, *, text_col: str = "text",
                       batch_size: int = 8192) -> str:
    """Persist the corpus' DISTINCT text digests as parquet — the
    snapshot side of incremental exact dedup: dedup every new crawl /
    shard against everything already kept WITHOUT rereading the kept
    corpus (the same build-once/probe-many split as
    ``decontam.build_fp_index``). One string column (digest)."""
    from easyner_ray.ops.relational import bucketed_final

    partial = docs.map_batches(
        lambda b: _partial_exact(b, text_col), batch_format="pyarrow",
        batch_size=batch_size)
    distinct = bucketed_final(partial, ["digest"], pa_aggs=[("n", "sum")],
                              out_names=["__n"]).select_columns(["digest"])
    distinct.write_parquet(path)
    # an empty corpus writes zero files; leave a typed empty shard so
    # read_parquet on the probe side still resolves schema + path
    import os

    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(path)):
        pq.write_table(pa.schema([("digest", pa.string())]).empty_table(),
                       os.path.join(path, "empty-0.parquet"))
    return path


def exact_dedup_incremental(docs, index_path: str, *,
                            text_col: str = "text",
                            batch_size: int = 8192):
    """Exact dedup of a NEW shard against a persisted digest snapshot
    (:func:`build_digest_index`): collapse the shard to per-digest
    representatives exactly like :func:`exact_dedup`, then drop every
    text already in the snapshot via an adaptive ANTI join on the digest
    (index broadcast under the byte gate, hash-shuffle above it).
    -> (doc_id, n_copies) for texts the snapshot has never seen."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_semi_join, bucketed_final

    partial = docs.map_batches(
        lambda b: _partial_exact(b, text_col), batch_format="pyarrow",
        batch_size=batch_size)
    agg = bucketed_final(partial, ["digest"],
                         pa_aggs=[("doc_id_min", "min"), ("n", "sum")],
                         out_names=["doc_id", "n_copies"])
    fresh = adaptive_semi_join(agg, rd.read_parquet(index_path),
                               on="digest", anti=True)
    return fresh.select_columns(["doc_id", "n_copies"])


def _keep_best_kernel(t: pa.Table, score_col: str, descending: bool,
                      count_col: str | None) -> pa.Table:
    """One vectorized pass over a (digest, doc_id, score[, n]) table:
    sort so each digest's best copy comes first, take run heads, and sum
    the run's copy counts (``count_col`` when re-combining partials, else
    the run length itself). No per-group Python."""
    if len(t) == 0:
        return pa.Table.from_arrays(
            [t.column("digest"), t.column("doc_id"), t.column(score_col),
             pa.array([], pa.int64())],
            names=["digest", "doc_id", score_col, "n"])
    order = "descending" if descending else "ascending"
    t = t.take(pc.sort_indices(t, sort_keys=[
        ("digest", "ascending"), (score_col, order), ("doc_id", "ascending")]))
    d = t.column("digest").combine_chunks()
    n = len(t)
    change = np.ones(n, dtype=bool)
    change[1:] = ~np.asarray(
        pc.equal(d.slice(1), d.slice(0, n - 1)).fill_null(False))
    run_start = np.flatnonzero(change)
    counts = (np.asarray(t.column(count_col)) if count_col
              else np.ones(n, dtype=np.int64))
    run_n = np.add.reduceat(counts, run_start)
    head = t.take(pa.array(run_start))
    return pa.Table.from_arrays(
        [head.column("digest"), head.column("doc_id"),
         head.column(score_col), pa.array(run_n, pa.int64())],
        names=["digest", "doc_id", score_col, "n"])


def dedup_keep_best(docs, score_col: str, *, text_col: str = "text",
                    descending: bool = True, n_buckets: int = 32,
                    batch_size: int = 8192):
    """Quality-aware exact dedup (the Dolma/FineWeb refinement of "keep
    min id"): one representative per distinct text — the copy with the
    BEST ``score_col`` (ties: min doc_id) — plus the copy count.
    -> (doc_id, <score_col>, n_copies).

    Same two-phase shape as :func:`exact_dedup` (shuffle moves one row
    per (digest, batch), hot texts bounded by batch count); the final is
    a digest-hash-bucketed re-run of the same argmax kernel, because the
    representative is an ARGMAX — not expressible as independent min/max
    aggregates over separate columns."""
    from easyner_ray.ops.relational import add_hash_bucket

    def partial(b: pa.Table) -> pa.Table:
        digest = pa.array(
            [hashlib.md5(s.encode()).hexdigest() if s is not None else ""
             for s in b.column(text_col).to_pylist()], pa.string())
        t = pa.Table.from_arrays(
            [digest, b.column("doc_id"), b.column(score_col)],
            names=["digest", "doc_id", score_col])
        return _keep_best_kernel(t, score_col, descending, None)

    partials = docs.map_batches(partial, batch_format="pyarrow",
                                batch_size=batch_size)
    bucketed = partials.map_batches(
        lambda t: add_hash_bucket(t, ["digest"], n_buckets),
        batch_format="pyarrow")
    final = bucketed.groupby("__bucket").map_groups(
        lambda t: _keep_best_kernel(t.drop(["__bucket"]), score_col,
                                    descending, "n"),
        batch_format="pyarrow")
    return final.map_batches(
        lambda t: t.drop(["digest"]).rename_columns(
            ["doc_id", score_col, "n_copies"]),
        batch_format="pyarrow")


# ------------------------------------------------------------- shingles ----


def shingle_set(text: str, k: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


def _shingle_rows(batch: pa.Table, k: int, text_col: str) -> pa.Table:
    """(doc_id, shingle, n_sh) posting rows; each posting carries its doc's
    TOTAL shingle-set size so union sizes ride along with the candidate
    pairs — no size lookup table, no join, no driver state."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column(text_col).to_pylist()
    o_doc, o_sh, o_n = [], [], []
    for d, t in zip(doc_ids, texts):
        sh = shingle_set(t or "", k)
        for s in sh:
            o_doc.append(d)
            o_sh.append(s)
            o_n.append(len(sh))
    return pa.Table.from_arrays(
        [pa.array(o_doc, pa.int64()), pa.array(o_sh, pa.string()),
         pa.array(o_n, pa.int64())],
        names=["doc_id", "shingle", "n_sh"],
    )


def _ngram_pair_counts(docs, k: int, text_col: str, hot_cap: int,
                       batch_size: int):
    """Shared candidate machinery of :func:`ngram_jaccard_pairs` and
    :func:`ngram_containment_pairs`: -> Dataset (doc_a, doc_b, inter,
    n_a, n_b) with the EXACT shingle-set intersection size and both
    set sizes for every pair sharing >= 1 sub-``hot_cap`` shingle
    (doc_a < doc_b); the caller applies its own score + threshold.

    ``hot_cap``: posting lists longer than this are dropped (a shingle
    shared by >hot_cap docs identifies nothing and would emit O(cap^2)
    pairs); exactness holds for every pair that shares at least one
    sub-cap shingle.
    """
    from easyner_ray.ops.relational import add_hash_bucket, bucketed_final

    shingles = docs.map_batches(
        lambda b: _shingle_rows(b, k, text_col), batch_format="pyarrow", batch_size=batch_size
    )

    # Pair generation: shuffle on a coarse hash bucket of the shingle (every
    # shingle's postings stay in one bucket), then inside each bucket one
    # fully vectorized Arrow/numpy kernel: dictionary-encode the shingles,
    # ONE lexsort groups the posting lists, group boundaries come from a
    # shifted compare, and the all-intra-group upper-triangle pairs from
    # pure repeat/arange index arithmetic (the sentence_triples device) —
    # no Python loop over shingle groups, no pandas round trip. Each pair
    # row carries both docs' shingle-set sizes (n_a, n_b) from the posting
    # rows themselves, so the union size needs no lookup downstream.
    _EMPTY_POST = pa.Table.from_arrays(
        [pa.array([], pa.int64())] * 4,
        names=["doc_a", "doc_b", "n_a", "n_b"])

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return _EMPTY_POST
        enc = pc.dictionary_encode(g.column("shingle").combine_chunks())
        codes = np.asarray(enc.indices, dtype=np.int64)
        ids = np.asarray(g.column("doc_id").combine_chunks(), dtype=np.int64)
        n_sh = np.asarray(g.column("n_sh").combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids, codes))
        c_s, i_s, n_s = codes[order], ids[order], n_sh[order]
        # shingle_set gives one posting per (doc, shingle); drop any stray
        # duplicates so they can't fabricate self-pairs
        dup = np.r_[False, (c_s[1:] == c_s[:-1]) & (i_s[1:] == i_s[:-1])]
        if dup.any():
            keep_rows = ~dup
            c_s, i_s, n_s = c_s[keep_rows], i_s[keep_rows], n_s[keep_rows]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        sizes = np.diff(np.r_[starts, len(c_s)])
        keep = (sizes >= 2) & (sizes <= hot_cap)
        if not keep.any():
            return _EMPTY_POST
        st, sz = starts[keep], sizes[keep]
        tot_e = int(sz.sum())
        e_local = np.arange(tot_e) - np.repeat(np.cumsum(sz) - sz, sz)
        e_glob = np.repeat(st, sz) + e_local
        reps = np.repeat(sz, sz) - 1 - e_local   # partners AFTER each elem
        pair_a = np.repeat(e_glob, reps)
        tot_p = int(reps.sum())
        if tot_p == 0:
            return _EMPTY_POST
        r = np.arange(tot_p) - np.repeat(np.cumsum(reps) - reps, reps)
        pair_b = pair_a + 1 + r                  # ids sorted in-group, so
        return pa.Table.from_arrays(             # doc_a < doc_b holds
            [pa.array(i_s[pair_a]), pa.array(i_s[pair_b]),
             pa.array(n_s[pair_a]), pa.array(n_s[pair_b])],
            names=["doc_a", "doc_b", "n_a", "n_b"])

    bucketed = shingles.map_batches(
        lambda t: add_hash_bucket(t, ["shingle"], 64), batch_format="pyarrow"
    )
    pair_hits = bucketed.groupby("__bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["doc_a", "doc_b"]).aggregate(
            [("doc_a", "count"), ("n_a", "min"), ("n_b", "min")]
        )
        return pa.Table.from_arrays(
            [g.column("doc_a"), g.column("doc_b"), g.column("doc_a_count").cast(pa.int64()),
             g.column("n_a_min"), g.column("n_b_min")],
            names=["doc_a", "doc_b", "n", "n_a", "n_b"],
        )

    return bucketed_final(
        # batch_size=None: an explicit coarse size here would fuse into
        # pairs_in_bucket and coalesce the per-bucket groups onto one task
        # (the measured fusion trap documented in stages/analysis.py)
        pair_hits.map_batches(count_partial, batch_format="pyarrow", batch_size=None),
        ["doc_a", "doc_b"],
        pa_aggs=[("n", "sum"), ("n_a", "min"), ("n_b", "min")],
        out_names=["inter", "n_a", "n_b"],
    )


def ngram_jaccard_pairs(
    docs,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    hot_cap: int = 2000,
    batch_size: int = 4096,
):
    """-> (doc_a, doc_b, inter, uni) for all pairs with exact shingle-set
    Jaccard inter/uni >= threshold (doc_a < doc_b). Integer outputs.
    Candidate generation + hot_cap contract: :func:`_ngram_pair_counts`."""
    inter = _ngram_pair_counts(docs, k, text_col, hot_cap, batch_size)

    def finish(b: pa.Table) -> pa.Table:
        uni = pc.subtract(pc.add(b.column("n_a"), b.column("n_b")), b.column("inter"))
        t = pa.Table.from_arrays(
            [b.column("doc_a"), b.column("doc_b"),
             b.column("inter").cast(pa.int64()), uni.cast(pa.int64())],
            names=["doc_a", "doc_b", "inter", "uni"],
        )
        keep = pc.greater_equal(
            pc.divide(t.column("inter").cast(pa.float64()), t.column("uni").cast(pa.float64())),
            threshold,
        )
        return t.filter(keep)

    return inter.map_batches(finish, batch_format="pyarrow")


def ngram_containment_pairs(
    docs,
    threshold: float = 0.8,
    k: int = 3,
    text_col: str = "text",
    hot_cap: int = 2000,
    batch_size: int = 4096,
):
    """Subset-copy detection — the asymmetric complement of
    :func:`ngram_jaccard_pairs`: pairs scored by SET CONTAINMENT
    ``inter / min(|A|, |B|)``, which stays high when one document is
    embedded inside a much larger one (quoted articles, concatenated
    crawls) while their Jaccard collapses toward |A|/|B|. -> (doc_a,
    doc_b, inter, n_a, n_b) for pairs with containment >= ``threshold``
    (doc_a < doc_b); integer outputs plus one IEEE division for the
    gate. Same candidate machinery, hot_cap contract and scale shape as
    the Jaccard op (:func:`_ngram_pair_counts`)."""
    inter = _ngram_pair_counts(docs, k, text_col, hot_cap, batch_size)

    def finish(b: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [b.column("doc_a"), b.column("doc_b"),
             b.column("inter").cast(pa.int64()),
             b.column("n_a").cast(pa.int64()),
             b.column("n_b").cast(pa.int64())],
            names=["doc_a", "doc_b", "inter", "n_a", "n_b"],
        )
        mn = pc.min_element_wise(t.column("n_a"), t.column("n_b"))
        keep = pc.greater_equal(
            pc.divide(t.column("inter").cast(pa.float64()),
                      mn.cast(pa.float64())),
            threshold,
        )
        return t.filter(keep)

    return inter.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------------------------- minhash ----

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(n_perm: int, seed: int = 17) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
    return a, b


def minhash_signature(shingles: list[str], a: np.ndarray, b: np.ndarray,
                      hashes: np.ndarray | None = None) -> np.ndarray:
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    h = (np.array([zlib.crc32(s.encode()) for s in shingles], dtype=np.uint64)
         if hashes is None else hashes)
    # (S, P) permuted hashes, min over shingles — all numpy
    perm = (h[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return perm.min(axis=0)


class MinHasher:
    """Actor: permutation params generated once; emits per-doc band keys."""

    def __init__(self, n_perm: int, n_bands: int, k: int, text_col: str, seed: int = 17):
        assert n_perm % n_bands == 0
        self.a, self.b = _perm_params(n_perm, seed)
        self.rows = n_perm // n_bands
        self.n_bands = n_bands
        self.k = k
        self.text_col = text_col
        # shingle -> crc32 cache: common trigrams repeat across documents,
        # and the crc32-of-encoded-string call is the per-shingle hot cost.
        # Bounded: cleared past 2M entries (~100MB worst case).
        self._h: dict[str, int] = {}

    def _hashes(self, shingles: list[str]) -> np.ndarray:
        cache = self._h
        if len(cache) > 2_000_000:
            cache.clear()
        out = np.empty(len(shingles), dtype=np.uint64)
        for i, s in enumerate(shingles):
            v = cache.get(s)
            if v is None:
                v = zlib.crc32(s.encode())
                cache[s] = v
            out[i] = v
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        n_docs = len(doc_ids)
        n_perm = len(self.a)
        sigs = np.empty((n_docs, n_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sh = shingle_set(t or "", self.k)
            sigs[i] = minhash_signature(sh, self.a, self.b, hashes=self._hashes(sh))
        # band key = (band_idx << 32) | crc32(band chunk bytes): same
        # collision sets as hashing the chunk to a string key, but int64
        # through the shuffle (cheaper to build, sort and group).
        band_keys = np.empty((n_docs, self.n_bands), dtype=np.int64)
        chunk_nbytes = self.rows * 8
        for i in range(n_docs):
            row = sigs[i].tobytes()
            for bi in range(self.n_bands):
                band_keys[i, bi] = (bi << 32) | zlib.crc32(
                    row[bi * chunk_nbytes : (bi + 1) * chunk_nbytes])
        # one row per (doc, band); the full signature rides along as
        # fixed-size binary so the pair stage reads it as a zero-copy matrix
        sig_col = pa.Array.from_buffers(
            pa.binary(n_perm * 8), n_docs * self.n_bands,
            [None, pa.py_buffer(np.repeat(sigs, self.n_bands, axis=0).tobytes())],
        )
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(np.asarray(doc_ids, dtype=np.int64), self.n_bands)),
                pa.array(band_keys.reshape(-1)),
                sig_col,
            ],
            names=["doc_id", "band_key", "sig"],
        )


def minhash_lsh_pairs(
    docs,
    threshold: float = 0.5,
    n_perm: int = 64,
    n_bands: int = 16,
    k: int = 3,
    text_col: str = "text",
    hot_cap: int = 500,
    batch_size: int = 1024,
):
    """-> (doc_a, doc_b, est_jaccard) candidate near-dup pairs.

    Banded LSH: docs agreeing on any band become candidates; similarity is
    the signature-agreement fraction (unbiased Jaccard estimator). Groups
    larger than ``hot_cap`` are dropped (hot-bucket guard, same contract as
    ngram_jaccard_pairs).
    """
    from easyner_ray.ops.relational import bucketed_final

    # task pool with per-worker cached MinHasher (state is a deterministic
    # function of the params, ~1ms to build): actor-pool creation latency
    # alone (~2s) exceeds the whole signature pass at bench scale — the
    # measured pattern from pipelines/kg._kg_partials_fn.
    from easyner_ray.ops.similarity import _cached_state

    mh_key = ("minhash", n_perm, n_bands, k, text_col)

    def mh_fn(batch: pa.Table) -> pa.Table:
        return _cached_state(
            mh_key,
            lambda: MinHasher(n_perm=n_perm, n_bands=n_bands, k=k,
                              text_col=text_col),
        )(batch)

    bands = docs.map_batches(
        mh_fn, batch_format="pyarrow", batch_size=batch_size
    )

    # Coarse-bucket the band keys (a band's collisions stay in one bucket),
    # then inside each bucket: lexsort on (band_key, doc_id), vectorized
    # group-boundary detection, and a batched signature-agreement compare
    # for the dominant size-2 collision groups. The signature column is
    # fixed-size binary, so the whole matrix is one zero-copy reshape.
    _EMPTY = pa.Table.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.int64()),
         pa.array([], pa.float64())],
        names=["doc_a", "doc_b", "est_jaccard"])

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return _EMPTY
        band = np.asarray(g.column("band_key").combine_chunks())
        ids = np.asarray(g.column("doc_id").combine_chunks())
        order = np.lexsort((ids, band))
        band_s, ids_s = band[order], ids[order]
        starts = np.flatnonzero(np.r_[True, band_s[1:] != band_s[:-1]])
        sizes = np.diff(np.r_[starts, len(band_s)])
        keep = (sizes >= 2) & (sizes <= hot_cap)
        if not keep.any():
            return _EMPTY
        sig_arr = g.column("sig").combine_chunks()
        n_perm = sig_arr.type.byte_width // 8
        flat = np.frombuffer(sig_arr.buffers()[1], dtype=np.uint64)
        mat = flat[sig_arr.offset * n_perm
                   : (sig_arr.offset + len(sig_arr)) * n_perm]
        mat = mat.reshape(len(sig_arr), n_perm)[order]
        a_parts, b_parts, j_parts = [], [], []
        s2 = starts[keep & (sizes == 2)]
        if len(s2):
            est2 = (mat[s2] == mat[s2 + 1]).mean(axis=1)
            sel = est2 >= threshold
            a_parts.append(ids_s[s2[sel]])
            b_parts.append(ids_s[s2[sel] + 1])
            j_parts.append(est2[sel])
        big = keep & (sizes > 2)
        for st, sz in zip(starts[big], sizes[big]):
            sub_ids = ids_s[st : st + sz]
            sub = mat[st : st + sz]
            for i in range(sz - 1):
                est = (sub[i + 1 :] == sub[i]).mean(axis=1)
                sel = np.nonzero(est >= threshold)[0]
                if len(sel):
                    a_parts.append(np.full(len(sel), sub_ids[i], dtype=np.int64))
                    b_parts.append(sub_ids[i + 1 + sel])
                    j_parts.append(est[sel])
        if not a_parts:
            return _EMPTY
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(a_parts).astype(np.int64)),
             pa.array(np.concatenate(b_parts).astype(np.int64)),
             pa.array(np.concatenate(j_parts).astype(np.float64))],
            names=["doc_a", "doc_b", "est_jaccard"])

    # int band keys bucket via vectorized splitmix64 (no per-distinct
    # Python crc32 — band keys are nearly all distinct, so the generic
    # dictionary-encode path in add_hash_bucket would run per row)
    def add_bucket(t: pa.Table) -> pa.Table:
        from easyner_ray.ops.sketch import splitmix64

        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        if len(t) == 0:
            return t.append_column("__bucket", pa.array([], pa.int32()))
        bk = np.asarray(t.column("band_key").combine_chunks()).view(np.uint64)
        b = (splitmix64(bk) % np.uint64(64)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    bucketed = bands.map_batches(add_bucket, batch_format="pyarrow")
    cand = bucketed.groupby("__bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")
    # a pair can collide in several bands — dedupe keeping max estimate
    return bucketed_final(cand, ["doc_a", "doc_b"],
                          pa_aggs=[("est_jaccard", "max")], out_names=["est_jaccard"])


# ----------------------------------------- duplicated-span removal ----

# Exact substring-level dedup (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better"): instead of dropping whole
# documents, REMOVE every token covered by a length-``window`` token
# span that occurs >= 2 times anywhere in the corpus. Spec (mirrored
# straight-line by sources.gold_derived.write_dup_span_gold):
#   tokens    = maximal non-whitespace runs (original case kept);
#   token hash = zlib.crc32(token utf8);
#   window fp = Horner polynomial over the ``window`` hashes, base the
#               FNV-1a prime, mod 2^64 (signed-int64 reinterpreted);
#   duplicated = fp occurs >= 2 times corpus-wide (same-doc repeats
#               count);
#   output text = tokens not covered by any duplicated window, joined
#               by a single space (whitespace is normalized for ALL
#               docs — the rewrite is deterministic, not best-effort).

_SPAN_BASE = np.uint64(1099511628211)


def _window_fp_batch(t: pa.Table, *, window: int, id_col: str,
                     text_col: str) -> pa.Table:
    """-> (id, pos, fp): one row per token window, pos doc-local."""
    schema = pa.schema([t.schema.field(id_col), ("pos", pa.int64()),
                        ("fp", pa.int64())])
    ids = t.column(id_col).combine_chunks()
    lists = pc.utf8_split_whitespace(
        pc.coalesce(t.column(text_col).combine_chunks(), ""))
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    if len(flat) == 0:
        return schema.empty_table()
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    n = len(parent)
    if n < window:
        return schema.empty_table()

    counts = np.bincount(parent, minlength=len(ids))
    docstart = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(n, dtype=np.int64) - docstart[parent]

    enc = flat.dictionary_encode()
    uniq_h = np.array([zlib.crc32(u.encode("utf-8"))
                       for u in enc.dictionary.to_pylist()], dtype=np.uint64)
    tok_h = uniq_h[enc.indices.to_numpy(zero_copy_only=False)]

    m = n - window + 1
    starts = np.nonzero(parent[:m] == parent[window - 1:])[0]
    if len(starts) == 0:
        return schema.empty_table()
    h = np.zeros(len(starts), dtype=np.uint64)
    for k in range(window):
        h = h * _SPAN_BASE + tok_h[starts + k]
    return pa.Table.from_arrays(
        [ids.take(pa.array(parent[starts])),
         pa.array(pos[starts], pa.int64()),
         pa.array(h.view(np.int64), pa.int64())],
        names=[id_col, "pos", "fp"]).cast(schema)


def dup_span_removal(docs, window: int = 25, *, id_col: str = "doc_id",
                     text_col: str = "text", batch_size: int = 4096):
    """-> (id, text_clean, n_removed): corpus with every duplicated
    ``window``-token span cut out of every document.

    Shape at scale: fingerprinting is map-only vectorized (two passes,
    one for the count, one riding the semi join); the duplicated-fp set
    comes from a two-phase bucketed count (partial per batch, bucketed
    Arrow final — fp cardinality ~ corpus token count); the hit lookup
    is an adaptive semi join (duplicated spans are the rare case, so the
    dup set usually broadcasts); the rewrite is one whole-batch numpy
    coverage pass + ``pc.binary_join``. The docs stream is materialized
    once (two consumers: fingerprint pass and join left side)."""
    import ray.data as rd

    from easyner_ray.ops.relational import (adaptive_join,
                                            adaptive_semi_join,
                                            base_schema, bucketed_final)

    docs = docs.materialize()
    dbase = base_schema(docs)
    if dbase is None:  # provably-empty typeless corpus -> typed empty
        return rd.from_arrow(pa.schema(
            [(id_col, pa.int64()), ("text_clean", pa.string()),
             ("n_removed", pa.int64())]).empty_table())
    wins = docs.map_batches(
        lambda t: _window_fp_batch(t, window=window, id_col=id_col,
                                   text_col=text_col),
        batch_format="pyarrow", batch_size=batch_size)

    def partial_count(t: pa.Table) -> pa.Table:
        g = t.group_by(["fp"]).aggregate([("fp", "count")])
        return g.rename_columns(["fp", "c"])

    cnt = bucketed_final(
        wins.select_columns(["fp"]).map_batches(partial_count,
                                                batch_format="pyarrow"),
        ["fp"], pa_aggs=[("c", "sum")], out_names=["c"])
    dup = cnt.filter(expr="c >= 2").select_columns(["fp"])

    hits = adaptive_semi_join(wins, dup, on="fp") \
        .select_columns([id_col, "pos"])

    def collect_positions(g: pa.Table) -> pa.Table:
        # comma-joined string, not list<int64>: pyarrow's hash join
        # (both adaptive_join paths) rejects nested payload columns
        p = np.sort(g.column("pos").combine_chunks().to_numpy(
            zero_copy_only=False))
        return pa.Table.from_arrays(
            [g.column(id_col).slice(0, 1),
             pa.array([",".join(map(str, p))], pa.string())],
            names=[id_col, "__dup_pos"])

    pos_lists = hits.groupby(id_col).map_groups(collect_positions,
                                                batch_format="pyarrow")
    # typed empty anchor: a dup-free corpus leaves pos_lists with ZERO
    # blocks (schema lost — relational.base_schema), and the left join
    # would then degrade to docs-unchanged, dropping the __dup_pos
    # column the rewrite kernel reads
    anchor = pa.schema([(id_col, dbase.field(id_col).type),
                        ("__dup_pos", pa.string())])
    pos_lists = pos_lists.union(rd.from_arrow(anchor.empty_table()))
    joined = adaptive_join(docs, pos_lists, on=id_col, how="left")

    def rewrite(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks()
        ndocs = len(ids)
        lists = pc.utf8_split_whitespace(
            pc.coalesce(t.column(text_col).combine_chunks(), ""))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(keep)), parent[keep]
        n = len(parent)
        counts = np.bincount(parent, minlength=ndocs)
        docstart = np.concatenate([[0], np.cumsum(counts)[:-1]])

        pos_col = pc.split_pattern(
            pc.coalesce(t.column("__dup_pos").combine_chunks(), ""), ",")
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        pflat_s = pc.list_flatten(pos_col)
        pparent = pc.list_parent_indices(pos_col).to_numpy(
            zero_copy_only=False)
        nonempty = pc.not_equal(pflat_s, "").to_numpy(zero_copy_only=False)
        pflat = pc.cast(pflat_s.filter(pa.array(nonempty)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        pparent = pparent[nonempty]
        covered = np.zeros(n, dtype=bool)
        if len(pflat):
            diff = np.zeros(n + window + 1, dtype=np.int64)
            gstart = docstart[pparent] + pflat
            np.add.at(diff, gstart, 1)
            np.add.at(diff, gstart + window, -1)
            covered = np.cumsum(diff[:n]) > 0
        kept = flat.filter(pa.array(~covered))
        kept_counts = np.bincount(parent[~covered], minlength=ndocs)
        offsets = np.concatenate([[0], np.cumsum(kept_counts)]) \
            .astype(np.int32)
        kept_lists = pa.ListArray.from_arrays(pa.array(offsets,
                                                       pa.int32()), kept)
        clean = pc.binary_join(kept_lists, " ")
        removed = np.bincount(parent[covered], minlength=ndocs) \
            if covered.any() else np.zeros(ndocs, dtype=np.int64)
        return pa.Table.from_arrays(
            [ids, clean, pa.array(removed.astype(np.int64), pa.int64())],
            names=[id_col, "text_clean", "n_removed"])

    return joined.map_batches(rewrite, batch_format="pyarrow",
                              batch_size=batch_size)


# ------------------------------------------------ incremental MinHash ----


def _sig_matrix(sig_arr: pa.Array) -> np.ndarray:
    """(n, n_perm) uint64 view of a fixed-size-binary signature column."""
    if isinstance(sig_arr, pa.ChunkedArray):
        sig_arr = sig_arr.combine_chunks()
    n_perm = sig_arr.type.byte_width // 8
    flat = np.frombuffer(sig_arr.buffers()[1], dtype=np.uint64)
    return flat[sig_arr.offset * n_perm
                : (sig_arr.offset + len(sig_arr)) * n_perm] \
        .reshape(len(sig_arr), n_perm)


def _minhash_band_rows(docs, *, n_perm, n_bands, k, text_col, n_buckets,
                       batch_size):
    """docs -> (doc_id, band_key, sig, bucket) rows: the MinHasher's
    per-band output plus the splitmix64 band-key bucket used as the
    index's storage partition / the probe's shuffle key."""
    from easyner_ray.ops.sketch import splitmix64
    from easyner_ray.ops.similarity import _cached_state

    mh_key = ("minhash", n_perm, n_bands, k, text_col)

    def fn(batch: pa.Table) -> pa.Table:
        t = _cached_state(
            mh_key, lambda: MinHasher(n_perm=n_perm, n_bands=n_bands, k=k,
                                      text_col=text_col))(batch)
        if len(t) == 0:
            return t.append_column("bucket", pa.array([], pa.int32()))
        bk = np.asarray(t.column("band_key").combine_chunks()).view(np.uint64)
        b = (splitmix64(bk) % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def build_minhash_index(docs, out_dir: str, *, n_perm: int = 64,
                        n_bands: int = 16, k: int = 3,
                        text_col: str = "text", n_buckets: int = 64,
                        batch_size: int = 1024) -> str:
    """Persist the kept corpus' MinHash band rows as BUCKET-PARTITIONED
    Parquet (``out_dir/bucket=<b>/``) plus a params manifest — the
    near-dup analog of :func:`build_digest_index` / the IVF index: sign
    the kept corpus ONCE, then every new crawl probes only the bucket
    partitions its own band keys land in (pruning at the read; the kept
    corpus is never re-signed and never shuffled again)."""
    import json
    import os

    rows = _minhash_band_rows(docs, n_perm=n_perm, n_bands=n_bands, k=k,
                              text_col=text_col, n_buckets=n_buckets,
                              batch_size=batch_size)
    os.makedirs(out_dir, exist_ok=True)
    rows.write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, "minhash_meta.json"), "w") as f:
        json.dump({"n_perm": n_perm, "n_bands": n_bands, "k": k,
                   "n_buckets": n_buckets}, f)
    return out_dir


def minhash_lsh_incremental(new_docs, index_dir: str, *,
                            threshold: float = 0.5, hot_cap: int = 500,
                            text_col: str = "text", batch_size: int = 1024):
    """Near-dup candidates of a NEW shard against a
    :func:`build_minhash_index` snapshot -> (doc_new, doc_old,
    est_jaccard), est >= threshold, max-deduped across bands.

    Only the new shard is signed and shuffled (groupby its band-key
    bucket); each group task reads exactly its own ``bucket=<b>``
    partition of the index and matches band keys by binary search, with
    the signature-agreement compare one vectorized gather. Snapshot
    posting lists longer than ``hot_cap`` within a band bucket are
    dropped (same stopword-shingle contract as
    :func:`minhash_lsh_pairs`)."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq_mod

    from easyner_ray.ops.relational import bucketed_final

    with open(os.path.join(index_dir, "minhash_meta.json")) as f:
        meta = json.load(f)

    rows = _minhash_band_rows(
        new_docs, n_perm=meta["n_perm"], n_bands=meta["n_bands"],
        k=meta["k"], text_col=text_col, n_buckets=meta["n_buckets"],
        batch_size=batch_size)

    _EMPTY = pa.Table.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.int64()),
         pa.array([], pa.float64())],
        names=["doc_new", "doc_old", "est_jaccard"])

    def probe_bucket(g: pa.Table) -> pa.Table:
        b = g.column("bucket")[0].as_py()
        files = sorted(glob.glob(os.path.join(index_dir, f"bucket={b}",
                                              "*.parquet")))
        if not files:
            return _EMPTY
        old = pa.concat_tables([pq_mod.read_table(
            p, columns=["doc_id", "band_key", "sig"]) for p in files])
        if len(old) == 0:
            return _EMPTY
        old_bk = np.asarray(old.column("band_key").combine_chunks())
        o = np.argsort(old_bk, kind="stable")
        old_bk = old_bk[o]
        old_ids = np.asarray(old.column("doc_id").combine_chunks())[o]
        old_sig = _sig_matrix(old.column("sig"))[o]

        new_bk = np.asarray(g.column("band_key").combine_chunks())
        new_ids = np.asarray(g.column("doc_id").combine_chunks())
        new_sig = _sig_matrix(g.column("sig"))
        lo = np.searchsorted(old_bk, new_bk, side="left")
        hi = np.searchsorted(old_bk, new_bk, side="right")
        cnt = hi - lo
        cnt[cnt > hot_cap] = 0                      # hot-posting guard
        total = int(cnt.sum())
        if total == 0:
            return _EMPTY
        new_idx = np.repeat(np.arange(len(new_bk)), cnt)
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        old_idx = (np.arange(total) - np.repeat(starts, cnt)
                   + np.repeat(lo, cnt))
        est = (new_sig[new_idx] == old_sig[old_idx]).mean(axis=1)
        sel = est >= threshold
        if not sel.any():
            return _EMPTY
        return pa.Table.from_arrays(
            [pa.array(new_ids[new_idx[sel]].astype(np.int64)),
             pa.array(old_ids[old_idx[sel]].astype(np.int64)),
             pa.array(est[sel].astype(np.float64))],
            names=["doc_new", "doc_old", "est_jaccard"])

    cand = rows.groupby("bucket").map_groups(probe_bucket,
                                             batch_format="pyarrow")
    return bucketed_final(cand, ["doc_new", "doc_old"],
                          pa_aggs=[("est_jaccard", "max")],
                          out_names=["est_jaccard"])


# -------------------------------------------------------------- simhash ----

# 8-bit popcount LUT: vectorized Hamming distance over uint64 arrays by
# viewing them as uint8 and summing per-byte popcounts.
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POPCOUNT8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1).astype(np.int64)


def simhash64(tokens: list[str]) -> int:
    if not tokens:
        return 0
    uniq, counts = np.unique(np.array(tokens), return_counts=True)
    h1 = np.array([zlib.crc32(t.encode()) for t in uniq], dtype=np.uint64)
    h2 = np.array([zlib.crc32((t + "\x00").encode()) for t in uniq], dtype=np.uint64)
    h = (h1 << np.uint64(32)) | h2
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def _simhash_batch(batch: pa.Table, text_col: str) -> pa.Table:
    """4 posting rows per doc (one per 16-bit band); the full signature
    rides along as a uint64 column for the in-bucket Hamming check."""
    ids = batch.column("doc_id").combine_chunks().cast(pa.int64())
    hs = np.array([simhash64((t or "").split())
                   for t in batch.column(text_col).to_pylist()],
                  dtype=np.uint64)
    n = len(hs)
    h4 = np.repeat(hs, 4)
    bi = np.tile(np.arange(4, dtype=np.uint64), n)
    band = (bi << np.uint64(16)) | ((h4 >> (bi * np.uint64(16)))
                                    & np.uint64(0xFFFF))
    return pa.Table.from_arrays(
        [
            ids.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))),
            pa.array(band.astype(np.int64), pa.int64()),
            pa.array(h4, pa.uint64()),
        ],
        names=["doc_id", "band_key", "simhash"],
    )


def simhash_pairs(docs, max_hamming: int = 3, text_col: str = "text",
                  hot_cap: int = 500, batch_size: int = 4096):
    """-> (doc_a, doc_b, hamming) pairs with SimHash Hamming distance <=
    ``max_hamming`` (requires max_hamming <= 3 for the 4-band blocking to be
    complete by pigeonhole)."""
    from easyner_ray.ops.relational import add_hash_bucket, bucketed_final

    assert max_hamming <= 3, "4-band blocking is complete only for distance <= 3"
    bands = docs.map_batches(
        lambda b: _simhash_batch(b, text_col), batch_format="pyarrow", batch_size=batch_size
    )

    # One vectorized Arrow/numpy kernel per bucket (same shape as the
    # jaccard kernel): lexsort on (band_key, doc_id), boundary detect,
    # expand every band-collision group into its upper-triangle pairs via
    # index arithmetic, then ONE batched popcount over all pairs' XOR.
    _EMPTY_SH = pa.Table.from_arrays(
        [pa.array([], pa.int64())] * 3,
        names=["doc_a", "doc_b", "hamming"])

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return _EMPTY_SH
        band = np.asarray(g.column("band_key").combine_chunks(),
                          dtype=np.int64)
        ids = np.asarray(g.column("doc_id").combine_chunks(), dtype=np.int64)
        hs = np.asarray(g.column("simhash").combine_chunks(), dtype=np.uint64)
        order = np.lexsort((ids, band))
        b_s, i_s, h_s = band[order], ids[order], hs[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        sizes = np.diff(np.r_[starts, len(b_s)])
        keep = (sizes >= 2) & (sizes <= hot_cap)
        if not keep.any():
            return _EMPTY_SH
        st, sz = starts[keep], sizes[keep]
        tot_e = int(sz.sum())
        e_local = np.arange(tot_e) - np.repeat(np.cumsum(sz) - sz, sz)
        e_glob = np.repeat(st, sz) + e_local
        reps = np.repeat(sz, sz) - 1 - e_local
        pair_a = np.repeat(e_glob, reps)
        tot_p = int(reps.sum())
        if tot_p == 0:
            return _EMPTY_SH
        r = np.arange(tot_p) - np.repeat(np.cumsum(reps) - reps, reps)
        pair_b = pair_a + 1 + r
        d = _popcount64(h_s[pair_a] ^ h_s[pair_b])
        sel = d <= max_hamming
        if not sel.any():
            return _EMPTY_SH
        return pa.Table.from_arrays(
            [pa.array(i_s[pair_a[sel]]), pa.array(i_s[pair_b[sel]]),
             pa.array(d[sel])],
            names=["doc_a", "doc_b", "hamming"])

    bucketed = bands.map_batches(
        lambda t: add_hash_bucket(t, ["band_key"], 64), batch_format="pyarrow"
    )
    cand = bucketed.groupby("__bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")
    return bucketed_final(cand, ["doc_a", "doc_b"],
                          pa_aggs=[("hamming", "min")], out_names=["hamming"])


# ------------------------------------------------------- dup group closure --


def dup_groups(pairs, max_iters: int = 25, n_buckets: int = 64,
               small_edge_cutoff: int = 2_000_000):
    """Connected components over a near-duplicate pair list: ->
    (doc_id, group_id). Ids may be integers (doc ids; normalized to
    int64) or strings (entity names via ``ops.fuzzy.alias_clusters``;
    "smallest" is then lexicographic). ``group_id`` is the smallest id reachable
    through any chain of pairs — the canonical representative each
    duplicate cluster keeps (A~B, B~C => A,B,C all collapse to min id,
    even though A,C were never directly compared).

    Distributed iterative min-label propagation, all Dataset ops: labels
    start as each doc's own id; each round joins the symmetric edge list
    against current labels (bucketed equi-join) and takes the per-doc min
    of (own label, neighbours' labels); converges in O(component diameter)
    rounds — near-dup clusters are shallow, so a handful. The driver holds
    only the convergence counter, never the labels. ``max_iters`` bounds
    pathological chains (a 10^7-long path is not a dup cluster).

    Pair lists up to ``small_edge_cutoff`` rows (the COUNTED edge list, a
    bounded dedup output — not the corpus) short-circuit to a single-pass
    union-find on the driver: O(pairs) with path compression beats several
    distributed rounds of fixed scheduling latency by orders of magnitude
    at that size. Set the cutoff to 0 to force the distributed path.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from easyner_ray.ops.relational import add_hash_bucket, bucketed_final

    # id dtype: int ids normalize to int64; string ids (fuzzy alias names)
    # pass through — every step below (union-find min, grouped min-label,
    # the label-in-dst-slot join) is ordering-based and works on both.
    # A fully-empty pairs dataset can report schema() is None (no blocks
    # carry type info); int64 is the right degenerate label dtype there —
    # the n_edges == 0 short-circuit below returns before any cast matters.
    sch = pairs.schema()
    in_type = (sch.base_schema.field("doc_a").type
               if sch is not None and "doc_a" in sch.names else pa.int64())
    dt = in_type if pa.types.is_string(in_type) or pa.types.is_large_string(
        in_type) else pa.int64()

    # symmetric edges (a->b and b->a) so min labels flow both ways
    def sym(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([t.column("doc_a").cast(dt).combine_chunks(),
                                  t.column("doc_b").cast(dt).combine_chunks()]),
                pa.concat_arrays([t.column("doc_b").cast(dt).combine_chunks(),
                                  t.column("doc_a").cast(dt).combine_chunks()]),
            ],
            names=["src", "dst"],
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as rd

        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], dt), pa.array([], dt)],
            names=["doc_id", "group_id"],
        ))
    if small_edge_cutoff and n_edges <= small_edge_cutoff:
        import ray as _ray
        import ray.data as rd

        tbl = pa.concat_tables([_ray.get(r) for r in edges.to_arrow_refs()])
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(tbl.column("src").to_pylist(), tbl.column("dst").to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the group representative
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
            parent.setdefault(a, find(a))
            parent.setdefault(b, find(b))
        docs = sorted({*tbl.column("src").to_pylist()})
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array(docs, dt),
             pa.array([find(d) for d in docs], dt)],
            names=["doc_id", "group_id"],
        ))

    # initial labels: every doc in the edge list labels itself
    def init_labels(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("src"), t.column("src")], names=["doc_id", "label"]
        )

    labels = bucketed_final(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        ["doc_id"], pa_aggs=[("label", "min")], out_names=["label"],
        n_buckets=n_buckets,
    ).materialize()

    for _ in range(max_iters):
        # join edges to labels on src (bucketed): each edge proposes its
        # src's label to its dst; then per-doc min over proposals + own
        def e_side(t: pa.Table) -> pa.Table:
            out = t.select(["src", "dst"])
            return out.append_column("__side", pa.array([0] * len(out), pa.int8()))

        def l_side(t: pa.Table) -> pa.Table:
            out = pa.Table.from_arrays(
                [t.column("doc_id"), pa.nulls(len(t), dt),
                 ], names=["src", "dst"])
            out = out.set_column(1, "dst", t.column("label"))  # carry label in dst slot
            return out.append_column("__side", pa.array([1] * len(out), pa.int8()))

        tagged = edges.map_batches(e_side, batch_format="pyarrow").union(
            labels.map_batches(l_side, batch_format="pyarrow")
        ).map_batches(lambda t: add_hash_bucket(t, ["src"], n_buckets),
                      batch_format="pyarrow")

        def propose(t: pa.Table) -> pa.Table:
            e = t.filter(pc.equal(t.column("__side"), 0)).select(["src", "dst"])
            l = t.filter(pc.equal(t.column("__side"), 1))
            lt = pa.Table.from_arrays(
                [l.column("src"), l.column("dst")], names=["src", "label"])
            j = e.join(lt, keys=["src"], join_type="inner")
            # proposals: dst receives src's label; plus every doc keeps its own
            return pa.Table.from_arrays(
                [pa.concat_arrays([j.column("dst").combine_chunks(),
                                   lt.column("src").combine_chunks()]),
                 pa.concat_arrays([j.column("label").combine_chunks(),
                                   lt.column("label").combine_chunks()])],
                names=["doc_id", "label"],
            )

        proposals = tagged.groupby("__bucket").map_groups(propose, batch_format="pyarrow")
        new_labels = bucketed_final(proposals, ["doc_id"],
                                    pa_aggs=[("label", "min")], out_names=["label"],
                                    n_buckets=n_buckets).materialize()

        # convergence: any label changed? (tiny aggregate, not a collect)
        def tag_old(t: pa.Table) -> pa.Table:
            return t.append_column("__v", pa.array([0] * len(t), pa.int8()))

        def tag_new(t: pa.Table) -> pa.Table:
            return t.append_column("__v", pa.array([1] * len(t), pa.int8()))

        diff = labels.map_batches(tag_old, batch_format="pyarrow").union(
            new_labels.map_batches(tag_new, batch_format="pyarrow"))
        # a (doc_id, label) pair present an odd number of times means change;
        # cheap check: distinct (doc_id, label) count vs doc count
        n_docs = new_labels.count()
        n_distinct = bucketed_final(
            diff.map_batches(lambda t: t.select(["doc_id", "label"]),
                             batch_format="pyarrow"),
            ["doc_id", "label"], pa_aggs=[("label", "count")], out_names=["n"],
            n_buckets=n_buckets,
        ).count()
        labels = new_labels
        if n_distinct == n_docs:  # old and new agree on every doc
            break

    return labels.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("doc_id").cast(dt), t.column("label").cast(dt)],
            names=["doc_id", "group_id"]),
        batch_format="pyarrow",
    )


# --------------------------------------------- corpus dup-line removal ----


def _split_lines(t: pa.Table, text_col: str):
    """(list_array of lines, flat lines, per-doc counts, doc_of,
    blank mask) — '\\n' split, a line is blank when it has no
    non-space/tab character."""
    text = t.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lines = pc.split_pattern(text, "\n")
    flat = pc.list_flatten(lines)
    per_doc = pc.list_value_length(lines).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(len(t), dtype=np.int64), per_doc)
    blank = ~np.asarray(
        pc.match_substring_regex(flat, r"[^ \t]").fill_null(True))
    return lines, flat, per_doc, doc_of, blank


def _rebuild(t: pa.Table, text_col: str, keep_flat: np.ndarray,
             flat: pa.Array, per_doc: np.ndarray,
             doc_of: np.ndarray) -> pa.Table:
    """Batch rewrite: filter the flattened lines with ``keep_flat``,
    regroup per doc (offsets from kept counts) and join with '\\n' —
    all Arrow kernels, no per-line Python."""
    kept = np.bincount(doc_of[keep_flat], minlength=len(t)) \
        if len(doc_of) else np.zeros(len(t), dtype=np.int64)
    offsets = np.zeros(len(t) + 1, dtype=np.int32)
    np.cumsum(kept, out=offsets[1:])
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                  flat.filter(pa.array(keep_flat)))
    clean = pc.binary_join(la, "\n")
    removed = pa.array((per_doc - kept).astype(np.int64), pa.int64())
    return pa.Table.from_arrays(
        [t.column("doc_id"), clean, removed],
        names=["doc_id", "text_clean", "n_removed"])


def dup_line_removal(docs, *, min_count: int = 2, text_col: str = "text",
                     batch_size: int = 4096,
                     broadcast_max_bytes: int = 256 << 20):
    """CORPUS-level duplicate-line (paragraph) removal — the Dolma-style
    boilerplate cut: delete every non-blank line whose exact text occurs
    in >= ``min_count`` documents' lines ANYWHERE in the corpus (nav
    bars, cookie banners, license footers), keep blank lines and the
    rest in order. -> (doc_id, text_clean, n_removed); a doc whose every
    line is boilerplate comes back as "" (within-doc repeats are
    :func:`dup_span_removal`'s job).

    Phase 1 counts lines two-phase (per-batch group first — a banner
    repeated a million times ships one row per batch, not per
    occurrence). Phase 2 is ADAPTIVE on the measured dup-line table:
    under ``broadcast_max_bytes`` it's one ``ray.put`` + a map-only
    batch rewrite (split -> is_in -> regroup -> ``binary_join``, all
    Arrow); above the gate, docs carrying >= 1 dup line are flagged by a
    hash semi join on their exploded lines, only THOSE docs shuffle
    through an anti-join + doc-bucketed reassembly, and untouched docs
    pass through map-only (the common case: boilerplate is a tiny
    fraction of distinct lines, but the fallback keeps the op total)."""
    import ray
    import ray.data as rd

    from easyner_ray.ops.relational import (add_hash_bucket,
                                            adaptive_semi_join,
                                            bucketed_final)

    docs = docs.materialize()  # feeds the count pass + the rewrite pass

    def count_partial(t: pa.Table) -> pa.Table:
        _, flat, _, _, blank = _split_lines(t, text_col)
        nb = flat.filter(pa.array(~blank))
        g = pa.Table.from_arrays(
            [nb, pa.array(np.ones(len(nb), dtype=np.int64))],
            names=["line", "n"])
        return g.group_by("line").aggregate([("n", "sum")]) \
            .rename_columns(["line", "n"])

    counts = bucketed_final(
        docs.map_batches(count_partial, batch_format="pyarrow",
                         batch_size=batch_size),
        ["line"], pa_aggs=[("n", "sum")], out_names=["n"])
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), min_count))
                   .select(["line"]),
        batch_format="pyarrow").materialize()

    if dup.size_bytes() <= broadcast_max_bytes:
        dup_tbl = pa.concat_tables(
            [b for b in ray.get(dup.to_arrow_refs()) if len(b)]) \
            if dup.count() else None
        ref = ray.put(dup_tbl.column("line").combine_chunks()
                      if dup_tbl is not None else None)

        def rewrite(t: pa.Table) -> pa.Table:
            _, flat, per_doc, doc_of, blank = _split_lines(t, text_col)
            dup_set = ray.get(ref)
            is_dup = (np.asarray(pc.is_in(flat, value_set=dup_set))
                      & ~blank) if dup_set is not None \
                else np.zeros(len(flat), dtype=bool)
            return _rebuild(t, text_col, ~is_dup, flat, per_doc, doc_of)

        return docs.map_batches(rewrite, batch_format="pyarrow",
                                batch_size=batch_size)

    # ---- shuffle path: rewrite only the affected docs ----
    def explode(t: pa.Table) -> pa.Table:
        _, flat, per_doc, doc_of, blank = _split_lines(t, text_col)
        ids = np.asarray(t.column("doc_id"))
        return pa.Table.from_arrays(
            [pa.array(ids[doc_of], pa.int64()),
             pa.array(np.arange(len(flat), dtype=np.int64)
                      - np.repeat(np.cumsum(per_doc) - per_doc, per_doc),
                      pa.int64()),
             flat, pa.array(blank),
             pa.array(per_doc[doc_of], pa.int64())],
            names=["doc_id", "idx", "line", "blank", "total"])

    ex = docs.map_batches(explode, batch_format="pyarrow",
                          batch_size=batch_size).materialize()
    hit_ids = adaptive_semi_join(
        ex.map_batches(lambda t: t.filter(
            pc.invert(t.column("blank"))).select(["doc_id", "line"]),
            batch_format="pyarrow"),
        dup, on="line").select_columns(["doc_id"])
    hit_ids = bucketed_final(
        hit_ids.map_batches(
            lambda t: t.append_column(
                "n", pa.array(np.ones(len(t), dtype=np.int64))),
            batch_format="pyarrow"),
        ["doc_id"], pa_aggs=[("n", "sum")], out_names=["__n"]) \
        .select_columns(["doc_id"]).materialize()

    untouched = adaptive_semi_join(docs, hit_ids, on="doc_id", anti=True) \
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("doc_id"), t.column(text_col).cast(pa.string()),
                 pa.array(np.zeros(len(t), dtype=np.int64))],
                names=["doc_id", "text_clean", "n_removed"]),
            batch_format="pyarrow")

    aff_lines = adaptive_semi_join(ex, hit_ids, on="doc_id")
    # keep = blank lines + non-blank lines NOT in the dup set; a
    # sentinel row (idx = -1) per affected doc keeps fully-wiped docs
    # present in the groupby
    kept_nb = adaptive_semi_join(
        aff_lines.map_batches(
            lambda t: t.filter(pc.invert(t.column("blank"))),
            batch_format="pyarrow"),
        dup, on="line", anti=True)
    kept_blank = aff_lines.map_batches(
        lambda t: t.filter(t.column("blank")), batch_format="pyarrow")
    sentinel = aff_lines.map_batches(
        lambda t: t.filter(pc.equal(t.column("idx"), 0)).set_column(
            t.schema.get_field_index("idx"), "idx",
            pa.array(np.full(len(t.filter(pc.equal(t.column("idx"), 0))),
                             -1, dtype=np.int64))),
        batch_format="pyarrow")
    all_rows = kept_nb.union(kept_blank).union(sentinel)

    def reassemble(t: pa.Table) -> pa.Table:
        t = t.drop(["__bucket"])
        t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending"),
                                                 ("idx", "ascending")]))
        ids = np.asarray(t.column("doc_id"))
        idx = np.asarray(t.column("idx"))
        total = np.asarray(t.column("total"))
        change = np.ones(len(t), dtype=bool)
        change[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(change)
        real = idx >= 0
        kept_per = np.add.reduceat(real.astype(np.int64), starts)
        offsets = np.zeros(len(starts) + 1, dtype=np.int32)
        np.cumsum(kept_per, out=offsets[1:])
        flat = t.column("line").combine_chunks().filter(pa.array(real))
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
        clean = pc.binary_join(la, "\n")
        removed = total[starts] - kept_per
        return pa.Table.from_arrays(
            [pa.array(ids[starts], pa.int64()), clean,
             pa.array(removed.astype(np.int64), pa.int64())],
            names=["doc_id", "text_clean", "n_removed"])

    bucketed = all_rows.map_batches(
        lambda t: add_hash_bucket(t, ["doc_id"], 64), batch_format="pyarrow")
    rewritten = bucketed.groupby("__bucket").map_groups(
        reassemble, batch_format="pyarrow")
    return untouched.union(rewritten)


def dup_line_keep_first(docs, *, min_count: int = 2, text_col: str = "text",
                        batch_size: int = 4096,
                        broadcast_max_bytes: int = 256 << 20):
    """CCNet-style keep-first duplicate-line removal — the retention
    complement of :func:`dup_line_removal` (which deletes EVERY copy of
    a boilerplate line): an occurrence of a duplicated line survives in
    the minimum-``doc_id`` document carrying it and is removed
    everywhere else, so exactly one document retains the shared text.
    Rule per non-blank line occurrence: removed iff the line's total
    occurrence count >= ``min_count`` AND this doc is not the line's
    min-id carrier. -> (doc_id, text_clean, n_removed) for EVERY doc.

    Phase 1 extends the count rollup with the per-line min doc id
    (two-phase: per-batch group first). Phase 2 is ADAPTIVE: under
    ``broadcast_max_bytes`` (measured on the materialized dup map) the
    (line -> min_doc) table broadcasts once and the rewrite is a
    map-only ``index_in`` + compare per batch; above the gate the
    exploded lines LEFT-join the dup map through the size-gated hash
    join and docs reassemble through one doc-bucketed exchange — no
    driver materialization either way."""
    import ray

    from easyner_ray.ops.relational import (adaptive_join, add_hash_bucket,
                                            bucketed_final)

    docs = docs.materialize()  # count pass + rewrite pass

    def count_partial(t: pa.Table) -> pa.Table:
        _, flat, _, doc_of, blank = _split_lines(t, text_col)
        m = ~blank
        nb = flat.filter(pa.array(m))
        ids = t.column("doc_id").combine_chunks().take(
            pa.array(doc_of[m], pa.int64()))
        g = pa.Table.from_arrays(
            [nb, pa.array(np.ones(len(nb), dtype=np.int64)), ids],
            names=["line", "n", "d"])
        return g.group_by("line").aggregate(
            [("n", "sum"), ("d", "min")]).rename_columns(["line", "n", "d"])

    counts = bucketed_final(
        docs.map_batches(count_partial, batch_format="pyarrow",
                         batch_size=batch_size),
        ["line"], pa_aggs=[("n", "sum"), ("d", "min")],
        out_names=["n", "min_doc"])
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), min_count))
                   .select(["line", "min_doc"]),
        batch_format="pyarrow").materialize()

    if dup.size_bytes() <= broadcast_max_bytes:
        blocks = [b for b in ray.get(dup.to_arrow_refs()) if len(b)]
        if blocks:
            dt = pa.concat_tables(blocks).combine_chunks()
            ref = ray.put((dt.column("line").combine_chunks(),
                           dt.column("min_doc").combine_chunks()))
        else:
            ref = ray.put(None)

        def rewrite(t: pa.Table) -> pa.Table:
            _, flat, per_doc, doc_of, blank = _split_lines(t, text_col)
            payload = ray.get(ref)
            if payload is None or len(flat) == 0:
                keep = np.ones(len(flat), dtype=bool)
            else:
                lines_arr, min_docs = payload
                code = pc.index_in(flat, value_set=lines_arr)
                hit = np.asarray(code.is_valid())
                md = min_docs.take(code.fill_null(0))
                ids = t.column("doc_id").combine_chunks().take(
                    pa.array(doc_of, pa.int64()))
                first = np.asarray(pc.equal(md, ids).fill_null(False))
                keep = blank | ~hit | (hit & first)
            return _rebuild(t, text_col, keep, flat, per_doc, doc_of)

        return docs.map_batches(rewrite, batch_format="pyarrow",
                                batch_size=batch_size)

    # ---- open-dup-map path: left-join + doc-bucketed reassembly ----
    def explode(t: pa.Table) -> pa.Table:
        _, flat, per_doc, doc_of, blank = _split_lines(t, text_col)
        ids = t.column("doc_id").combine_chunks().take(
            pa.array(doc_of, pa.int64()))
        return pa.Table.from_arrays(
            [ids,
             pa.array(np.arange(len(flat), dtype=np.int64)
                      - np.repeat(np.cumsum(per_doc) - per_doc, per_doc),
                      pa.int64()),
             flat, pa.array(blank),
             pa.array(per_doc[doc_of], pa.int64())],
            names=["doc_id", "idx", "line", "blank", "total"])

    ex = docs.map_batches(explode, batch_format="pyarrow",
                          batch_size=batch_size)
    j = adaptive_join(ex, dup, on="line", how="left")
    kept = j.map_batches(
        lambda t: t.filter(pc.or_kleene(
            pc.or_kleene(t.column("blank"),
                         pc.is_null(t.column("min_doc"))),
            pc.equal(t.column("doc_id"), t.column("min_doc")))),
        batch_format="pyarrow")
    # a sentinel row (idx = -1) per doc keeps fully-wiped docs present
    sentinel = ex.map_batches(
        lambda t: (lambda f: f.set_column(
            f.schema.get_field_index("idx"), "idx",
            pa.array(np.full(len(f), -1, dtype=np.int64))))(
                t.filter(pc.equal(t.column("idx"), 0))),
        batch_format="pyarrow")
    all_rows = kept.map_batches(
        lambda t: t.select(["doc_id", "idx", "line", "total"]),
        batch_format="pyarrow").union(sentinel.map_batches(
            lambda t: t.select(["doc_id", "idx", "line", "total"]),
            batch_format="pyarrow"))
    bucketed = all_rows.map_batches(
        lambda t: add_hash_bucket(t, ["doc_id"], 64),
        batch_format="pyarrow")

    def reassemble(t: pa.Table) -> pa.Table:
        t = t.drop(["__bucket"])
        t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending"),
                                                 ("idx", "ascending")]))
        n = len(t)
        ids = t.column("doc_id").combine_chunks()
        idx = np.asarray(t.column("idx"))
        total = np.asarray(t.column("total"))
        change = np.ones(n, dtype=bool)
        if n > 1:  # id-type-agnostic group change (Arrow shifted compare)
            change[1:] = np.asarray(
                pc.not_equal(ids.slice(1), ids.slice(0, n - 1))
                .fill_null(True))
        starts = np.flatnonzero(change)
        real = idx >= 0
        kept_per = np.add.reduceat(real.astype(np.int64), starts)
        offsets = np.zeros(len(starts) + 1, dtype=np.int32)
        np.cumsum(kept_per, out=offsets[1:])
        flat = t.column("line").combine_chunks().filter(pa.array(real))
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
        clean = pc.binary_join(la, "\n")
        removed = total[starts] - kept_per
        return pa.Table.from_arrays(
            [ids.take(pa.array(starts, pa.int64())), clean,
             pa.array(removed, pa.int64())],
            names=["doc_id", "text_clean", "n_removed"])

    return bucketed.groupby("__bucket").map_groups(
        reassemble, batch_format="pyarrow")
