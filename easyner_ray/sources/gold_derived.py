"""Derived gold tables for the deterministic post-NER operators.

These extend the analytic gold (sources.synthetic) with engine-independent
straight-line recomputations of operators whose outputs are fully
deterministic functions of the gold mentions / documents:

  * ``gold_resolved_mentions.parquet``  — O6 overlap conflict resolution
    (spec: reference entity_merger2.py:99-146 — identical spans keep the
    higher-priority class, contained spans drop, partial overlaps drop the
    shorter span; realized as greedy accept in (longer, higher-priority,
    earlier) order);
  * ``gold_disambiguated.parquet``      — scored NEL disambiguation (spec:
    stages/disambiguate.py module docstring — crc32-seeded hash-projection
    profiles, cosine vs the mean context vector of the sentence's OTHER
    mention norms, deterministic (score desc, id asc) tie-break);
  * ``gold_doc_rollfp.parquet``         — 64-bit polynomial rolling hash of
    the token stream (FNV-basis/prime constants, crc32 per token);
  * ``gold_simhash_pairs.parquet``      — BRUTE-FORCE all-pairs SimHash
    Hamming <= 3 (the engine's 4x16-bit band blocking is complete for
    d <= 3 by pigeonhole, so banding must equal brute force at fixture
    scale);
  * ``gold_minhash_pairs.parquet``      — straight-line MinHash-LSH
    candidate pairs (spec constants: 64 perms seeded 17 over crc32 word-
    trigram shingles, 16 bands x 4 rows, crc32 band keys, hot_cap 500,
    signature-agreement estimate >= threshold, max-estimate dedupe);
  * ``gold_cosine_lsh_pairs.parquet``   — straight-line random-hyperplane
    LSH near-dup pairs (spec: planes/tables derived from (threshold, n)
    by the documented formula, RandomState(29).randn(T, P, d) planes,
    per-table sign-bit keys, in-group exact cosine >= threshold).

Everything here is plain single-process Python over parquet files — no Ray,
no engine stage imports — so a gold value can only match the engine when
the distributed implementation is actually correct. The LSH spec formulas
are DUPLICATED here on purpose (not imported): the gold is the spec's
second, independent realization.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Entity-class priority (spec constant, reference entity_merger2.py:116:
# chemical < disease < species < gene < cell — higher wins).
_PRIORITY = {"chemical": 1, "disease": 2, "species": 3, "gene": 4, "cell": 5}

_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211
_U64 = (1 << 64) - 1


# ------------------------------------------------------ resolved mentions --


def _resolve_sentence(ments: list[dict]) -> list[dict]:
    ranked = sorted(
        ments,
        key=lambda m: (-(m["end"] - m["start"]), -_PRIORITY.get(m["cls"], 0),
                       m["start"], m["cls"]),
    )
    kept: list[dict] = []
    for m in ranked:
        overlaps = False
        for k in kept:
            if m["start"] < k["end"] and k["start"] < m["end"]:
                overlaps = True
                break
        if not overlaps:
            kept.append(m)
    kept.sort(key=lambda m: (m["start"], m["end"]))
    return kept


def _mentions_by_sentence(corpus: str):
    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"))
    rows = [dict(zip(gm.column_names, r)) for r in zip(*(gm.column(c).to_pylist() for c in gm.column_names))]
    by_sent: dict[tuple, list[dict]] = {}
    for r in rows:
        by_sent.setdefault((r["conv_id"], r["turn_idx"], r["sent_idx"]), []).append(r)
    for ms in by_sent.values():
        ms.sort(key=lambda m: m["mention_idx"])
    return by_sent


def write_resolved_gold(corpus: str) -> str:
    by_sent = _mentions_by_sentence(corpus)
    out_rows: list[tuple] = []
    for (cid, ti, si) in sorted(by_sent):
        for i, m in enumerate(_resolve_sentence(by_sent[(cid, ti, si)])):
            out_rows.append((cid, ti, si, i, m["surface"], m["norm"], m["cls"],
                             m["start"], m["end"]))
    from easyner_ray.sources.synthetic import GOLD_MENTION_SCHEMA, _rows_to_table

    path = os.path.join(corpus, "gold_resolved_mentions.parquet")
    pq.write_table(_rows_to_table(out_rows, GOLD_MENTION_SCHEMA), path)
    return path


# --------------------------------------------------------- disambiguation --


def _hash_vec(text: str, dim: int = 32) -> np.ndarray:
    rng = np.random.RandomState(zlib.crc32(text.encode()) & 0xFFFFFFFF)
    v = rng.randn(dim)
    return v / (np.linalg.norm(v) or 1.0)


def write_disambiguated_gold(corpus: str) -> str:
    alias_tbl = pq.read_table(os.path.join(corpus, "alias.parquet"))
    alias: dict[str, list[str]] = {}
    for term, id_ in zip(alias_tbl.column("term").to_pylist(),
                         alias_tbl.column("id").to_pylist()):
        alias.setdefault(term, []).append(id_)
    for v in alias.values():
        v.sort()

    by_sent = _mentions_by_sentence(corpus)
    cols = {k: [] for k in ("conv_id", "turn_idx", "sent_idx", "mention_idx",
                            "norm", "entity_id")}
    for (cid, ti, si) in sorted(by_sent):
        ments = by_sent[(cid, ti, si)]
        norms = [m["norm"] for m in ments]
        for m in ments:
            cands = alias.get(m["norm"], [])
            if not cands:
                chosen = ""
            elif len(cands) == 1:
                chosen = cands[0]
            else:
                others = [n for n in norms if n != m["norm"]]
                if others:
                    ctx = np.mean([_hash_vec("ctx:" + n) for n in others], axis=0)
                    nrm = np.linalg.norm(ctx)
                    ctx = ctx / nrm if nrm else ctx
                else:
                    ctx = _hash_vec("ctx:" + m["norm"])
                best = None
                for c in cands:
                    s = float(_hash_vec("id:" + c) @ ctx)
                    if best is None or s > best[0] or (s == best[0] and c < best[1]):
                        best = (s, c)
                chosen = best[1]
            cols["conv_id"].append(cid)
            cols["turn_idx"].append(ti)
            cols["sent_idx"].append(si)
            cols["mention_idx"].append(m["mention_idx"])
            cols["norm"].append(m["norm"])
            cols["entity_id"].append(chosen)
    tbl = pa.Table.from_arrays(
        [pa.array(cols["conv_id"], pa.string()),
         pa.array(cols["turn_idx"], pa.int32()),
         pa.array(cols["sent_idx"], pa.int32()),
         pa.array(cols["mention_idx"], pa.int32()),
         pa.array(cols["norm"], pa.string()),
         pa.array(cols["entity_id"], pa.string())],
        names=["conv_id", "turn_idx", "sent_idx", "mention_idx", "norm", "entity_id"],
    )
    path = os.path.join(corpus, "gold_disambiguated.parquet")
    pq.write_table(tbl, path)
    return path


# --------------------------------------- document-derived (rollfp/simhash) --


def _roll_fp(text: str) -> str:
    h = _FNV_OFFSET
    for tok in text.split():
        h = ((h * _FNV_PRIME) & _U64) ^ zlib.crc32(tok.encode())
    return f"{h:016x}"


def _simhash(text: str) -> int:
    counts: dict[str, int] = {}
    for tok in text.split():
        counts[tok] = counts.get(tok, 0) + 1
    if not counts:
        return 0
    sums = [0] * 64
    for tok, c in counts.items():
        h = (zlib.crc32(tok.encode()) << 32) | zlib.crc32((tok + "\x00").encode())
        for bit in range(64):
            sums[bit] += c if (h >> bit) & 1 else -c
    out = 0
    for bit in range(64):
        if sums[bit] > 0:
            out |= 1 << bit
    return out


def write_doc_gold(corpus: str, documents_path: str, max_hamming: int = 3) -> list[str]:
    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()

    fp_tbl = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()),
         pa.array([_roll_fp(t or "") for t in texts], pa.string())],
        names=["doc_id", "roll_fp"],
    )
    fp_path = os.path.join(corpus, "gold_doc_rollfp.parquet")
    pq.write_table(fp_tbl, fp_path)

    hashes = [_simhash(t or "") for t in texts]
    a_l, b_l, h_l = [], [], []
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    for x in range(len(order)):
        i = order[x]
        for y in range(x + 1, len(order)):
            j = order[y]
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= max_hamming:
                a_l.append(ids[i])
                b_l.append(ids[j])
                h_l.append(d)
    sh_tbl = pa.Table.from_arrays(
        [pa.array(a_l, pa.int64()), pa.array(b_l, pa.int64()),
         pa.array(h_l, pa.int64())],
        names=["doc_a", "doc_b", "hamming"],
    )
    sh_path = os.path.join(corpus, "gold_simhash_pairs.parquet")
    pq.write_table(sh_tbl, sh_path)
    return [fp_path, sh_path]


# ------------------------------------------------------------ minhash LSH --

_MINHASH_MERSENNE = np.uint64((1 << 61) - 1)


def write_minhash_gold(corpus: str, documents_path: str, threshold: float = 0.2,
                       n_perm: int = 64, n_bands: int = 16, k: int = 3,
                       seed: int = 17, hot_cap: int = 500) -> str:
    """Straight-line MinHash-LSH pair recompute (spec constants match the
    query's call of the engine op). Output: (doc_a, doc_b, est_jaccard)."""
    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()

    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
    rows = n_perm // n_bands

    def shingles(text: str) -> list[str]:
        toks = text.split()
        if len(toks) < k:
            return [" ".join(toks)] if toks else []
        return sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})

    sigs: list[np.ndarray] = []
    buckets: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        sh = shingles(t or "")
        if not sh:
            sig = np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            h = np.array([zlib.crc32(s.encode()) for s in sh], dtype=np.uint64)
            sig = ((h[:, None] * a[None, :] + b[None, :]) % _MINHASH_MERSENNE).min(axis=0)
        sigs.append(sig)
        for bi in range(n_bands):
            chunk = sig[bi * rows : (bi + 1) * rows].tobytes()
            buckets.setdefault(f"{bi}:{zlib.crc32(chunk):08x}", []).append(i)

    best: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        if len(members) < 2 or len(members) > hot_cap:
            continue
        order = sorted(members, key=lambda i: ids[i])
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    key = (ids[i], ids[j])
                    if est > best.get(key, -1.0):
                        best[key] = est

    keys = sorted(best)
    tbl = pa.Table.from_arrays(
        [pa.array([x for x, _ in keys], pa.int64()),
         pa.array([y for _, y in keys], pa.int64()),
         pa.array([best[kk] for kk in keys], pa.float64())],
        names=["doc_a", "doc_b", "est_jaccard"],
    )
    path = os.path.join(corpus, "gold_minhash_pairs.parquet")
    pq.write_table(tbl, path)
    return path


def write_dup_span_gold(corpus: str, documents_path: str,
                        window: int = 8) -> str:
    """Straight-line duplicated-span removal recompute (spec:
    ops.dedup.dup_span_removal — tokens = str.split, a window TUPLE
    occurring >= 2 times corpus-wide marks its tokens for removal,
    output = surviving tokens space-joined). Tuples here vs the engine's
    64-bit Horner fingerprints: identical modulo 2^-64 collisions."""
    from collections import Counter

    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    toks = [(t or "").split() for t in docs.column("text").to_pylist()]

    cnt: Counter = Counter()
    for tk in toks:
        for i in range(len(tk) - window + 1):
            cnt[tuple(tk[i: i + window])] += 1

    o_txt, o_rm = [], []
    for tk in toks:
        cov = np.zeros(len(tk), dtype=bool)
        for i in range(len(tk) - window + 1):
            if cnt[tuple(tk[i: i + window])] >= 2:
                cov[i: i + window] = True
        o_txt.append(" ".join(t for t, c in zip(tk, cov) if not c))
        o_rm.append(int(cov.sum()))
    tbl = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(o_txt, pa.string()),
         pa.array(o_rm, pa.int64())],
        names=["doc_id", "text_clean", "n_removed"],
    )
    path = os.path.join(corpus, "gold_dup_span.parquet")
    pq.write_table(tbl, path)
    return path


def write_minhash_incremental_gold(corpus: str, documents_path: str,
                                   threshold: float = 0.2, n_perm: int = 64,
                                   n_bands: int = 16, k: int = 3,
                                   seed: int = 17, hot_cap: int = 500) -> str:
    """Straight-line recompute of the INCREMENTAL MinHash probe: docs with
    even doc_id are the persisted snapshot, odd ones the new shard; a
    (new, old) candidate exists when they share a band bucket whose OLD
    posting is <= hot_cap (spec of ops.dedup.minhash_lsh_incremental).
    Output: (doc_new, doc_old, est_jaccard), max-deduped."""
    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()

    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
    rows = n_perm // n_bands

    def shingles(text: str) -> list[str]:
        toks = text.split()
        if len(toks) < k:
            return [" ".join(toks)] if toks else []
        return sorted({" ".join(toks[i: i + k]) for i in range(len(toks) - k + 1)})

    sigs: list[np.ndarray] = []
    buckets: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        sh = shingles(t or "")
        if not sh:
            sig = np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            h = np.array([zlib.crc32(s.encode()) for s in sh], dtype=np.uint64)
            sig = ((h[:, None] * a[None, :] + b[None, :]) % _MINHASH_MERSENNE).min(axis=0)
        sigs.append(sig)
        for bi in range(n_bands):
            chunk = sig[bi * rows: (bi + 1) * rows].tobytes()
            buckets.setdefault(f"{bi}:{zlib.crc32(chunk):08x}", []).append(i)

    best: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        old = [i for i in members if ids[i] % 2 == 0]
        new = [i for i in members if ids[i] % 2 != 0]
        if not old or not new or len(old) > hot_cap:
            continue
        for i in new:
            for j in old:
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    key = (ids[i], ids[j])
                    if est > best.get(key, -1.0):
                        best[key] = est

    keys = sorted(best)
    tbl = pa.Table.from_arrays(
        [pa.array([x for x, _ in keys], pa.int64()),
         pa.array([y for _, y in keys], pa.int64()),
         pa.array([best[kk] for kk in keys], pa.float64())],
        names=["doc_new", "doc_old", "est_jaccard"],
    )
    path = os.path.join(corpus, "gold_minhash_incremental.parquet")
    pq.write_table(tbl, path)
    return path


# --------------------------------------------------------- cosine-LSH gold --


def _lsh_plane_params_spec(threshold: float, n: int, target_recall: float = 0.9,
                           target_bucket: int = 128, max_tables: int = 64) -> tuple[int, int]:
    """The (n_planes, n_tables) derivation — deliberately DUPLICATED from
    ops.similarity.lsh_plane_params (the spec's independent realization;
    tests assert the two stay identical)."""
    import math

    p1 = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    n_planes = int(min(24, max(2, math.ceil(math.log2(max(n, 2) / target_bucket))
                               if n > target_bucket else 2)))
    p_table = p1 ** n_planes
    if p_table >= 1.0:
        return n_planes, 1
    n_tables = int(min(max_tables,
                       math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_table))))
    return n_planes, max(1, n_tables)


def write_cosine_lsh_gold(corpus: str, embeddings_path: str, threshold: float = 0.5,
                          seed: int = 29, hot_cap: int = 2000) -> str:
    """Straight-line random-hyperplane LSH pair recompute. Output:
    (vec_id_a, vec_id_b) — the query drops the cosine column."""
    emb = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in emb.column("embedding").to_pylist()])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    vecs = mat / norms
    n = len(ids)

    n_planes, n_tables = _lsh_plane_params_spec(threshold, n)
    planes = np.random.RandomState(seed).randn(n_tables, n_planes, mat.shape[1])
    signs = np.einsum("nd,tpd->ntp", vecs, planes) > 0
    bits = (signs.astype(np.uint64)
            << np.arange(n_planes, dtype=np.uint64)[None, None, :]).sum(axis=2)

    pairs: set[tuple[int, int]] = set()
    for t in range(n_tables):
        groups: dict[int, list[int]] = {}
        for i in range(n):
            groups.setdefault(int(bits[i, t]), []).append(i)
        for members in groups.values():
            if len(members) < 2 or len(members) > hot_cap:
                continue
            order = sorted(members, key=lambda i: ids[i])
            m = vecs[order]
            sim = m @ m.T
            ii, jj = np.where(np.triu(sim >= threshold, k=1))
            for x, y in zip(ii, jj):
                pairs.add((int(ids[order[x]]), int(ids[order[y]])))

    keys = sorted(pairs)
    tbl = pa.Table.from_arrays(
        [pa.array([x for x, _ in keys], pa.int64()),
         pa.array([y for _, y in keys], pa.int64())],
        names=["vec_id_a", "vec_id_b"],
    )
    path = os.path.join(corpus, "gold_cosine_lsh_pairs.parquet")
    pq.write_table(tbl, path)
    return path


# --------------------------------------------------------- language-ID gold --

# Spec seed profiles — deliberately DUPLICATED from ops.textstats._LANG_SEEDS
# (tests assert the two stay identical): the most characteristic frequent
# words per language from public stopword lists.
_LANG_SEEDS_SPEC = {
    "en": "the and of to in is that it for on with as was at by this have from are be not",
    "de": "der die und das ist nicht von mit den auf für ein eine zu im sich des auch werden",
    "fr": "le la les des et de un une est pas que pour dans qui sur avec au plus par",
    "es": "el la los las de que y en un una es no por con para su al lo como más",
    "it": "il la di che e un una per non sono con del alla nel più come anche dalla",
}


def _trigram_profile_spec(s: str) -> dict[str, float]:
    """L2-normalized char-trigram counts over '  <lower(s)>  '. The
    engine accumulates scores in sorted-trigram order (vectorized
    kernel), this gold in first-occurrence order — both round each
    per-language score at the shared 1e-9 np.round grain
    (ops.textstats.LangID.ROUND_DIGITS), which absorbs the ~1e-16
    sum-order difference, so the outputs stay bit-identical."""
    s = f"  {s.lower()}  "
    out: dict[str, float] = {}
    for i in range(len(s) - 2):
        g = s[i : i + 3]
        out[g] = out.get(g, 0.0) + 1.0
    norm = sum(v * v for v in out.values()) ** 0.5 or 1.0
    return {k: v / norm for k, v in out.items()}


def write_langid_gold(corpus: str, documents_path: str) -> str:
    """Straight-line trigram-cosine language-ID recompute over the documents
    table. Output: (doc_id, lang_pred, lang_score) — the exact op schema."""
    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    profiles = {lang: _trigram_profile_spec(seed)
                for lang, seed in _LANG_SEEDS_SPEC.items()}
    preds: list[str] = []
    scores: list[float] = []
    for t in docs.column("text").to_pylist():
        t = t or ""
        if not t:
            preds.append("und")
            scores.append(0.0)
            continue
        tg = _trigram_profile_spec(t[:2000])
        best_lang, best, second = "und", 0.0, 0.0
        for lang, prof in profiles.items():
            score = float(np.round(
                sum(w * prof.get(g, 0.0) for g, w in tg.items()), 9))
            if score > best:
                best_lang, second, best = lang, best, score
            elif score > second:
                second = score
        preds.append(best_lang)
        scores.append(best)
    tbl = pa.Table.from_arrays(
        [docs.column("doc_id"),
         pa.array(preds, pa.string()),
         pa.array(scores, pa.float64())],
        names=["doc_id", "lang_pred", "lang_score"],
    )
    path = os.path.join(corpus, "gold_langid.parquet")
    pq.write_table(tbl, path)
    return path


# ------------------------------------------------------------ knn-IVF gold --


def write_knn_ivf_gold(corpus: str, embeddings_path: str, k: int = 10,
                       n_centroids: int = 16, nprobe: int = 4,
                       n_queries: int = 4, sample_size: int = 4096,
                       iters: int = 8, seed: int = 13) -> str:
    """Straight-line IVF top-k recompute (spec: ops.similarity.knn_ivf with
    the query defaults): k-means centroids from the FIRST sample_size rows
    in file order (RandomState(seed) init, ``iters`` Lloyd rounds,
    re-normalized each round), nearest-centroid bucket per vector, per-query
    nprobe nearest buckets probed, exact cosine top-k inside them with the
    (-score, vec_id) tie-break. Output: (query_id, rank, vec_id) — the float
    score column is dropped, exactly as the driver query drops it, so
    rank equality is what's certified (BLAS summation-order ulps between
    this single-process gemm and the engine's per-batch gemms cannot be
    bit-pinned; distinct random vectors never tie within an ulp, and exact
    duplicate vectors yield exactly equal dots on both sides, where the
    vec_id tie-break is deterministic)."""
    emb = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in emb.column("embedding").to_pylist()])

    def norm(m: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    vecs = norm(mat)
    # queries = the n_queries smallest vec_ids' raw embeddings, normalized
    qorder = np.argsort(ids, kind="stable")[:n_queries]
    q = norm(mat[qorder])

    x = vecs[:sample_size]
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(axis=0)
        cent = norm(cent)

    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    buckets = (vecs @ cent.T).argmax(axis=1)
    o_q: list[int] = []
    o_r: list[int] = []
    o_v: list[int] = []
    for qi in range(len(q)):
        allowed = np.isin(buckets, probe[qi])
        cand = sorted(zip(-(vecs[allowed] @ q[qi]), ids[allowed]))[:k]
        for rank, (_negs, v) in enumerate(cand, start=1):
            o_q.append(qi)
            o_r.append(rank)
            o_v.append(int(v))
    tbl = pa.Table.from_arrays(
        [pa.array(o_q, pa.int64()), pa.array(o_r, pa.int64()),
         pa.array(o_v, pa.int64())],
        names=["query_id", "rank", "vec_id"],
    )
    path = os.path.join(corpus, "gold_knn_ivf.parquet")
    pq.write_table(tbl, path)
    return path


def write_knn_ivf_incremental_gold(corpus: str, embeddings_path: str,
                                   k: int = 10, n_centroids: int = 16,
                                   nprobe: int = 4, n_queries: int = 4,
                                   sample_size: int = 4096,
                                   iters: int = 8, seed: int = 13) -> str:
    """Straight-line gold for the INCREMENTAL IVF path (spec:
    ``build_ivf_index`` on the base slice ``vec_id % 5 != 0``, then
    ``append_ivf_index`` of the delta ``vec_id % 5 == 0`` WITHOUT
    retraining, then ``knn_ivf_indexed``): centroids from the base
    slice's first ``sample_size`` rows in file order (same RandomState
    Lloyd spec as write_knn_ivf_gold), buckets for base AND delta from
    those base-trained centroids, exact cosine top-k inside the nprobe
    probed buckets with the (-score, vec_id) tie-break. Rank-only
    output, same BLAS-ulp rationale as write_knn_ivf_gold."""
    emb = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in emb.column("embedding").to_pylist()])

    def norm(m: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    vecs = norm(mat)
    qorder = np.argsort(ids, kind="stable")[:n_queries]
    q = norm(mat[qorder])
    base_mask = (ids % 5) != 0
    x = vecs[base_mask][:sample_size]
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)),
                        replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(axis=0)
        cent = norm(cent)
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    buckets = (vecs @ cent.T).argmax(axis=1)
    o_q: list[int] = []
    o_r: list[int] = []
    o_v: list[int] = []
    for qi in range(len(q)):
        allowed = np.isin(buckets, probe[qi])
        cand = sorted(zip(-(vecs[allowed] @ q[qi]), ids[allowed]))[:k]
        for rank, (_negs, v) in enumerate(cand, start=1):
            o_q.append(qi)
            o_r.append(rank)
            o_v.append(int(v))
    tbl = pa.Table.from_arrays(
        [pa.array(o_q, pa.int64()), pa.array(o_r, pa.int64()),
         pa.array(o_v, pa.int64())],
        names=["query_id", "rank", "vec_id"])
    path = os.path.join(corpus, "gold_knn_ivf_incremental.parquet")
    pq.write_table(tbl, path)
    return path


def write_knn_self_gold(corpus: str, embeddings_path: str, k: int = 5,
                        n_centroids: int = 16, sample_size: int = 4096,
                        iters: int = 8, seed: int = 13) -> str:
    """Straight-line ANN self-join recompute (spec:
    ops.similarity.knn_self_join — IVF cell-local exact top-k, queries
    probe only their own cell, (-score, neighbor_id) tie-break, float
    score dropped for the same ulp rationale as write_knn_ivf_gold).
    Output: (vec_id, rank, neighbor_id)."""
    emb = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in emb.column("embedding").to_pylist()])

    def norm(m: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    vecs = norm(mat)
    x = vecs[:sample_size]
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(axis=0)
        cent = norm(cent)

    buckets = (vecs @ cent.T).argmax(axis=1)
    o_v: list[int] = []
    o_r: list[int] = []
    o_n: list[int] = []
    for b in np.unique(buckets):
        members = np.flatnonzero(buckets == b)
        if len(members) < 2:
            continue
        mids = ids[members]
        order = np.argsort(mids, kind="stable")
        mids, mx = mids[order], vecs[members][order]
        kk = min(k, len(mids) - 1)
        s = mx @ mx.T
        np.fill_diagonal(s, -np.inf)
        top = np.argsort(-s, axis=1, kind="stable")[:, :kk]
        for qi in range(len(mids)):
            for rank, j in enumerate(top[qi], start=1):
                o_v.append(int(mids[qi]))
                o_r.append(rank)
                o_n.append(int(mids[j]))
    tbl = pa.Table.from_arrays(
        [pa.array(o_v, pa.int64()), pa.array(o_r, pa.int64()),
         pa.array(o_n, pa.int64())],
        names=["vec_id", "rank", "neighbor_id"],
    )
    path = os.path.join(corpus, "gold_knn_self.parquet")
    pq.write_table(tbl, path)
    return path


# --------------------------------------------------- approx-distinct gold --

_SM1, _SM2, _SM3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB


def _splitmix64_scalar(x: int) -> int:
    """Scalar splitmix64 — deliberately DUPLICATED from ops.sketch
    (the spec's independent realization; a test asserts they agree)."""
    z = (x + _SM1) & _U64
    z = ((z ^ (z >> 30)) * _SM2) & _U64
    z = ((z ^ (z >> 27)) * _SM3) & _U64
    return z ^ (z >> 31)


def write_approx_distinct_gold(corpus: str, events_path: str,
                               p: int = 12) -> str:
    """Straight-line HyperLogLog recompute: approximate distinct user_id
    per event_type over the events table (spec: ops.sketch module
    docstring — splitmix64 hash, top-p register index, leading-zero rho,
    bias-corrected estimate with linear-counting small range). Registers
    are built with scalar Python ints; only the final estimate uses the
    same ascending-index numpy sum as the engine so the rounded int64 is
    bit-identical, not merely close."""
    ev = pq.read_table(events_path, columns=["event_type", "user_id"])
    m = 1 << p
    lowbits = 64 - p
    regs: dict[str, list[int]] = {}
    for et, uid in zip(ev.column("event_type").to_pylist(),
                       ev.column("user_id").to_pylist()):
        h = _splitmix64_scalar(uid & _U64)
        idx = h >> lowbits
        rem = h & ((1 << lowbits) - 1)
        rho = lowbits - rem.bit_length() + 1
        r = regs.setdefault(et, [0] * m)
        if rho > r[idx]:
            r[idx] = rho
    def estimate(r: list[int]) -> int:
        arr = np.asarray(r, dtype=np.float64)
        alpha = 0.7213 / (1.0 + 1.079 / m) if m > 64 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
        est = alpha * m * m / np.sum(np.exp2(-arr))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(arr == 0))
            if zeros:
                est = m * np.log(m / zeros)
        return int(round(est))
    types = sorted(regs)
    tbl = pa.Table.from_arrays(
        [pa.array(types, pa.string()),
         pa.array([estimate(regs[t]) for t in types], pa.int64())],
        names=["event_type", "approx_distinct"],
    )
    path = os.path.join(corpus, "gold_approx_distinct.parquet")
    pq.write_table(tbl, path)
    return path


def write_cms_gold(corpus: str, events_path: str, width: int = 2048,
                   depth: int = 4, n_query: int = 64) -> str:
    """Straight-line count-min recompute: estimated user_id frequencies
    for query keys 0..n_query-1 over the events table (spec:
    ops.sketch.cms_counts — row-i counter index = splitmix64(key ^
    splitmix64(i+1)) mod width, estimate = min over rows). Built with
    scalar Python ints; addition-merged counters make the distributed
    build bit-identical to this single pass."""
    ev = pq.read_table(events_path, columns=["user_id"])
    counts = [[0] * width for _ in range(depth)]
    seeds = [_splitmix64_scalar(i + 1) for i in range(depth)]
    for uid in ev.column("user_id").to_pylist():
        for i in range(depth):
            counts[i][_splitmix64_scalar((uid & _U64) ^ seeds[i]) % width] += 1
    keys = list(range(n_query))
    est = [min(counts[i][_splitmix64_scalar((k & _U64) ^ seeds[i]) % width]
               for i in range(depth)) for k in keys]
    tbl = pa.Table.from_arrays(
        [pa.array(keys, pa.int64()), pa.array(est, pa.int64())],
        names=["user_id", "est_count"])
    path = os.path.join(corpus, "gold_cms_counts.parquet")
    pq.write_table(tbl, path)
    return path


def write_kmeans_gold(corpus: str, embeddings_path: str, k: int = 6,
                      iters: int = 4, round_digits: int = 9) -> str:
    """Straight-line Lloyd k-means assignments over the embeddings table
    — the gold for the distributed ``ops.similarity.kmeans`` (spec: init
    = the k lowest-vec_id vectors, argmin tie-break to the lowest
    cluster, centroids rounded element-wise with Python ``round`` at
    ``round_digits`` after every iteration — the rounding is the spec's
    block-layout-invariance device, duplicated here on purpose)."""
    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    vid = np.asarray(t.column("vec_id").combine_chunks())
    m = np.array(t.column("embedding").combine_chunks().to_pylist(),
                 dtype=np.float64)
    order = np.argsort(vid, kind="stable")
    cents = m[order[:k]].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                cents[c] = m[a == c].mean(axis=0)
        cents = np.array([[round(float(x), round_digits) for x in row]
                          for row in cents])
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    assign = np.argmin(d2, axis=1)
    tbl = pa.Table.from_arrays(
        [pa.array(vid, pa.int64()), pa.array(assign, pa.int64())],
        names=["vec_id", "cluster"])
    path = os.path.join(corpus, "gold_kmeans_assign.parquet")
    pq.write_table(tbl, path)
    return path


def write_semdedup_gold(corpus: str, embeddings_path: str, k: int = 6,
                        iters: int = 4, threshold: float = 0.5,
                        round_digits: int = 9) -> str:
    """Straight-line SemDeDup over the embeddings table — the gold for
    ``ops.similarity.semdedup`` (spec: the write_kmeans_gold assignment
    recompute, then per cluster: members sorted by vec_id, rows
    L2-normalized, cosines = one Gram matmul rounded at ``round_digits``
    (the shared layout-invariance grain), union-find min-label over the
    >= threshold pairs; rep_id = component min vec_id — duplicated here
    on purpose, straight-line)."""
    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    vid = np.asarray(t.column("vec_id").combine_chunks())
    m = np.array(t.column("embedding").combine_chunks().to_pylist(),
                 dtype=np.float64)
    order = np.argsort(vid, kind="stable")
    cents = m[order[:k]].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                cents[c] = m[a == c].mean(axis=0)
        cents = np.array([[round(float(x), round_digits) for x in row]
                          for row in cents])
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    assign = np.argmin(d2, axis=1)

    out_id, out_cl, out_rep = [], [], []
    for c in range(k):
        mask = assign == c
        if not mask.any():
            continue
        ids = vid[mask]
        o = np.argsort(ids, kind="stable")
        ids = ids[o]
        mm = m[mask][o]
        norms = np.linalg.norm(mm, axis=1)
        norms[norms == 0] = 1.0
        mn = mm / norms[:, None]
        sim = np.round(mn @ mn.T, round_digits)
        n = len(ids)
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        ii, jj = np.nonzero(np.triu(sim >= threshold, 1))
        for a_, b_ in zip(ii, jj):
            ra, rb = find(int(a_)), find(int(b_))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for i in range(n):
            out_id.append(int(ids[i]))
            out_cl.append(c)
            out_rep.append(int(ids[find(i)]))
    tbl = pa.Table.from_arrays(
        [pa.array(out_id, pa.int64()), pa.array(out_cl, pa.int64()),
         pa.array(out_rep, pa.int64())],
        names=["vec_id", "cluster", "rep_id"])
    path = os.path.join(corpus, "gold_semdedup.parquet")
    pq.write_table(tbl, path)
    return path


def write_outlier_gold(corpus: str, embeddings_path: str, k: int = 6,
                       iters: int = 4, q: float = 0.9,
                       round_digits: int = 9) -> str:
    """Straight-line embedding outlier filter — the gold for
    ``ops.similarity.embedding_outlier_filter`` (spec: the
    write_kmeans_gold assignment recompute; dist = squared distance to
    own centroid rounded at ``round_digits``; per-cluster threshold =
    quantile_disc(dist, q) (rank ceil(q*n), 1-indexed ascending); keep
    dist <= threshold)."""
    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    vid = np.asarray(t.column("vec_id").combine_chunks())
    m = np.array(t.column("embedding").combine_chunks().to_pylist(),
                 dtype=np.float64)
    order = np.argsort(vid, kind="stable")
    cents = m[order[:k]].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                cents[c] = m[a == c].mean(axis=0)
        cents = np.array([[round(float(x), round_digits) for x in row]
                          for row in cents])
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    assign = np.argmin(d2, axis=1)
    dist = np.round(d2[np.arange(len(assign)), assign], round_digits)

    out_id, out_cl, out_d = [], [], []
    for c in range(k):
        mask = assign == c
        if not mask.any():
            continue
        dd = np.sort(dist[mask])
        thr = dd[int(np.ceil(q * len(dd))) - 1]
        keep = mask & (dist <= thr)
        out_id.extend(int(x) for x in vid[keep])
        out_cl.extend([c] * int(keep.sum()))
        out_d.extend(float(x) for x in dist[keep])
    tbl = pa.Table.from_arrays(
        [pa.array(out_id, pa.int64()), pa.array(out_cl, pa.int64()),
         pa.array(out_d, pa.float64())],
        names=["vec_id", "cluster", "dist"])
    path = os.path.join(corpus, "gold_outlier_filter.parquet")
    pq.write_table(tbl, path)
    return path


def write_bpe_gold(corpus: str, documents_path: str, n_merges: int = 20
                   ) -> str:
    """Straight-line BPE merge table over the documents corpus — the
    gold for ``ops.textstats.bpe_merges`` (spec: [a-z0-9]+ lowercase
    word counts; per merge round, pair counts weighted by word frequency
    with non-overlapping left-to-right occurrences; max count wins, ties
    to the lexicographically smallest pair — duplicated straight-line
    on purpose, independent of the engine loop)."""
    import re

    t = pq.read_table(documents_path, columns=["text"])
    wc: dict[str, int] = {}
    for txt in t.column("text").to_pylist():
        for w in re.findall(r"[a-z0-9]+", (txt or "").lower()):
            wc[w] = wc.get(w, 0) + 1
    words = {w: list(w) for w in wc}
    rows = []
    for rank in range(n_merges):
        pc_: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            c = wc[w]
            i = 0
            while i < len(syms) - 1:
                p = (syms[i], syms[i + 1])
                pc_[p] = pc_.get(p, 0) + c
                i += 2 if syms[i] == syms[i + 1] else 1
        if not pc_:
            break
        (l, r), cnt = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append({"rank": rank, "left": l, "right": r,
                     "pair_count": cnt})
        joined = l + r
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    tbl = pa.Table.from_pylist(rows, schema=pa.schema(
        [("rank", pa.int64()), ("left", pa.string()),
         ("right", pa.string()), ("pair_count", pa.int64())]))
    path = os.path.join(corpus, "gold_bpe_merges.parquet")
    pq.write_table(tbl, path)
    return path


def write_bpe_apply_gold(corpus: str, documents_path: str,
                         n_merges: int = 20) -> str:
    """Straight-line BPE apply — gold for ``ops.textstats.bpe_apply``
    over the merges of :func:`write_bpe_gold` (read back from its
    parquet so the two golds share one merge table): per doc, lowercase
    [a-z0-9]+ words, rank-ordered merges per word, piece/word counts."""
    merges_path = os.path.join(corpus, "gold_bpe_merges.parquet")
    if not os.path.exists(merges_path):
        write_bpe_gold(corpus, documents_path, n_merges)
    mt = pq.read_table(merges_path)
    ranked = list(zip(mt.column("left").to_pylist(),
                      mt.column("right").to_pylist()))
    import re

    def apply_word(w):
        syms = list(w)
        for l, r in ranked:
            i, out = 0, []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
            if len(syms) == 1:
                break
        return len(syms)

    cache: dict[str, int] = {}
    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    out_rows = []
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        words = re.findall(r"[a-z0-9]+", (txt or "").lower())
        n_p = 0
        for w in words:
            if w not in cache:
                cache[w] = apply_word(w)
            n_p += cache[w]
        out_rows.append({"doc_id": did, "n_pieces": n_p,
                         "n_words": len(words)})
    tbl = pa.Table.from_pylist(out_rows, schema=pa.schema(
        [("doc_id", pa.int64()), ("n_pieces", pa.int64()),
         ("n_words", pa.int64())]))
    path = os.path.join(corpus, "gold_bpe_pieces.parquet")
    pq.write_table(tbl, path)
    return path


def write_pagerank_gold(corpus: str, damping: float = 0.85, iters: int = 10,
                        round_digits: int = 9) -> str:
    """Straight-line PageRank over the sentence co-occurrence pair graph
    — the gold for the distributed ``ops.graph.pagerank`` (spec: edges =
    DISTINCT directed (norm_a, norm_b) pairs co-mentioned in a sentence;
    uniform init; dangling mass redistributed uniformly; every rank
    rounded with the SAME np.round kernel as ``ops.graph._round_vec`` at
    ``round_digits`` after each iteration — the block-layout-invariance
    grain; np.round is elementwise-deterministic, so scalar-at-a-time
    here bit-matches the engine's whole-column call)."""
    import collections

    def _r(x: float) -> float:
        return float(np.round(np.float64(x), round_digits))

    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"),
                       columns=["conv_id", "turn_idx", "sent_idx", "norm"])
    sent_norms: dict = collections.defaultdict(set)
    for c, t, s, n in zip(gm.column("conv_id").to_pylist(),
                          gm.column("turn_idx").to_pylist(),
                          gm.column("sent_idx").to_pylist(),
                          gm.column("norm").to_pylist()):
        sent_norms[(c, t, s)].add(n)
    pairs: set = set()
    for norms in sent_norms.values():
        ns = sorted(norms)
        for a in ns:
            for b in ns:
                if a != b:
                    pairs.add((a, b))
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    n = len(nodes)
    deg = collections.Counter(a for a, _ in pairs)
    rank = {v: _r(1.0 / n) for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if deg.get(v, 0) == 0)
        inc: dict = collections.defaultdict(float)
        for a, b in sorted(pairs):
            inc[b] += rank[a] / deg[a]
        rank = {v: _r(base + damping * (inc.get(v, 0.0) + dangling / n))
                for v in nodes}
    tbl = pa.Table.from_arrays(
        [pa.array(nodes, pa.string()),
         pa.array([rank[v] for v in nodes], pa.float64())],
        names=["norm", "rank"])
    path = os.path.join(corpus, "gold_pagerank.parquet")
    pq.write_table(tbl, path)
    return path


def write_ppr_gold(corpus: str, seeds=("zetamycin", "actozine",
                                       "arvel syndrome"),
                   damping: float = 0.85, iters: int = 10,
                   round_digits: int = 9) -> str:
    """Straight-line PERSONALIZED PageRank over the sentence
    co-occurrence pair graph — the gold for seeded
    ``ops.graph.pagerank``: teleport and dangling mass land uniformly on
    the seed set (Haveliwala 2002); same pair spec, init = the teleport
    vector, same np.round-per-iteration grain as the uniform gold."""
    import collections

    def _r(x: float) -> float:
        return float(np.round(np.float64(x), round_digits))

    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"),
                       columns=["conv_id", "turn_idx", "sent_idx", "norm"])
    sent_norms: dict = collections.defaultdict(set)
    for c, t, s, n in zip(gm.column("conv_id").to_pylist(),
                          gm.column("turn_idx").to_pylist(),
                          gm.column("sent_idx").to_pylist(),
                          gm.column("norm").to_pylist()):
        sent_norms[(c, t, s)].add(n)
    pairs: set = set()
    for norms in sent_norms.values():
        ns = sorted(norms)
        for a in ns:
            for b in ns:
                if a != b:
                    pairs.add((a, b))
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    seedset = set(seeds) & set(nodes)
    n_seeds = len(seedset)
    deg = collections.Counter(a for a, _ in pairs)
    tele = {v: (1.0 / n_seeds if v in seedset else 0.0) for v in nodes}
    rank = {v: _r(tele[v]) for v in nodes}
    d = damping
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if deg.get(v, 0) == 0)
        inc: dict = collections.defaultdict(float)
        for a, b in sorted(pairs):
            inc[b] += rank[a] / deg[a]
        rank = {v: _r((1.0 - d) * tele[v]
                      + d * (inc.get(v, 0.0) + dangling * tele[v]))
                for v in nodes}
    tbl = pa.Table.from_arrays(
        [pa.array(nodes, pa.string()),
         pa.array([rank[v] for v in nodes], pa.float64())],
        names=["norm", "rank"])
    path = os.path.join(corpus, "gold_ppr.parquet")
    pq.write_table(tbl, path)
    return path


def write_eigencentrality_gold(corpus: str, iters: int = 20,
                               round_digits: int = 9) -> str:
    """Straight-line eigenvector centrality over the WEIGHTED sentence
    co-occurrence graph — the gold for the distributed
    ``ops.graph.eigencentrality`` (spec: edges = directed (norm_a,
    norm_b) pairs with weight = number of sentences co-mentioning them;
    x0 = uniform unit vector; per iteration the IDENTITY-SHIFTED step
    x <- (A + I) x / ||(A + I) x||_2 — same eigenvectors, kills
    bipartite period-2 oscillation — every score re-rounded with the
    same np.round kernel as ``ops.graph._round_vec`` — the
    block-layout-invariance grain)."""
    import collections

    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"),
                       columns=["conv_id", "turn_idx", "sent_idx", "norm"])
    sent_norms: dict = collections.defaultdict(set)
    for c, t, s, n in zip(gm.column("conv_id").to_pylist(),
                          gm.column("turn_idx").to_pylist(),
                          gm.column("sent_idx").to_pylist(),
                          gm.column("norm").to_pylist()):
        sent_norms[(c, t, s)].add(n)
    cnt: dict = collections.Counter()
    for norms in sent_norms.values():
        ns = sorted(norms)
        for a in ns:
            for b in ns:
                if a != b:
                    cnt[(a, b)] += 1
    nodes = sorted({a for a, _ in cnt} | {b for _, b in cnt})
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    s = np.array([idx[a] for a, _ in sorted(cnt)], dtype=np.int64)
    d = np.array([idx[b] for _, b in sorted(cnt)], dtype=np.int64)
    w = np.array([cnt[p] for p in sorted(cnt)], dtype=np.float64)
    x = np.full(n, float(np.round(np.float64(1.0 / np.sqrt(n)),
                                  round_digits)))
    for _ in range(iters):
        inc = np.bincount(d, weights=w * x[s], minlength=n) + x
        nrm = float(np.sqrt(np.sum(inc * inc)))
        if nrm == 0.0:
            break
        x = np.round(inc / nrm, round_digits)
    tbl = pa.Table.from_arrays(
        [pa.array(nodes, pa.string()), pa.array(x, pa.float64())],
        names=["norm", "score"])
    path = os.path.join(corpus, "gold_eigencentrality.parquet")
    pq.write_table(tbl, path)
    return path


def write_kcore_gold(corpus: str, k: int = 3) -> str:
    """Straight-line k-core peel over the sentence co-occurrence pair
    graph (same pair spec as :func:`write_pagerank_gold`): repeatedly
    drop nodes with fewer than ``k`` distinct neighbors until stable;
    emit survivors with their in-core degree — the gold for the
    distributed ``ops.graph_analytics.kcore``."""
    import collections

    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"),
                       columns=["conv_id", "turn_idx", "sent_idx", "norm"])
    sent_norms: dict = collections.defaultdict(set)
    for c, t, s, n in zip(gm.column("conv_id").to_pylist(),
                          gm.column("turn_idx").to_pylist(),
                          gm.column("sent_idx").to_pylist(),
                          gm.column("norm").to_pylist()):
        sent_norms[(c, t, s)].add(n)
    adj: dict = collections.defaultdict(set)
    for norms in sent_norms.values():
        ns = sorted(norms)
        for a in ns:
            for b in ns:
                if a != b:
                    adj[a].add(b)
    while True:
        drop = [v for v, nb in adj.items() if len(nb) < k]
        if not drop:
            break
        for v in drop:
            for nb in adj[v]:
                adj[nb].discard(v)
            del adj[v]
    nodes = sorted(adj)
    tbl = pa.Table.from_arrays(
        [pa.array(nodes, pa.string()),
         pa.array([len(adj[v]) for v in nodes], pa.int64())],
        names=["norm", "core_degree"])
    path = os.path.join(corpus, "gold_kcore.parquet")
    pq.write_table(tbl, path)
    return path


def _decode_media_spec(payload: bytes) -> np.ndarray:
    """Spec decode for the media fixture (duplicates StdlibCodec's
    observable behavior straight-line): WAV PCM16 -> float32 / 32768;
    PPM P6 -> float32 luma (0.299 R + 0.587 G + 0.114 B) / maxval."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            raw = w.readframes(w.getnframes())
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    import re

    assert payload[:2] == b"P6"
    # exactly ONE whitespace byte after maxval (PPM spec) — split would
    # eat leading whitespace bytes of the pixel data
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    w_px, h_px, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    pixels = np.frombuffer(payload[m.end(): m.end() + w_px * h_px * 3],
                           dtype=np.uint8)
    rgb = pixels.reshape(-1, 3).astype(np.float32) / float(maxval)
    return 0.299 * rgb[:, 0] + 0.587 * rgb[:, 1] + 0.114 * rgb[:, 2]


def write_media_features_gold(corpus: str, dim: int = 16,
                              round_digits: int = 6) -> str:
    """Straight-line decode + mean-pool + summary over the shared media
    fixture (sources.media_fixture — input generation, not engine code):
    feature = signal padded to a multiple of ``dim``, reshaped (dim, -1),
    mean per row, float32; summary = float64 mean and L2 of that vector,
    Python-rounded at ``round_digits``."""
    from easyner_ray.sources.media_fixture import ensure_media_fixture

    path_in = ensure_media_fixture(corpus)
    t = pq.read_table(path_in)
    ids = t.column("item_id").to_pylist()
    kinds = t.column("kind").to_pylist()
    means, l2s = [], []
    for payload in t.column("payload").to_pylist():
        sig = _decode_media_spec(payload)
        pad = (-len(sig)) % dim
        pooled = np.pad(sig, (0, pad)).reshape(dim, -1).mean(axis=1)
        v = pooled.astype(np.float32).astype(np.float64)
        means.append(round(float(v.mean()), round_digits))
        l2s.append(round(float(np.sqrt((v * v).sum())), round_digits))
    tbl = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(kinds, pa.string()),
         pa.array(means, pa.float64()), pa.array(l2s, pa.float64())],
        names=["item_id", "kind", "feat_mean", "feat_l2"])
    path = os.path.join(corpus, "gold_media_features.parquet")
    pq.write_table(tbl, path)
    return path


def write_contamination_gold(corpus: str, documents_path: str, n: int = 5,
                             modulus: int = 10) -> str:
    """Straight-line train/eval n-gram contamination audit — the gold for
    ``ops.decontam.contamination`` (spec: token = [a-z0-9]+ run of the
    lowercased text; token hash = crc32; n-gram fingerprint = Horner
    polynomial base 1099511628211 mod 2^64; benchmark = docs with
    doc_id % modulus == 0; report = every OTHER doc with >= 1 distinct
    fingerprint shared with the benchmark set, hit counts distinct)."""
    import re

    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    B, M = 1099511628211, (1 << 64) - 1

    def fps(text: str) -> set:
        toks = re.findall(r"[a-z0-9]+", (text or "").lower())
        out: set = set()
        for i in range(len(toks) - n + 1):
            h = 0
            for k in range(n):
                h = (h * B + zlib.crc32(toks[i + k].encode("utf-8"))) & M
            out.add(h)
        return out

    bench: set = set()
    for i, t in zip(ids, texts):
        if i % modulus == 0:
            bench |= fps(t)
    rows = []
    for i, t in zip(ids, texts):
        if i % modulus == 0:
            continue
        hits = len(fps(t) & bench)
        if hits:
            rows.append((i, hits))
    rows.sort()
    tbl = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.int64())],
        names=["doc_id", "n_hits"])
    path = os.path.join(corpus, "gold_contamination.parquet")
    pq.write_table(tbl, path)
    return path


# Bump when any derived-gold kernel changes so cached tables regenerate.
# v2: pagerank rounding grain moved from per-element Python round to the
# vectorized np.round kernel (ops.graph._round_vec).
# v3: langid scores carry the 1e-9 np.round grain (vectorized classifier).
def write_repetition_gold(corpus: str, documents_path: str) -> str:
    """Straight-line per-doc recompute of the Gopher repetition signals
    (spec in ops.textstats.repetition_stats_batch — tokens = str.split,
    lines = non-empty '\\n' segments, exact tuple n-grams instead of the
    engine's rolling hash, coverage union for dup-5grams, round 6)."""
    from collections import Counter

    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(docs.column("doc_id").to_pylist(),
                            docs.column("text").to_pylist()):
        text = text or ""
        toks = text.split()
        tc = sum(len(t) for t in toks) or 1
        out = {"doc_id": doc_id, "dup_line_frac": 0.0,
               "dup_line_char_frac": 0.0, "top_2gram_char_frac": 0.0,
               "top_3gram_char_frac": 0.0, "dup_5gram_char_frac": 0.0}
        lines = [s for s in text.split("\n") if s]
        if lines:
            c = Counter(lines)
            out["dup_line_frac"] = (len(lines) - len(c)) / len(lines)
            den = sum(v * len(k) for k, v in c.items())
            if den:
                out["dup_line_char_frac"] = \
                    sum((v - 1) * len(k) for k, v in c.items()) / den
        for n, col in ((2, "top_2gram_char_frac"), (3, "top_3gram_char_frac")):
            grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            if grams:
                c = Counter(grams)
                m = max(c.values())
                if m >= 2:
                    out[col] = max(v * sum(len(t) for t in k)
                                   for k, v in c.items() if v == m) / tc
        grams = [tuple(toks[i:i + 5]) for i in range(len(toks) - 4)]
        if grams:
            c = Counter(grams)
            cov = np.zeros(len(toks), bool)
            for i, g in enumerate(grams):
                if c[g] >= 2:
                    cov[i:i + 5] = True
            out["dup_5gram_char_frac"] = \
                sum(len(t) for t, v in zip(toks, cov) if v) / tc
        rows.append({k: (round(v, 6) if k != "doc_id" else v)
                     for k, v in out.items()})

    from easyner_ray.ops.textstats import REPETITION_SCHEMA
    cols = [pa.array([r[f.name] for r in rows], f.type)
            for f in REPETITION_SCHEMA]
    path = os.path.join(corpus, "gold_repetition.parquet")
    pq.write_table(pa.Table.from_arrays(cols, schema=REPETITION_SCHEMA), path)
    return path


_GOLD_V = 3
_BASE_GOLD = {"gold_sentences.parquet", "gold_mentions.parquet"}


def _check_gold_version(corpus: str) -> None:
    """Delete stale derived-gold parquet (NOT the synthetic-generator
    base golds) when the kernel version marker doesn't match."""
    import glob
    import json

    vpath = os.path.join(corpus, "_gold_version.json")
    try:
        with open(vpath) as f:
            if json.load(f).get("v") == _GOLD_V:
                return
    except (FileNotFoundError, ValueError):
        pass
    for p in glob.glob(os.path.join(corpus, "gold_*.parquet")):
        if os.path.basename(p) not in _BASE_GOLD:
            os.remove(p)
    with open(vpath, "w") as f:
        json.dump({"v": _GOLD_V}, f)


def ensure_derived_gold(corpus: str, documents_path: str | None = None,
                        embeddings_path: str | None = None,
                        events_path: str | None = None) -> None:
    """Idempotently write every derived gold table missing from ``corpus``
    (stale-kernel tables are invalidated first via the version marker)."""
    _check_gold_version(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_resolved_mentions.parquet")):
        write_resolved_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_disambiguated.parquet")):
        write_disambiguated_gold(corpus)
    if documents_path and os.path.exists(documents_path):
        if not os.path.exists(os.path.join(corpus, "gold_simhash_pairs.parquet")):
            write_doc_gold(corpus, documents_path)
        if not os.path.exists(os.path.join(corpus, "gold_minhash_pairs.parquet")):
            write_minhash_gold(corpus, documents_path)
        if not os.path.exists(os.path.join(corpus, "gold_langid.parquet")):
            write_langid_gold(corpus, documents_path)
        if not os.path.exists(os.path.join(corpus, "gold_contamination.parquet")):
            write_contamination_gold(corpus, documents_path)
        if not os.path.exists(os.path.join(corpus, "gold_repetition.parquet")):
            write_repetition_gold(corpus, documents_path)
        if not os.path.exists(os.path.join(corpus, "gold_minhash_incremental.parquet")):
            write_minhash_incremental_gold(corpus, documents_path)
        if not os.path.exists(os.path.join(corpus, "gold_dup_span.parquet")):
            write_dup_span_gold(corpus, documents_path)
        if not os.path.exists(os.path.join(corpus, "gold_bpe_merges.parquet")):
            write_bpe_gold(corpus, documents_path)
        if not os.path.exists(os.path.join(corpus, "gold_bpe_pieces.parquet")):
            write_bpe_apply_gold(corpus, documents_path)
    if embeddings_path and os.path.exists(embeddings_path):
        if not os.path.exists(os.path.join(corpus, "gold_cosine_lsh_pairs.parquet")):
            write_cosine_lsh_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_knn_ivf.parquet")):
            write_knn_ivf_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(
                corpus, "gold_knn_ivf_incremental.parquet")):
            write_knn_ivf_incremental_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_knn_self.parquet")):
            write_knn_self_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_kmeans_assign.parquet")):
            write_kmeans_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_semdedup.parquet")):
            write_semdedup_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_outlier_filter.parquet")):
            write_outlier_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_rp_reduce.parquet")):
            write_rp_reduce_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_pca.parquet")):
            write_pca_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_hard_negatives.parquet")):
            write_hard_negatives_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_kcenter.parquet")):
            write_kcenter_gold(corpus, embeddings_path)
        if not os.path.exists(os.path.join(corpus, "gold_triplets.parquet")):
            write_triplets_gold(corpus, embeddings_path)
    if not os.path.exists(os.path.join(corpus, "gold_media_features.parquet")):
        write_media_features_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_pagerank.parquet")):
        write_pagerank_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_random_walks.parquet")):
        write_random_walks_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_kcore.parquet")):
        write_kcore_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_eigencentrality.parquet")):
        write_eigencentrality_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_ppr.parquet")):
        write_ppr_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_betweenness.parquet")):
        write_betweenness_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_bridges.parquet")):
        write_bridges_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_shortest_paths.parquet")):
        write_shortest_path_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_hits.parquet")):
        write_hits_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_compression.parquet")):
        write_compression_gold(corpus)
    if not os.path.exists(os.path.join(corpus, "gold_conv_minhash.parquet")):
        write_conv_minhash_gold(corpus)
    if events_path and os.path.exists(events_path):
        if not os.path.exists(os.path.join(corpus, "gold_approx_distinct.parquet")):
            write_approx_distinct_gold(corpus, events_path)
        if not os.path.exists(os.path.join(corpus, "gold_cms_counts.parquet")):
            write_cms_gold(corpus, events_path)
        if not os.path.exists(os.path.join(
                corpus, "gold_markov_stationary.parquet")):
            write_markov_stationary_gold(corpus, events_path)
        if not os.path.exists(os.path.join(
                corpus, "gold_rolling_zscore.parquet")):
            write_rolling_zscore_gold(corpus, events_path)


def write_betweenness_gold(corpus: str, round_digits: int = 4) -> str:
    """Straight-line textbook Brandes (2001) betweenness over the
    sentence co-occurrence pair graph — the gold for the distributed
    ``ops.graph_analytics.betweenness`` (spec: edges = DISTINCT directed
    (norm_a, norm_b) pairs co-mentioned in a sentence — the symmetric
    set, so scores are undirected betweenness x2; scores rounded
    half-away at ``round_digits`` with the same formula as the engine's
    ``_round_away``). Deliberately the queue-and-stack scalar loop, not
    the engine's level-vectorized kernel."""
    import collections

    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"),
                       columns=["conv_id", "turn_idx", "sent_idx", "norm"])
    sent_norms: dict = collections.defaultdict(set)
    for c, t, s, n in zip(gm.column("conv_id").to_pylist(),
                          gm.column("turn_idx").to_pylist(),
                          gm.column("sent_idx").to_pylist(),
                          gm.column("norm").to_pylist()):
        sent_norms[(c, t, s)].add(n)
    adj: dict = collections.defaultdict(set)
    for norms in sent_norms.values():
        ns = sorted(norms)
        for a in ns:
            for b in ns:
                if a != b:
                    adj[a].add(b)
    nodes = sorted(adj)
    score = {v: 0.0 for v in nodes}
    for root in nodes:
        stack = []
        preds: dict = {v: [] for v in nodes}
        sigma = {v: 0.0 for v in nodes}
        dist = {v: -1 for v in nodes}
        sigma[root] = 1.0
        dist[root] = 0
        queue = collections.deque([root])
        while queue:
            v = queue.popleft()
            stack.append(v)
            for w in sorted(adj[v]):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    queue.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != root:
                score[w] += delta[w]
    s = 10.0 ** round_digits
    vals = [float(np.copysign(np.floor(abs(score[v] * s) + 0.5),
                              score[v]) / s) for v in nodes]
    tbl = pa.Table.from_arrays(
        [pa.array(nodes, pa.string()), pa.array(vals, pa.float64())],
        names=["norm", "betweenness"])
    path = os.path.join(corpus, "gold_betweenness.parquet")
    pq.write_table(tbl, path)
    return path


def write_bridges_gold(corpus: str) -> str:
    """Straight-line DEFINITIONAL bridge finder over the sentence
    co-occurrence pair graph — the gold for the distributed
    ``ops.graph_analytics.bridges``: an undirected edge (a, b) is a
    bridge iff b is unreachable from a after removing exactly that edge
    (one plain BFS per edge — O(E * (V + E)), deliberately NOT Tarjan,
    so the two implementations share no algorithmic structure)."""
    import collections

    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"),
                       columns=["conv_id", "turn_idx", "sent_idx", "norm"])
    sent_norms: dict = collections.defaultdict(set)
    for c, t, s, n in zip(gm.column("conv_id").to_pylist(),
                          gm.column("turn_idx").to_pylist(),
                          gm.column("sent_idx").to_pylist(),
                          gm.column("norm").to_pylist()):
        sent_norms[(c, t, s)].add(n)
    adj: dict = collections.defaultdict(set)
    for norms in sent_norms.values():
        for a in norms:
            for b in norms:
                if a != b:
                    adj[a].add(b)
    und = sorted({(min(a, b), max(a, b))
                  for a, nbrs in adj.items() for b in nbrs})
    out_a, out_b = [], []
    for a, b in und:
        seen = {a}
        queue = collections.deque([a])
        found = False
        while queue and not found:
            u = queue.popleft()
            for w in adj[u]:
                if (min(u, w), max(u, w)) == (a, b):
                    continue          # the removed edge, either direction
                if w == b:
                    found = True
                    break
                if w not in seen:
                    seen.add(w)
                    queue.append(w)
        if not found:
            out_a.append(a)
            out_b.append(b)
    tbl = pa.Table.from_arrays(
        [pa.array(out_a, pa.string()), pa.array(out_b, pa.string())],
        names=["norm_a", "norm_b"])
    path = os.path.join(corpus, "gold_bridges.parquet")
    pq.write_table(tbl, path)
    return path


def write_shortest_path_gold(corpus: str,
                             seeds=("zetamycin", "actozine")) -> str:
    """Straight-line shortest-path-with-reconstruction gold for
    ``ops.graph_analytics.shortest_paths`` (spec: hop distance from each
    seed over the sentence co-occurrence pair graph; each node's
    predecessor is the lexicographically smallest entity among its
    distance-(d-1) neighbors; path rendered ``seed -> ... -> node``).
    Deliberately dict-and-deque scalar BFS + per-node pred walk — no
    structure shared with the engine's vectorized level kernels."""
    import collections

    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"),
                       columns=["conv_id", "turn_idx", "sent_idx", "norm"])
    sent_norms: dict = collections.defaultdict(set)
    for c, t, s, n in zip(gm.column("conv_id").to_pylist(),
                          gm.column("turn_idx").to_pylist(),
                          gm.column("sent_idx").to_pylist(),
                          gm.column("norm").to_pylist()):
        sent_norms[(c, t, s)].add(n)
    adj: dict = collections.defaultdict(set)
    for norms in sent_norms.values():
        for a in norms:
            for b in norms:
                if a != b:
                    adj[a].add(b)
    rows = []
    for seed in sorted(set(seeds)):
        if seed not in adj:
            continue
        dist = {seed: 0}
        queue = collections.deque([seed])
        while queue:
            u = queue.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    queue.append(w)
        pred = {}
        for w, dw in dist.items():
            if dw == 0:
                continue
            pred[w] = min(u for u in adj[w]
                          if dist.get(u, -1) == dw - 1)
        for w in sorted(dist):
            chain = [w]
            while chain[0] != seed:
                chain.insert(0, pred[chain[0]])
            rows.append((seed, w, dist[w], " -> ".join(chain)))
    tbl = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.string()),
         pa.array([r[1] for r in rows], pa.string()),
         pa.array([r[2] for r in rows], pa.int64()),
         pa.array([r[3] for r in rows], pa.string())],
        names=["seed", "norm", "hops", "path"])
    path = os.path.join(corpus, "gold_shortest_paths.parquet")
    pq.write_table(tbl, path)
    return path


def write_hits_gold(corpus: str, iters: int = 20,
                    round_digits: int = 9) -> str:
    """Straight-line HITS (Kleinberg 1999) over the DIRECTED
    turn-transition entity graph — the gold for the distributed
    ``ops.graph.hits`` over ``graph_analytics.transition_edges`` (spec:
    edges = (a, b) with a mentioned in turn t, b in turn t+1 of the same
    conversation, a != b, weight = number of (conv, turn) adjacency
    instances; h0 = a0 = uniform unit vector; per iteration a <- A^T h
    then h <- A a, each L2-normalized and re-rounded with the same
    np.round kernel as ``ops.graph._round_vec``)."""
    import collections

    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"),
                       columns=["conv_id", "turn_idx", "norm"])
    turn_norms: dict = collections.defaultdict(set)
    for c, t, n in zip(gm.column("conv_id").to_pylist(),
                       gm.column("turn_idx").to_pylist(),
                       gm.column("norm").to_pylist()):
        turn_norms[(c, t)].add(n)
    cnt: dict = collections.Counter()
    for (c, t), norms in turn_norms.items():
        nxt = turn_norms.get((c, t + 1))
        if not nxt:
            continue
        for a in sorted(norms):
            for b in sorted(nxt):
                if a != b:
                    cnt[(a, b)] += 1
    nodes = sorted({a for a, _ in cnt} | {b for _, b in cnt})
    n = len(nodes)
    if n == 0:
        tbl = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.float64()),
             pa.array([], pa.float64())],
            names=["norm", "hub", "authority"])
        path = os.path.join(corpus, "gold_hits.parquet")
        pq.write_table(tbl, path)
        return path
    idx = {v: i for i, v in enumerate(nodes)}
    s = np.array([idx[a] for a, _ in sorted(cnt)], dtype=np.int64)
    d = np.array([idx[b] for _, b in sorted(cnt)], dtype=np.int64)
    w = np.array([cnt[p] for p in sorted(cnt)], dtype=np.float64)
    init = float(np.round(np.float64(1.0 / np.sqrt(n)), round_digits))
    h = np.full(n, init)
    a = np.full(n, init)
    for _ in range(iters):
        inc_a = np.bincount(d, weights=w * h[s], minlength=n)
        na = float(np.sqrt(np.sum(inc_a * inc_a)))
        if na == 0.0:
            break
        a = np.round(inc_a / na, round_digits)
        inc_h = np.bincount(s, weights=w * a[d], minlength=n)
        nh = float(np.sqrt(np.sum(inc_h * inc_h)))
        if nh == 0.0:
            break
        h = np.round(inc_h / nh, round_digits)
    tbl = pa.Table.from_arrays(
        [pa.array(nodes, pa.string()), pa.array(h, pa.float64()),
         pa.array(a, pa.float64())],
        names=["norm", "hub", "authority"])
    path = os.path.join(corpus, "gold_hits.parquet")
    pq.write_table(tbl, path)
    return path


def write_rp_reduce_gold(corpus: str, embeddings_path: str,
                         out_dim: int = 16, seed: int = 7,
                         round_digits: int = 6) -> str:
    """Straight-line random-projection reduce — the gold for
    ``ops.similarity.rp_reduce`` (spec: Achlioptas +-1/0 matrix from
    splitmix64 over seed*2^32 + flat index, FIXED-ORDER accumulation
    over input dims j = 0..d-1, sqrt(3)/sqrt(k) scale, np.round grain).
    The projection matrix is rebuilt here from the shared splitmix64
    finalizer (a pinned constant function, like the rounding kernels);
    the accumulation loop is an independent single-process recompute."""
    from easyner_ray.ops.sketch import splitmix64

    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n, d = x.shape
    idx = (np.arange(d * out_dim, dtype=np.uint64)
           + (np.uint64(seed) << np.uint64(32)))
    u = splitmix64(idx) % np.uint64(6)
    r = np.zeros(d * out_dim, dtype=np.float64)
    r[u == 0] = 1.0
    r[u == 1] = -1.0
    r = r.reshape(d, out_dim)
    acc = np.zeros((n, out_dim), dtype=np.float64)
    for j in range(d):
        nz = r[j] != 0.0
        if nz.any():
            acc[:, nz] += x[:, j:j + 1] * r[j, nz]
    y = np.round(acc * (np.sqrt(3.0) / np.sqrt(float(out_dim))),
                 round_digits)
    tbl = pa.Table.from_arrays(
        [pa.array(np.repeat(np.array(ids, dtype=np.int64), out_dim)),
         pa.array(np.tile(np.arange(out_dim, dtype=np.int64), n)),
         pa.array(y.reshape(-1), pa.float64())],
        names=["vec_id", "dim_idx", "value"])
    path = os.path.join(corpus, "gold_rp_reduce.parquet")
    pq.write_table(tbl, path)
    return path


def write_compression_gold(corpus: str, level: int = 6) -> str:
    """Straight-line zlib compressibility recompute over the transcript
    corpus: assemble each conversation's turn texts in turn order
    (joined by newline, the engine's assemble_conversations contract),
    then raw UTF-8 size vs zlib level-6 DEFLATE size. Same zlib build as
    the engine, so sizes are byte-identical."""
    import zlib

    import pandas as pd

    tr = pq.read_table(os.path.join(corpus, "transcripts.parquet"),
                       columns=["conv_id", "turn_idx", "text"]).to_pandas()
    tr = tr.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = tr.groupby("conv_id", sort=True)
    conv_ids, n_turns, raw_b, comp_b = [], [], [], []
    for cid, grp in g:
        text = "\n".join(x or "" for x in grp["text"])
        b = text.encode("utf-8")
        conv_ids.append(cid)
        n_turns.append(len(grp))
        raw_b.append(len(b))
        comp_b.append(len(zlib.compress(b, level)))
    tbl = pa.Table.from_arrays(
        [pa.array(conv_ids, pa.string()),
         pa.array(n_turns, pa.int64()),
         pa.array(raw_b, pa.int64()),
         pa.array(comp_b, pa.int64())],
        names=["conv_id", "n_turns", "raw_bytes", "comp_bytes"])
    path = os.path.join(corpus, "gold_compression.parquet")
    pq.write_table(tbl, path)
    return path


def write_conv_minhash_gold(corpus: str, threshold: float = 0.5,
                            n_perm: int = 64, n_bands: int = 16, k: int = 3,
                            seed: int = 17, hot_cap: int = 500) -> str:
    """Straight-line MinHash-LSH recompute at CONVERSATION granularity:
    assemble each dialog's turn texts in turn order (newline-joined, the
    assemble_conversations contract), id = the numeric conv suffix, then
    the exact same signature/banding spec as :func:`write_minhash_gold`.
    Output: (conv_a, conv_b, est_jaccard), ids int64."""
    import pandas as pd

    tr = pq.read_table(os.path.join(corpus, "transcripts.parquet"),
                       columns=["conv_id", "turn_idx", "text"]).to_pandas()
    tr = tr.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = tr.groupby("conv_id", sort=True)
    ids, texts = [], []
    for cid, grp in g:
        ids.append(int(cid[4:]))
        texts.append("\n".join(x or "" for x in grp["text"]))

    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
    rows = n_perm // n_bands

    def shingles(text: str) -> list[str]:
        toks = text.split()
        if len(toks) < k:
            return [" ".join(toks)] if toks else []
        return sorted({" ".join(toks[i: i + k])
                       for i in range(len(toks) - k + 1)})

    sigs: list[np.ndarray] = []
    buckets: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        sh = shingles(t or "")
        if not sh:
            sig = np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            h = np.array([zlib.crc32(s.encode()) for s in sh],
                         dtype=np.uint64)
            sig = ((h[:, None] * a[None, :] + b[None, :])
                   % _MINHASH_MERSENNE).min(axis=0)
        sigs.append(sig)
        for bi in range(n_bands):
            chunk = sig[bi * rows: (bi + 1) * rows].tobytes()
            buckets.setdefault(f"{bi}:{zlib.crc32(chunk):08x}",
                               []).append(i)

    best: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        if len(members) < 2 or len(members) > hot_cap:
            continue
        order = sorted(members, key=lambda i: ids[i])
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    key = (ids[i], ids[j])
                    if est > best.get(key, -1.0):
                        best[key] = est

    keys = sorted(best)
    tbl = pa.Table.from_arrays(
        [pa.array([x for x, _ in keys], pa.int64()),
         pa.array([y for _, y in keys], pa.int64()),
         pa.array([best[kk] for kk in keys], pa.float64())],
        names=["conv_a", "conv_b", "est_jaccard"])
    path = os.path.join(corpus, "gold_conv_minhash.parquet")
    pq.write_table(tbl, path)
    return path


def write_pca_gold(corpus: str, embeddings_path: str, k: int = 4,
                   q_bits: int = 18, round_digits: int = 9,
                   proj_round: int = 6) -> str:
    """Straight-line top-k PCA recompute over the embeddings table — the
    gold for ``ops.similarity.pca_project`` (spec: inputs quantized once
    to the 2^q_bits integer grid so every moment is EXACT integer
    arithmetic and block layout cannot move a bit; covariance from the
    exact moments rounded at round_digits; eigh; eigenvectors sign-fixed
    to largest-|coordinate| positive; fixed-order centered projection
    kernel at proj_round). The moment summation order here differs from
    the distributed partials on purpose — exactness, not a rounding
    grain, is what makes them identical."""
    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").combine_chunks(), dtype=np.int64)
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n, d = x.shape
    q = float(1 << q_bits)
    xq = np.rint(x * q)
    s_q = xq.sum(axis=0)
    ss_q = xq.T @ xq
    mean = np.round((s_q / q) / n, round_digits)
    exx = (ss_q / (q * q)) / n
    cov = np.round(exx - np.outer(s_q / q / n, s_q / q / n), round_digits)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:k]
    v = evecs[:, order]
    for c in range(v.shape[1]):
        j = int(np.argmax(np.abs(v[:, c])))
        if v[j, c] < 0:
            v[:, c] = -v[:, c]
    v = np.round(v, round_digits)
    acc = np.zeros((n, k), dtype=np.float64)
    for j in range(d):
        acc += (x[:, j:j + 1] - mean[j]) * v[j]
    y = np.round(acc, proj_round)
    tbl = pa.Table.from_arrays(
        [pa.array(np.repeat(ids, k)),
         pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
         pa.array(y.reshape(-1), pa.float64())],
        names=["vec_id", "dim_idx", "value"])
    path = os.path.join(corpus, "gold_pca.parquet")
    pq.write_table(tbl, path)
    return path


def write_random_walks_gold(corpus: str, walks_per_node: int = 2,
                            walk_len: int = 4, seed: int = 7) -> str:
    """Straight-line deterministic walk corpus over the sentence
    co-occurrence pair graph — the gold for
    ``ops.graph_analytics.random_walks`` (spec: edges = DISTINCT
    directed (norm_a, norm_b) pairs co-mentioned in a sentence; nodes
    integer-coded by sorted-string rank; neighbor lists sorted by that
    rank; step s of walk w at node c picks neighbor
    splitmix64((c<<24) ^ (w<<12) ^ s ^ (seed<<48)) % deg(c); sinks stay
    put). All-integer arithmetic, so this scalar recompute bit-matches
    the engine's vectorized kernel exactly."""
    import collections

    from easyner_ray.ops.sketch import splitmix64

    gm = pq.read_table(os.path.join(corpus, "gold_mentions.parquet"),
                       columns=["conv_id", "turn_idx", "sent_idx", "norm"])
    sent_norms: dict = collections.defaultdict(set)
    for c, t, s, n in zip(gm.column("conv_id").to_pylist(),
                          gm.column("turn_idx").to_pylist(),
                          gm.column("sent_idx").to_pylist(),
                          gm.column("norm").to_pylist()):
        sent_norms[(c, t, s)].add(n)
    pairs: set = set()
    for norms in sent_norms.values():
        ns = sorted(norms)
        for x in ns:
            for y in ns:
                if x != y:
                    pairs.add((x, y))
    nodes = sorted({x for x, _ in pairs} | {y for _, y in pairs})
    code = {v: i for i, v in enumerate(nodes)}
    adj: dict = collections.defaultdict(list)
    for x, y in pairs:
        adj[code[x]].append(code[y])
    for v in adj:
        adj[v].sort()

    def pick(c: int, w: int, s: int) -> int:
        key = np.uint64((c << 24) ^ (w << 12) ^ s ^ (seed << 48))
        h = int(splitmix64(np.array([key], dtype=np.uint64))[0])
        return adj[c][h % len(adj[c])]

    starts, wids, steps, out_nodes = [], [], [], []
    for v in range(len(nodes)):
        for w in range(walks_per_node):
            cur = v
            for s in range(walk_len + 1):
                if s > 0:
                    cur = pick(cur, w, s) if adj.get(cur) else cur
                starts.append(nodes[v])
                wids.append(w)
                steps.append(s)
                out_nodes.append(nodes[cur])
    tbl = pa.Table.from_arrays(
        [pa.array(starts, pa.string()), pa.array(wids, pa.int64()),
         pa.array(steps, pa.int64()), pa.array(out_nodes, pa.string())],
        names=["start", "walk_id", "step", "node"])
    path = os.path.join(corpus, "gold_random_walks.parquet")
    pq.write_table(tbl, path)
    return path


def write_hard_negatives_gold(corpus: str, embeddings_path: str,
                              round_digits: int = 9) -> str:
    """Straight-line hard-negative recompute (spec:
    ops.similarity.hard_negatives — cosine over L2-normalized vectors
    rounded to ``round_digits`` before an argmax whose ties break to the
    smallest neg_id; the float score is dropped, same ulp rationale as
    write_knn_self_gold). Output: (vec_id, label, neg_id, neg_label),
    int64 throughout."""
    emb = pq.read_table(embeddings_path,
                        columns=["vec_id", "embedding", "label"])
    ids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    labels = np.asarray(emb.column("label").to_pylist(),
                        dtype=np.int64)[order]
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in emb.column("embedding").to_pylist()])[order]
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    mat = mat / nrm
    sim = np.round(mat @ mat.T, round_digits)
    sim[labels[:, None] == labels[None, :]] = -np.inf
    has = np.isfinite(sim).any(axis=1)
    best = sim.argmax(axis=1)
    tbl = pa.Table.from_arrays(
        [pa.array(ids[has], pa.int64()),
         pa.array(labels[has], pa.int64()),
         pa.array(ids[best[has]], pa.int64()),
         pa.array(labels[best[has]], pa.int64())],
        names=["vec_id", "label", "neg_id", "neg_label"])
    path = os.path.join(corpus, "gold_hard_negatives.parquet")
    pq.write_table(tbl, path)
    return path


def write_kcenter_gold(corpus: str, embeddings_path: str, k: int = 16,
                       round_digits: int = 9, out_round: int = 4) -> str:
    """Straight-line greedy k-center recompute (spec:
    ops.similarity.kcenter_select — seed at the smallest id, then
    farthest-point steps on min squared Euclidean distance rounded to
    ``round_digits``, ties to the smallest id). Output:
    (rank, vec_id, dist)."""
    emb = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in emb.column("embedding").to_pylist()])[order]
    n = len(ids)
    k = min(k, n)
    sel = [0]                       # ids are sorted: index 0 = min id
    dists = [0.0]
    x2 = (mat * mat).sum(axis=1)
    for _ in range(k - 1):
        cm = mat[sel]
        d2 = np.maximum(
            x2[:, None] - 2.0 * (mat @ cm.T)
            + (cm * cm).sum(axis=1)[None, :], 0.0)
        mind = np.round(d2.min(axis=1), round_digits)
        mind[sel] = -np.inf
        top = mind.max()
        if not np.isfinite(top):
            break
        cand = np.flatnonzero(mind == top)
        j = int(cand[ids[cand].argmin()])
        sel.append(j)
        dists.append(float(top))
    tbl = pa.Table.from_arrays(
        [pa.array(np.arange(1, len(sel) + 1), pa.int64()),
         pa.array(ids[sel], pa.int64()),
         pa.array([round(d, out_round) for d in dists], pa.float64())],
        names=["rank", "vec_id", "dist"])
    path = os.path.join(corpus, "gold_kcenter.parquet")
    pq.write_table(tbl, path)
    return path


def write_markov_stationary_gold(corpus: str, events_path: str) -> str:
    """Straight-line recompute of the user-behavior Markov stationary
    distribution (spec: pipelines.queries.events_markov_stationary —
    per-user consecutive transitions ordered by (ts, event_id),
    row-normalized with uniform dangling rows, 50 power iterations from
    uniform with round-9 per step, output rounded to 4)."""
    ev = pq.read_table(events_path,
                       columns=["user_id", "ts", "event_id", "event_type"])
    import numpy as np
    import pandas as pd
    df = ev.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                    kind="mergesort").reset_index(drop=True)
    same_user = df["user_id"].values[1:] == df["user_id"].values[:-1]
    a = df["event_type"].values[:-1][same_user]
    b = df["event_type"].values[1:][same_user]
    types = sorted(set(a) | set(b))
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    mat = np.zeros((k, k))
    for s, d in zip(a, b):
        mat[idx[s], idx[d]] += 1
    rs = mat.sum(axis=1, keepdims=True)
    p = np.where(rs > 0, mat / np.where(rs == 0, 1.0, rs), 1.0 / k)
    x = np.round(np.full(k, 1.0 / k), 9)
    for _ in range(50):
        x = np.round(x @ p, 9)
    tbl = pa.Table.from_arrays(
        [pa.array(types, pa.string()),
         pa.array(np.round(x, 4), pa.float64())],
        names=["event_type", "stationary_p"])
    path = os.path.join(corpus, "gold_markov_stationary.parquet")
    pq.write_table(tbl, path)
    return path


def write_triplets_gold(corpus: str, embeddings_path: str,
                        round_digits: int = 9) -> str:
    """Straight-line batch-hard triplet recompute (spec:
    ops.similarity.triplet_mining — round-then-argmax on cosine, pos =
    hardest same-label excluding self, neg = hardest different-label,
    min-id ties, scores dropped). Output: (vec_id, label, pos_id,
    neg_id)."""
    emb = pq.read_table(embeddings_path,
                        columns=["vec_id", "embedding", "label"])
    ids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    labels = np.asarray(emb.column("label").to_pylist(),
                        dtype=np.int64)[order]
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in emb.column("embedding").to_pylist()])[order]
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    mat = mat / nrm
    sim = np.round(mat @ mat.T, round_digits)
    same = labels[:, None] == labels[None, :]
    s_pos = np.where(same, sim, -np.inf)
    np.fill_diagonal(s_pos, -np.inf)
    s_neg = np.where(~same, sim, -np.inf)
    has = np.isfinite(s_pos).any(axis=1) & np.isfinite(s_neg).any(axis=1)
    pos = s_pos.argmax(axis=1)
    neg = s_neg.argmax(axis=1)
    tbl = pa.Table.from_arrays(
        [pa.array(ids[has], pa.int64()), pa.array(labels[has], pa.int64()),
         pa.array(ids[pos[has]], pa.int64()),
         pa.array(ids[neg[has]], pa.int64())],
        names=["vec_id", "label", "pos_id", "neg_id"])
    path = os.path.join(corpus, "gold_triplets.parquet")
    pq.write_table(tbl, path)
    return path


def write_rolling_zscore_gold(corpus: str, events_path: str,
                              k: int = 8) -> str:
    """Straight-line recompute of :func:`events_rolling_zscore`'s spec —
    per user ordered by (ts, event_id), each row's trailing-k frame
    accumulated FROM ZERO, oldest first, in longdouble (the
    ``rolling_mean_exact`` / ``rolling_std_exact`` kinds), sample
    stddev via (s2 - s1^2/n)/(n-1), z in float64, Python round-4.
    Bit-equal to the engine by construction: identical accumulation
    order and precision at every step."""
    ev = pq.read_table(events_path,
                       columns=["user_id", "event_id", "ts", "value"])
    df = ev.to_pandas().sort_values(
        ["user_id", "ts", "event_id"]).reset_index(drop=True)
    out_id, out_m, out_s, out_z = [], [], [], []
    for _, g in df.groupby("user_id", sort=False):
        v = g["value"].to_numpy(dtype=np.float64)
        ids = g["event_id"].to_list()
        for i in range(len(v)):
            j = max(0, i - k + 1)
            s1 = np.longdouble(0)
            s2 = np.longdouble(0)
            cnt = 0
            for p in range(k - 1, -1, -1):      # oldest -> newest
                pos = i - p
                if pos < j:
                    continue
                pv = v[pos]
                s1 = s1 + pv
                s2 = s2 + np.longdouble(1) * pv * pv
                cnt += 1
            cl = np.longdouble(cnt)
            rm = float((s1 / cl).astype(np.float64)) if cnt else None
            if cnt >= 2:
                var = (s2 - s1 * s1 / cl) / (cl - 1)
                rs = float(np.sqrt(np.maximum(var, 0)).astype(np.float64))
                z = (v[i] - rm) / rs
            else:
                rs = None
                z = None
            out_id.append(ids[i])
            # NULL frame heads coalesce to the -999999.0 hash sentinel,
            # mirroring the engine's finish()
            out_m.append(-999999.0 if rm is None else round(rm, 4))
            out_s.append(-999999.0 if rs is None else round(rs, 4))
            out_z.append(-999999.0 if z is None else round(z, 4))
    tbl = pa.Table.from_arrays(
        [pa.array(out_id, pa.int64()), pa.array(out_m, pa.float64()),
         pa.array(out_s, pa.float64()), pa.array(out_z, pa.float64())],
        names=["event_id", "roll_mean", "roll_std", "zscore"])
    path = os.path.join(corpus, "gold_rolling_zscore.parquet")
    pq.write_table(tbl.sort_by("event_id"), path)
    return path
