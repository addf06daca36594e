"""Property-based tests (SURVEY.md §5): explode/reassemble round-trip,
dedup idempotence, matcher/span invariants — hypothesis over the pure
functions (no Ray needed)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

# text made of words + sentence punctuation, with occasional abbreviations
_words = st.lists(
    st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=10),
    min_size=1, max_size=30,
)


@st.composite
def prose(draw):
    words = draw(_words)
    seps = draw(st.lists(st.sampled_from([" ", ". ", "! ", "? ", ", ", " "]),
                         min_size=len(words), max_size=len(words)))
    return "".join(w + s for w, s in zip(words, seps)).strip()


@given(prose())
@settings(max_examples=200, deadline=None)
def test_sentencize_spans_tile_text(text):
    """Every char of the input belongs to exactly one span (per-turn text
    equality by construction)."""
    from easyner_ray.functions.sentencize import sentencize_spans

    spans = sentencize_spans(text)
    if not text:
        assert spans == []
        return
    assert spans[0][0] == 0 and spans[-1][1] == len(text)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2
    assert "".join(text[s:e] for s, e in spans) == text


@given(prose())
@settings(max_examples=200, deadline=None)
def test_sentencize_reassembly_inverse(text):
    from easyner_ray.functions.sentencize import reassemble, sentencize

    parts = sentencize(text)
    got = reassemble([p[1] for p in parts], [p[0] for p in parts], total_len=len(text))
    # reassemble fills stripped trailing whitespace with spaces; compare
    # modulo trailing-space runs per sentence boundary
    assert got.rstrip() == text.rstrip()
    assert len(got) == len(text)


_mention = st.fixed_dictionaries({
    "start": st.integers(0, 80),
    "length": st.integers(1, 10),
    "cls": st.sampled_from(["chemical", "disease", "gene", "species", "cell"]),
})


@st.composite
def mention_lists(draw):
    raw = draw(st.lists(_mention, max_size=12))
    out = []
    for i, m in enumerate(raw):
        out.append({
            "mention_idx": i, "surface": "x", "norm": "x", "cls": m["cls"],
            "start": m["start"], "end": m["start"] + m["length"],
        })
    return out


@given(mention_lists())
@settings(max_examples=200, deadline=None)
def test_conflict_resolution_idempotent_and_nonoverlapping(ms):
    from easyner_ray.functions.conflict import resolve_conflicts

    once = resolve_conflicts(ms)
    twice = resolve_conflicts(once)
    assert once == twice  # O6 idempotence
    for a, b in zip(once, once[1:]):
        assert a["end"] <= b["start"]  # sorted and non-overlapping
    assert [m["mention_idx"] for m in once] == list(range(len(once)))


@given(st.lists(st.text(alphabet=string.ascii_lowercase + " -", min_size=1, max_size=15),
                min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_phrase_matcher_spans_index_text(terms):
    """Every reported span slices the text to the reported surface, and
    matching is insensitive to text casing."""
    from easyner_ray.functions.phrase_match import PhraseMatcher

    matcher = PhraseMatcher([(t, "x") for t in terms])
    text = " ".join(terms).upper()
    for s, e, surf, cls in matcher.find(text):
        assert text[s:e] == surf


@given(st.lists(st.integers(0, 5), min_size=0, max_size=40))
@settings(max_examples=100, deadline=None)
def test_simhash_deterministic_and_permutation_invariant(xs):
    from easyner_ray.ops.dedup import simhash64

    toks = [f"w{v}" for v in xs]
    assert simhash64(toks) == simhash64(toks)
    assert simhash64(toks) == simhash64(list(reversed(toks)))  # bag semantics


@given(st.text(max_size=60))
@settings(max_examples=100, deadline=None)
def test_norm_key_idempotent(s):
    from easyner_ray.functions.tokenize import norm_key

    assert norm_key(norm_key(s)) == norm_key(s)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=0, max_size=50))
def test_popcount_lut_matches_bin_count(vals):
    import numpy as np

    from easyner_ray.ops.dedup import _popcount64

    arr = np.array(vals, dtype=np.uint64)
    got = _popcount64(arr)
    assert got.tolist() == [bin(v).count("1") for v in vals]


@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=8),
                min_size=0, max_size=30))
def test_rolling_fp_is_64bit_and_order_sensitive(tokens):
    from easyner_ray.ops.textstats import rolling_fingerprint

    h = rolling_fingerprint(tokens)
    assert 0 <= h < (1 << 64)
    if len(set(tokens)) >= 2 and tokens != tokens[::-1]:
        # order sensitivity: reversing a non-palindromic sequence changes
        # the hash (collision chance 2^-64 — treated as impossible)
        assert rolling_fingerprint(tokens[::-1]) != h


@given(st.text(alphabet="abcz -,.", min_size=0, max_size=120))
def test_find_term_ids_agrees_with_span_matcher(text):
    """The count-only id path must report exactly the matches the
    span-producing path finds (same multiset of (norm, cls))."""
    from easyner_ray.functions.phrase_match import PhraseMatcher
    from easyner_ray.functions.tokenize import TOKEN_RE, norm_key

    terms = [("ab", "x"), ("ab c", "y"), ("c", "x"), ("z z", "y"), ("ab", "y")]
    m = PhraseMatcher(terms)
    spans = m.find(text)
    want = sorted((norm_key(s_txt), cls) for _, _, s_txt, cls in spans)
    ids = m.find_term_ids(TOKEN_RE.findall(text.lower()))
    got = sorted((m.term_norm[t], m.term_cls[t]) for t in ids)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=40))
def test_dup_groups_union_find_reachability(ray_session, pairs_raw):
    """Union-find groups == brute-force reachability closure."""
    pairs = [(a, b) for a, b in pairs_raw if a != b]
    if not pairs:
        return
    # brute force: BFS components
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    for start in adj:
        seen = {start}
        stack = [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        expected[start] = min(seen)

    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.ops.dedup import dup_groups

    ds = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
        "doc_b": pa.array([b for _, b in pairs], pa.int64()),
    }))
    out = dup_groups(ds).to_pandas()
    got = dict(zip(out.doc_id, out.group_id))
    assert got == expected


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=400),
       st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99, 1.0]))
@settings(max_examples=120, deadline=None)
def test_bin_of_chain_is_total_and_consistent(vals, q):
    """The clamped bin formula used by the quantile refinement: every
    in-range value lands in exactly one bin, and the value at rank
    ceil(q*n) is always a member of the bin the cumulative counts select
    — the self-consistency that makes the refinement exact."""
    import numpy as np

    from easyner_ray.ops.sketch import _bin_of

    v = np.asarray(vals, dtype=np.float64)
    lo, hi = float(v.min()), float(v.max())
    if lo == hi:
        return
    n_bins = 16
    idx = _bin_of(v, lo, hi, n_bins)
    assert ((idx >= 0) & (idx < n_bins)).all()     # total
    counts = np.bincount(idx, minlength=n_bins)
    assert counts.sum() == len(v)                  # every value counted once
    rank = max(1, int(np.ceil(np.float64(q) * len(v))))
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, rank))
    target = np.sort(v, kind="stable")[rank - 1]
    assert _bin_of(np.array([target]), lo, hi, n_bins)[0] == b


@given(st.lists(st.tuples(st.sampled_from("abcd"),
                          st.integers(min_value=0, max_value=50)),
                min_size=1, max_size=200),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=100, deadline=None)
def test_topk_kernel_matches_sorted_head(rows, k):
    """_topk_kernel == sort + per-group head, ranks dense from 1."""
    import pandas as pd
    import pyarrow as pa

    from easyner_ray.ops.relational import _topk_kernel

    t = pa.table({"g": pa.array([g for g, _ in rows], pa.string()),
                  "v": pa.array([float(v) for _, v in rows], pa.float64()),
                  "id": pa.array(list(range(len(rows))), pa.int64())})
    out = _topk_kernel(t, ["g"], "v", k, True, ["id"], "rn").to_pandas()
    df = t.to_pandas().sort_values(["g", "v", "id"],
                                   ascending=[True, False, True])
    df["rn"] = df.groupby("g").cumcount() + 1
    want = df[df["rn"] <= k].reset_index(drop=True)
    got = out.sort_values(["g", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "v", "id", "rn"]],
                                  want[["g", "v", "id", "rn"]])


@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1),
                min_size=1, max_size=300),
       st.sampled_from([0.0, 0.1, 0.5, 1.0]))
@settings(max_examples=100, deadline=None)
def test_hash_sample_formula_stability(keys, rate):
    """The sample predicate is a pure function of the key: subsets sample
    identically, rate 0 keeps nothing, rate 1 keeps everything."""
    import numpy as np

    k = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    h = (k * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    thr = np.uint64(int(rate * (1 << 32)))
    kept = set(np.asarray(keys)[h < thr].tolist())
    if rate == 0.0:
        assert kept == set()
    if rate == 1.0:
        assert kept == set(keys)
    # stability: membership of a key never depends on the other keys
    for sub in (keys[: len(keys) // 2], keys[::2]):
        ks = np.asarray(sub, dtype=np.int64).astype(np.uint64)
        hs = (ks * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        assert set(np.asarray(sub)[hs < thr].tolist()) == kept & set(sub)


@given(st.lists(st.text(alphabet=string.ascii_lowercase + " 0123456789.,!",
                        max_size=80), min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_ngram_fingerprint_kernel_matches_brute(texts):
    """The vectorized fingerprint kernel (dictionary-encoded crc32 +
    numpy Horner windows) produces exactly the straight-line per-doc
    fingerprint SET of the documented spec, for any text."""
    import re
    import zlib

    import pyarrow as pa

    from easyner_ray.ops.decontam import _fingerprint_batch

    n = 3
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = _fingerprint_batch(t, n=n, id_col="doc_id", text_col="text")
    got: dict = {}
    for i, fp in zip(out.column("doc_id").to_pylist(),
                     out.column("fp").to_pylist()):
        got.setdefault(i, set()).add(fp & ((1 << 64) - 1)
                                     if fp >= 0 else fp + (1 << 64))

    B, M = 1099511628211, (1 << 64) - 1
    for i, text in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        exp = set()
        for j in range(len(toks) - n + 1):
            h = 0
            for k in range(n):
                h = (h * B + zlib.crc32(toks[j + k].encode())) & M
            exp.add(h)
        assert got.get(i, set()) == exp, i


@given(st.lists(st.integers(0, 30), min_size=1, max_size=300),
       st.integers(1, 16))
@settings(max_examples=100, deadline=None)
def test_mg_batch_superset_guarantee(vals, m):
    """Every value with count > len/(m+1) survives the per-batch
    Misra-Gries pass (the pigeonhole the candidate union relies on),
    and survivors are distinct."""
    import collections

    import pyarrow as pa

    from easyner_ray.ops.sketch import _mg_batch

    t = pa.table({"v": pa.array(vals, pa.int64())})
    out = _mg_batch(t, "v", m).column("v").to_pylist()
    assert len(out) == len(set(out))
    counts = collections.Counter(vals)
    thresh = len(vals) // (m + 1)
    for v, c in counts.items():
        if c > thresh:
            assert v in out, (v, c, thresh, m)


@given(st.lists(st.text(alphabet="abcx", min_size=0, max_size=6),
                min_size=1, max_size=40, unique=True))
@settings(max_examples=60, deadline=None)
def test_fastss_blocking_lossless(names):
    """Deletion-neighborhood key sets intersect for EVERY pair within
    edit distance 1 (the losslessness edit1_pairs relies on), and the
    verify predicate matches a reference DP Levenshtein."""
    import itertools

    import pyarrow as pa

    from easyner_ray.ops.fuzzy import _expand_keys, _lev_le1

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    exp = _expand_keys(pa.table({"name": names}), "name")
    keys_of: dict[str, set] = {}
    for k, n in zip(exp.column("key").to_pylist(),
                    exp.column("name").to_pylist()):
        keys_of.setdefault(n, set()).add(k)
    for u, v in itertools.combinations(names, 2):
        d = lev(u, v)
        assert _lev_le1(u, v) == (d <= 1), (u, v)
        if d <= 1:
            assert keys_of[u] & keys_of[v], (u, v)


@given(st.lists(st.tuples(st.integers(0, (1 << 16) - 1),
                          st.integers(0, (1 << 16) - 1)),
                min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_morton_interleave_bijective_and_monotone_per_axis(pairs):
    """Z-order keys: (a) injective — distinct (x, y) gives distinct
    keys (bit interleave is a bijection); (b) de-interleaving recovers
    both coordinates; (c) fixing one axis, the key is strictly monotone
    in the other (locality within a lane)."""
    import numpy as np

    from easyner_ray.ops.layout import _interleave

    xs = np.array([p[0] for p in pairs], dtype=np.int64)
    ys = np.array([p[1] for p in pairs], dtype=np.int64)
    z = _interleave([xs, ys], 16)

    def deinter(v, lane):
        return sum((((int(v) >> (2 * i + lane)) & 1) << i)
                   for i in range(16))

    for xi, yi, zi in zip(xs, ys, z):
        assert deinter(zi, 0) == int(xi)
        assert deinter(zi, 1) == int(yi)
    assert len({(int(x), int(y)) for x, y in zip(xs, ys)}) == \
        len(set(int(v) for v in z))
    # monotone along the x lane with y fixed
    y0 = int(ys[0])
    xs_sorted = np.sort(np.unique(xs))
    lane = _interleave([xs_sorted,
                        np.full(len(xs_sorted), y0, np.int64)], 16)
    assert (np.diff(lane) > 0).all()


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1,
                max_size=300),
       st.integers(2, 8))
@settings(max_examples=50, deadline=None)
def test_range_partition_monotone_and_complete(vals, n_parts):
    """Partition ids are monotone in the value (v1 <= v2 ->
    part(v1) <= part(v2)), bounded by [0, n_parts-1], and every row is
    assigned (no drops)."""
    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.ops.layout import range_partition_ids

    t = pa.table({"id": list(range(len(vals))),
                  "v": pa.array(vals, pa.float64())})
    rows = range_partition_ids(rd.from_arrow(t), "v", n_parts,
                               id_col="id").take_all()
    assert len(rows) == len(vals)
    part_of = {r["id"]: r["part"] for r in rows}
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    parts_sorted = [part_of[i] for i in order]
    assert parts_sorted == sorted(parts_sorted)
    assert 0 <= min(parts_sorted) and max(parts_sorted) <= n_parts - 1
