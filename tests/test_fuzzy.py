"""ops.fuzzy: FastSS deletion-neighborhood edit-distance<=1 self-join.

Verify the predicate against a reference DP Levenshtein, lossless
blocking against brute force on a synthetic vocabulary, and the
kg_fuzzy_alias_pairs query against its DuckDB levenshtein oracle on the
sf0.001 corpus-derived name table.
"""

from __future__ import annotations

import itertools

import pyarrow as pa

from easyner_ray.ops.fuzzy import _expand_keys, _lev_le1, edit1_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev_le1_predicate_matches_dp():
    # every pair over a small alphabet, lengths 0..4 — exhaustive
    words = [""] + ["".join(w) for n in (1, 2, 3)
                    for w in itertools.product("abc", repeat=n)]
    for u in words:
        for v in words:
            assert _lev_le1(u, v) == (_lev(u, v) <= 1), (u, v)


def test_expand_keys_shape():
    t = pa.table({"name": ["abc", "x", ""]})
    out = _expand_keys(t, "name")
    rows = set(zip(out.column("key").to_pylist(),
                   out.column("name").to_pylist()))
    # identity + one key per deletion position (empty string: identity only)
    assert rows == {("abc", "abc"), ("bc", "abc"), ("ac", "abc"),
                    ("ab", "abc"), ("x", "x"), ("", "x"), ("", "")}


def test_edit1_pairs_lossless_vs_brute(ray_session):
    import ray

    names = ["abt1", "abt2", "abt7", "abx1", "zeta", "zetb", "zet",
             "zzeta", "alpha", "alphaa", "alhpa", "omega", "kappa",
             "kappa9", "kapa", "b", "c", "bb"]
    want = {(min(u, v), max(u, v))
            for u, v in itertools.combinations(names, 2) if _lev(u, v) <= 1}
    ds = ray.data.from_arrow(pa.table({"name": names}))
    got_tbl = edit1_pairs(ds).to_pandas()
    got = set(zip(got_tbl["a"], got_tbl["b"]))
    assert got == want
    assert set(got_tbl["dist"]) <= {1}


def test_kg_fuzzy_alias_pairs_vs_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e
    from easyner_ray.pipelines import queries as q
    from easyner_ray.pipelines.oracles import SYNTH

    sf = "/root/testdata/sf0.001"
    got = q.kg_fuzzy_alias_pairs(sf).to_pandas()
    # the oracle reads the sf0.01 gold mentions by fixed path; rebuild the
    # same SQL against this sf's gold (written on demand by _corpus inside
    # the query above — SYNTH points at the sf0.01 cache, so derive the
    # sf0.001 gold path from the query's own corpus helper)
    from easyner_ray.pipelines.queries import _corpus

    gm = f"read_parquet('{_corpus(sf)}/gold_mentions.parquet')"
    sql = e.oracle_sql()["kg_fuzzy_alias_pairs"].replace(
        f"read_parquet('{SYNTH}/gold_mentions.parquet')", gm)
    want = duckdb.connect().execute(sql).df()
    assert len(got) == len(want) > 0
    assert list(got["a"]) == list(want["a"])
    assert list(got["b"]) == list(want["b"])
    assert list(got["dist"]) == list(want["dist"])


def test_alias_clusters_string_union_find(ray_session):
    import ray

    pairs = pa.table({"a": ["abt1", "abt2", "zeta"],
                      "b": ["abt2", "abt7", "zetb"],
                      "dist": [1, 1, 1]})
    out = ray.data.from_arrow(pairs)
    from easyner_ray.ops.fuzzy import alias_clusters

    got = alias_clusters(out).to_pandas().sort_values("name")
    assert dict(zip(got["name"], got["cluster"])) == {
        "abt1": "abt1", "abt2": "abt1", "abt7": "abt1",
        "zeta": "zeta", "zetb": "zeta"}


def test_alias_clusters_distributed_path_matches(ray_session):
    import ray

    from easyner_ray.ops.fuzzy import alias_clusters

    # chain a-b-c-d plus a separate pair: exercises multi-hop propagation
    pairs = pa.table({"a": ["na", "nb", "nc", "xx"],
                      "b": ["nb", "nc", "nd", "xy"],
                      "dist": [1, 1, 1, 1]})
    ds = ray.data.from_arrow(pairs)
    fast = alias_clusters(ds).to_pandas().sort_values("name").reset_index(drop=True)
    dist = alias_clusters(ds, small_edge_cutoff=0).to_pandas() \
        .sort_values("name").reset_index(drop=True)
    assert fast.equals(dist)
    assert set(fast["cluster"]) == {"na", "xx"}


def test_kg_fuzzy_alias_clusters_vs_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e
    from easyner_ray.pipelines import queries as q
    from easyner_ray.pipelines.oracles import SYNTH
    from easyner_ray.pipelines.queries import _corpus

    sf = "/root/testdata/sf0.001"
    got = q.kg_fuzzy_alias_clusters(sf).to_pandas()
    gm = f"read_parquet('{_corpus(sf)}/gold_mentions.parquet')"
    sql = e.oracle_sql()["kg_fuzzy_alias_clusters"].replace(
        f"read_parquet('{SYNTH}/gold_mentions.parquet')", gm)
    want = duckdb.connect().execute(sql).df()
    assert len(got) == len(want) > 0
    assert list(got["name"]) == list(want["name"])
    assert list(got["cluster"]) == list(want["cluster"])


def test_edit1_join_vs_brute(ray_session):
    import ray

    from easyner_ray.ops.fuzzy import edit1_join

    lefts = ["abt1", "abx", "zeta", "nomatch99", "kapa", "same"]
    rights = ["abt2", "abtx1", "zetb", "kappa", "same", "unrelated"]
    want = {(u, v, 0 if u == v else 1)
            for u in lefts for v in rights if _lev(u, v) <= 1}
    got_tbl = edit1_join(
        ray.data.from_arrow(pa.table({"name": lefts})),
        ray.data.from_arrow(pa.table({"name": rights}))).to_pandas()
    got = set(zip(got_tbl["left"], got_tbl["right"], got_tbl["dist"]))
    assert got == want and len(want) > 0


def test_kg_fuzzy_nel_vs_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e
    from easyner_ray.pipelines import queries as q
    from easyner_ray.pipelines.oracles import SYNTH
    from easyner_ray.pipelines.queries import _corpus

    sf = "/root/testdata/sf0.001"
    got = q.kg_fuzzy_nel(sf).to_pandas()
    corp = _corpus(sf)
    sql = e.oracle_sql()["kg_fuzzy_nel"] \
        .replace(f"'{SYNTH}/gold_mentions.parquet'",
                 f"'{corp}/gold_mentions.parquet'") \
        .replace(f"'{SYNTH}/alias.parquet'", f"'{corp}/alias.parquet'")
    want = duckdb.connect().execute(sql).df()
    assert len(got) == len(want) > 0
    for c in ("norm", "term", "id"):
        assert list(got[c]) == list(want[c]), c


def test_grouped_string_agg_basic(ray_session):
    import ray

    from easyner_ray.ops.relational import grouped_string_agg

    t = pa.table({"k": ["b", "a", "a", "b", "a"],
                  "v": ["z", "m", "a", "q", "k"],
                  "o": [2, 3, 1, 1, 2]})
    got = grouped_string_agg(ray.data.from_arrow(t), key="k", val="v",
                             order_cols=["o"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == ["a", "b"]
    assert list(got["agg"]) == ["a,k,m", "q,z"]
    assert list(got["n"]) == [3, 2]


def test_conv_entity_sequence_vs_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e
    from easyner_ray.pipelines import queries as q
    from easyner_ray.pipelines.oracles import SYNTH
    from easyner_ray.pipelines.queries import _corpus

    sf = "/root/testdata/sf0.001"
    got = q.conv_entity_sequence(sf).to_pandas()
    gm = f"read_parquet('{_corpus(sf)}/gold_mentions.parquet')"
    sql = e.oracle_sql()["conv_entity_sequence"].replace(
        f"read_parquet('{SYNTH}/gold_mentions.parquet')", gm)
    want = duckdb.connect().execute(sql).df()
    assert len(got) == len(want) > 0
    for c in ("conv_id", "entity_seq", "n_entities"):
        assert list(got[c]) == list(want[c]), c
