"""Round-5 session-11 operators: TPC-H Q10 analog and friends added
this session, each checked against an in-test DuckDB oracle at
sf0.001 (the driver re-checks at sf0.01)."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def _duck(sql: str, tables: list[str]):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


def test_tpch_q10_matches_duckdb(ray_session):
    import __ray_entry__ as e
    from easyner_ray.pipelines import queries as q

    got = q.tpch_q10_returned_items(SF).to_pandas()
    want = _duck(e.oracle_sql()["tpch_q10_returned_items"],
                 ["customer", "nation", "orders", "lineitem"])
    assert len(got) == len(want) <= 20
    got = got.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    assert list(got["c_custkey"]) == list(want["c_custkey"])
    assert np.array_equal(got["revenue"].to_numpy(),
                          want["revenue"].to_numpy())


def _emb_ds(x, ids=None, blocks=3):
    import pyarrow as pa
    import ray.data as rd

    n = x.shape[0]
    ids = list(range(n)) if ids is None else ids
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([row.tolist() for row in x],
                                          pa.list_(pa.float32()))})
    return rd.from_arrow(tbl).repartition(blocks)


def _rand_unit(n, d, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_pca_block_layout_invariant(ray_session):
    from easyner_ray.ops.similarity import pca_project

    x = _rand_unit(120, 16)
    outs = []
    for blocks, bs in [(1, 4096), (7, 16), (3, 50)]:
        _, ds = pca_project(_emb_ds(x, blocks=blocks), k=3, batch_size=bs)
        df = ds.to_pandas().sort_values(["vec_id", "dim_idx"])
        outs.append(df.reset_index(drop=True))
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])


def test_pca_matches_unquantized_numpy(ray_session):
    from easyner_ray.ops.similarity import pca_project

    x = _rand_unit(200, 12, seed=9)
    evals, ds = pca_project(_emb_ds(x), k=4)
    got = ds.to_pandas().sort_values(["vec_id", "dim_idx"])
    y = got["value"].to_numpy().reshape(200, 4)

    xf = x.astype(np.float64)
    mean = xf.mean(axis=0)
    cov = (xf - mean).T @ (xf - mean) / len(xf)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(-w)[:4]
    vr = v[:, order]
    for c in range(4):
        j = int(np.argmax(np.abs(vr[:, c])))
        if vr[j, c] < 0:
            vr[:, c] = -vr[:, c]
    ref = (xf - mean) @ vr
    # quantization at 2^-18 + 1e-9/1e-6 rounding: loose tolerance
    assert np.abs(y - ref).max() < 1e-3
    assert np.allclose(np.sort(evals)[::-1], np.sort(w[order])[::-1],
                       atol=1e-6)
    # top component really is the max-variance direction
    assert y[:, 0].var() >= y[:, -1].var()


def test_pca_empty_input(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.ops.similarity import pca_project

    empty = rd.from_arrow(pa.table(
        {"vec_id": pa.array([], pa.int64()),
         "embedding": pa.array([], pa.list_(pa.float32()))}))
    evals, out = pca_project(empty, k=2)
    assert len(evals) == 0
    # empty path returns a typed pa.Table (Dataset.to_pandas drops
    # column names on an all-empty Dataset)
    assert out.schema.names == ["vec_id", "dim_idx", "value"]
    assert out.num_rows == 0


def _edges_ds(pairs, blocks=2):
    import pyarrow as pa
    import ray.data as rd

    tbl = pa.table({"subj": [a for a, _ in pairs],
                    "obj": [b for _, b in pairs],
                    "weight": pa.array([1] * len(pairs), pa.int64())})
    return rd.from_arrow(tbl).repartition(blocks)


def test_random_walks_valid_and_complete(ray_session):
    from easyner_ray.ops.graph_analytics import random_walks

    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("c", "a"), ("a", "c"), ("d", "a")]  # d -> a, a never -> d
    out = random_walks(_edges_ds(pairs), walks_per_node=3,
                       walk_len=5).to_pandas()
    assert len(out) == 4 * 3 * 6  # nodes x walks x (len+1)
    edge_set = set(pairs)
    for (start, w), g in out.groupby(["start", "walk_id"]):
        g = g.sort_values("step")
        seq = list(g["node"])
        assert seq[0] == start
        for u, v in zip(seq, seq[1:]):
            assert (u, v) in edge_set, (u, v)


def test_random_walks_sink_stays_put(ray_session):
    from easyner_ray.ops.graph_analytics import random_walks

    out = random_walks(_edges_ds([("a", "z")]), walks_per_node=1,
                       walk_len=3).to_pandas()
    z = out[out["start"] == "z"].sort_values("step")
    assert list(z["node"]) == ["z", "z", "z", "z"]
    a = out[out["start"] == "a"].sort_values("step")
    assert list(a["node"]) == ["a", "z", "z", "z"]


def test_random_walks_layout_invariant(ray_session):
    from easyner_ray.ops.graph_analytics import random_walks

    pairs = [(f"n{i}", f"n{(i * 3 + 1) % 17}") for i in range(17)] + \
            [(f"n{(i * 3 + 1) % 17}", f"n{i}") for i in range(17)]
    outs = []
    for blocks in (1, 5):
        df = random_walks(_edges_ds(pairs, blocks=blocks),
                          walks_per_node=2, walk_len=4).to_pandas()
        outs.append(df.sort_values(["start", "walk_id", "step"])
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_walk_skipgrams_match_selfjoin(ray_session):
    from easyner_ray.ops.graph_analytics import random_walks

    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    walks = random_walks(_edges_ds(pairs), walks_per_node=2,
                         walk_len=3).to_pandas()
    sg = random_walks(_edges_ds(pairs), walks_per_node=2, walk_len=3,
                      emit="skipgrams", window=2).to_pandas()
    # reference: self-join of the walk table within the window
    ref = walks.merge(walks, on=["start", "walk_id"],
                      suffixes=("_c", "_x"))
    ref = ref[(ref.step_x != ref.step_c)
              & (ref.step_x >= ref.step_c - 2)
              & (ref.step_x <= ref.step_c + 2)]
    key = ["start", "walk_id", "center_step", "center", "context"]
    ref = ref.rename(columns={"step_c": "center_step",
                              "node_c": "center", "node_x": "context"})
    got = sg.sort_values(key).reset_index(drop=True)
    want = ref[key].sort_values(key).reset_index(drop=True)
    assert got.equals(want)
