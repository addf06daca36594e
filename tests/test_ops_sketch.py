"""HyperLogLog approx-distinct sketch tests (ops.sketch).

The op is deterministic by spec (splitmix64 + fixed estimator), so the
tests pin (a) bit-equality against the independently-written straight-line
gold recompute, (b) partition-invariance of the register merge, and
(c) estimator accuracy against the exact distinct count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _events_ds(user_ids, event_types):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"event_type": pa.array(event_types, pa.string()),
                  "user_id": pa.array(user_ids, pa.int64())})
    )


def test_splitmix64_vector_matches_scalar():
    from easyner_ray.ops.sketch import splitmix64
    from easyner_ray.sources.gold_derived import _splitmix64_scalar

    xs = np.array([0, 1, 2, 12345, 2**63 - 1, 2**64 - 1, 0xDEADBEEF],
                  dtype=np.uint64)
    vec = splitmix64(xs)
    for x, v in zip(xs.tolist(), vec.tolist()):
        assert _splitmix64_scalar(int(x)) == int(v)


def test_engine_matches_gold_recompute(ray_session, tmp_path):
    """Engine output is bit-identical to the scalar gold generator on a
    real events table (negative ids included via the signed view)."""
    import pyarrow.parquet as pq

    from easyner_ray.ops.sketch import approx_distinct
    from easyner_ray.sources.gold_derived import write_approx_distinct_gold

    rng = np.random.default_rng(7)
    n = 20_000
    uids = rng.integers(-50_000, 50_000, size=n).astype(np.int64)
    types = np.array(["click", "view", "buy"])[rng.integers(0, 3, size=n)]
    events = pa.table({"event_type": pa.array(types.tolist(), pa.string()),
                       "user_id": pa.array(uids, pa.int64())})
    ev_path = str(tmp_path / "events.parquet")
    pq.write_table(events, ev_path)

    gold_path = write_approx_distinct_gold(str(tmp_path), ev_path, p=12)
    gold = pq.read_table(gold_path).to_pandas().sort_values("event_type")

    import ray.data as rd

    out = (approx_distinct(rd.from_arrow(events), ["event_type"], "user_id",
                           p=12)
           .to_pandas().sort_values("event_type"))
    assert out["event_type"].tolist() == gold["event_type"].tolist()
    assert out["approx_distinct"].tolist() == gold["approx_distinct"].tolist()


def test_partition_invariance(ray_session):
    """Register max-merge is associative/commutative: any block layout
    yields the same registers, hence the same estimate."""
    from easyner_ray.ops.sketch import approx_distinct

    rng = np.random.default_rng(11)
    uids = rng.integers(0, 3_000, size=9_000).astype(np.int64)
    types = np.array(["a", "b"])[rng.integers(0, 2, size=9_000)]
    one = approx_distinct(_events_ds(uids, types.tolist()), ["event_type"],
                          "user_id").to_pandas().sort_values("event_type")
    many = approx_distinct(
        _events_ds(uids, types.tolist()).repartition(13), ["event_type"],
        "user_id").to_pandas().sort_values("event_type")
    assert one["approx_distinct"].tolist() == many["approx_distinct"].tolist()


def test_estimator_accuracy(ray_session):
    """p=12 -> ~1.6% standard error; assert within 5% of exact."""
    from easyner_ray.ops.sketch import approx_distinct

    exact = 5_000
    uids = np.tile(np.arange(exact, dtype=np.int64), 3)
    types = ["only"] * len(uids)
    out = approx_distinct(_events_ds(uids, types), ["event_type"], "user_id")
    est = int(out.to_pandas()["approx_distinct"].iloc[0])
    assert abs(est - exact) / exact < 0.05


def test_string_values_and_small_range(ray_session):
    """String value column hashes per-distinct (dictionary-encoded); the
    linear-counting small range is exact-ish for tiny cardinalities."""
    from easyner_ray.ops.sketch import approx_distinct

    vals = [f"u{i % 7}" for i in range(500)]
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["x"] * 500, pa.string()),
        "user": pa.array(vals, pa.string()),
    }))
    est = int(approx_distinct(ds, ["event_type"], "user")
              .to_pandas()["approx_distinct"].iloc[0])
    assert est == 7  # linear counting is exact at this density
