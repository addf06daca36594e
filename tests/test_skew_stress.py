"""Skew stress: the SURVEY §4 promise is that hot keys are safe because
every wide aggregation is two-phase (per-batch partial collapse bounds a
hot key's shuffle volume to one row per batch). These tests drive the
real shuffles with a planted zipf-hot-key corpus — one entity at ~30% of
mentions, one conversation at ~10% of rows, one duplicate-cluster star —
and assert (a) results stay exact under skew and (b) wall-time stays
within a small factor of the uniform corpus of identical size.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from easyner_ray import schemas

N_MENTIONS = 120_000
N_ENTITIES = 2_000
N_CONVS = 1_500


def _mentions_table(rng: np.random.RandomState, skewed: bool) -> pa.Table:
    ent = rng.randint(0, N_ENTITIES, N_MENTIONS)
    conv = rng.randint(0, N_CONVS, N_MENTIONS)
    if skewed:
        hot_e = rng.rand(N_MENTIONS) < 0.30   # one entity, 30% of mentions
        ent[hot_e] = 0
        hot_c = rng.rand(N_MENTIONS) < 0.10   # one conv, 10% of mentions
        conv[hot_c] = 0
    norms = np.char.add("entity_", ent.astype(str))
    return pa.Table.from_arrays(
        [
            pa.array(np.char.add("c", conv.astype(str)), pa.string()),
            pa.array((np.arange(N_MENTIONS) % 50).astype(np.int32)),
            pa.array(np.zeros(N_MENTIONS, np.int32)),
            pa.array(np.zeros(N_MENTIONS, np.int32)),
            pa.array(norms, pa.string()),
            pa.array(norms, pa.string()),
            pa.array(np.where(ent % 2 == 0, "gene", "chemical"),
                     pa.string()),
            pa.array(np.zeros(N_MENTIONS, np.int32)),
            pa.array(np.full(N_MENTIONS, 5, np.int32)),
        ],
        schema=schemas.MENTIONS)


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def test_canonical_nodes_and_freq_under_skew(ray_session):
    import ray.data as rd

    from easyner_ray.stages.analysis import entity_frequency
    from easyner_ray.stages.canonicalize import canonical_nodes

    rng = np.random.RandomState(17)
    uni_t, skw_t = _mentions_table(rng, False), _mentions_table(rng, True)
    uni = rd.from_arrow(uni_t).repartition(16).materialize()
    skw = rd.from_arrow(skw_t).repartition(16).materialize()

    # warm the relevant actor/task pools once so timing compares compute
    canonical_nodes(uni).count()

    n_uni, t_nodes_uni = _timed(lambda: canonical_nodes(uni).count())
    n_skw, t_nodes_skw = _timed(lambda: canonical_nodes(skw).count())
    assert n_uni == 2 * N_ENTITIES or n_uni == len(
        set(zip(uni_t.column("norm").to_pylist(),
                uni_t.column("cls").to_pylist())))
    # skew must not change the node keyspace semantics
    assert n_skw == len(set(zip(skw_t.column("norm").to_pylist(),
                                skw_t.column("cls").to_pylist())))

    f_uni, t_freq_uni = _timed(
        lambda: entity_frequency(uni).take_all())
    f_skw, t_freq_skw = _timed(
        lambda: entity_frequency(skw).take_all())
    by_ent = {r["entity"]: r for r in f_skw}
    hot = by_ent["entity_0"]
    expect_hot = int(np.sum(
        np.asarray(skw_t.column("norm")) == "entity_0"))
    assert hot["total_count"] == expect_hot          # exact under skew
    assert expect_hot > 0.28 * N_MENTIONS            # skew actually planted
    assert len(f_uni) == n_uni

    # two-phase partials bound the hot key's shuffle volume: wall-time on
    # the skewed corpus stays within a small factor of uniform (identical
    # row count). Generous 3x bound — CI noise, not design headroom.
    assert t_nodes_skw < 3.0 * t_nodes_uni + 0.5, (t_nodes_skw, t_nodes_uni)
    assert t_freq_skw < 3.0 * t_freq_uni + 0.5, (t_freq_skw, t_freq_uni)
    print(f"\nskew/uniform wall ratios: nodes "
          f"{t_nodes_skw / t_nodes_uni:.2f} "
          f"({t_nodes_uni:.2f}s -> {t_nodes_skw:.2f}s), freq "
          f"{t_freq_skw / t_freq_uni:.2f} "
          f"({t_freq_uni:.2f}s -> {t_freq_skw:.2f}s)")


def test_dup_groups_hot_star(ray_session):
    """A duplicate 'star' (one doc paired with 5,000 others) is the hot
    key of the closure op; the min-label propagation must stay exact and
    land in the same ballpark as an equal-size set of disjoint 2-cliques."""
    import ray.data as rd

    from easyner_ray.ops.dedup import dup_groups

    n_pairs = 5_000
    star = pa.table({
        "doc_a": pa.array(np.zeros(n_pairs, np.int64)),
        "doc_b": pa.array(np.arange(1, n_pairs + 1, dtype=np.int64)),
    })
    flat = pa.table({
        "doc_a": pa.array(np.arange(0, 2 * n_pairs, 2, dtype=np.int64)),
        "doc_b": pa.array(np.arange(1, 2 * n_pairs + 1, 2, dtype=np.int64)),
    })
    # warm
    dup_groups(rd.from_arrow(flat).repartition(8)).count()

    out_flat, t_flat = _timed(
        lambda: dup_groups(rd.from_arrow(flat).repartition(8)).take_all())
    out_star, t_star = _timed(
        lambda: dup_groups(rd.from_arrow(star).repartition(8)).take_all())
    labels = {r["doc_id"]: r["group_id"] for r in out_star}
    assert len(labels) == n_pairs + 1
    assert set(labels.values()) == {0}               # one component, min id
    assert all(v == a - a % 2 for a, v in
               ((r["doc_id"], r["group_id"]) for r in out_flat))
    assert t_star < 3.0 * t_flat + 0.5, (t_star, t_flat)
    print(f"\ndup_groups star/flat wall ratio: {t_star / t_flat:.2f} "
          f"({t_flat:.2f}s -> {t_star:.2f}s)")
