"""Round-5 session-3 operators: deterministic split assignment,
target-mixture rebalancing, and vocabulary-coverage (OOV) counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 1):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


_MASK32 = np.uint64(0xFFFFFFFF)
_MULT = np.uint64(2654435761)


def test_split_assign_partitions_and_formula(ray_session):
    """Every row gets exactly one label; labels follow the cumulative
    int(frac * 2^32) thresholds of the Knuth hash; a NULL key falls to
    the residual (last) label like SQL CASE ... ELSE."""
    from easyner_ray.ops.relational import split_assign

    n = 5000
    ids = pa.array(list(range(n)) + [None], pa.int64())
    t = pa.table({"doc_id": ids})
    out = split_assign(_ds(t, 4), "doc_id",
                       [("train", 0.8), ("val", 0.1), ("test", 0.1)]
                       ).to_pandas()
    assert len(out) == n + 1
    assert out.loc[out["doc_id"].isna(), "split"].tolist() == ["test"]

    ks = np.arange(n, dtype=np.uint64)
    h = (ks * _MULT) & _MASK32
    t1 = np.uint64(int(0.8 * 2**32))
    t2 = np.uint64(int(0.8 * 2**32) + int(0.1 * 2**32))
    want = np.where(h < t1, "train", np.where(h < t2, "val", "test"))
    got = out.dropna(subset=["doc_id"]).sort_values("doc_id")["split"]
    assert (got.to_numpy() == want).all()
    # fractions roughly hold (hash uniformity, generous tolerance)
    frac_train = (want == "train").mean()
    assert 0.75 < frac_train < 0.85


def test_split_assign_stable_under_corpus_growth(ray_session):
    """A row's split does not change when more rows are added — the
    property a random_shuffle split lacks."""
    from easyner_ray.ops.relational import split_assign

    fr = [("train", 0.9), ("heldout", 0.1)]
    small = pa.table({"doc_id": pa.array(range(100), pa.int64())})
    big = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    s = split_assign(_ds(small), "doc_id", fr).to_pandas()
    b = split_assign(_ds(big, 3), "doc_id", fr).to_pandas()
    merged = s.merge(b, on="doc_id", suffixes=("_s", "_b"))
    assert (merged["split_s"] == merged["split_b"]).all()


def test_rebalance_sources_rates(ray_session):
    """Targets scale to the bottleneck source (rates never exceed 1,
    the bottleneck keeps everything, absent sources drop), and the kept
    set matches the hash-threshold formula exactly."""
    from easyner_ray.ops.relational import rebalance_sources

    # counts: a=60, b=30, c=10; targets a .5, b .3, c .2
    # feasible totals: 60/.5=120, 30/.3=100, 10/.2=50 -> m=50
    # rates: a = .5*50/60, b = .3*50/30 = .5, c = .2*50/10 = 1.0
    rows = [("a", i) for i in range(60)] + \
           [("b", i + 1000) for i in range(30)] + \
           [("c", i + 2000) for i in range(10)] + \
           [("other", 9000)]
    t = pa.table({"source": pa.array([r[0] for r in rows]),
                  "doc_id": pa.array([r[1] for r in rows], pa.int64())})
    out = rebalance_sources(_ds(t, 3), {"a": 0.5, "b": 0.3, "c": 0.2},
                            key="doc_id", group_col="source").to_pandas()
    assert not (out["source"] == "other").any()
    assert (out["source"] == "c").sum() == 10  # bottleneck: rate 1.0
    for src, n0, rate in [("a", 60, 0.5 * 50 / 60), ("b", 30, 0.3 * 50 / 30)]:
        ids = np.array(sorted(t.to_pandas().loc[
            t.to_pandas()["source"] == src, "doc_id"]), dtype=np.uint64)
        h = (ids * _MULT) & _MASK32
        want = set(ids[h < np.uint64(int(rate * 2**32))].tolist())
        assert set(out.loc[out["source"] == src, "doc_id"]) == want


def test_rebalance_sources_no_matching_groups(ray_session):
    """Targets over sources absent from the corpus yield an empty,
    schema-stable result instead of raising."""
    from easyner_ray.ops.relational import rebalance_sources

    t = pa.table({"source": pa.array(["x", "y"]),
                  "doc_id": pa.array([1, 2], pa.int64())})
    out = rebalance_sources(_ds(t), {"absent": 1.0},
                            key="doc_id", group_col="source")
    assert out.count() == 0


def test_oov_counts_exact(ray_session):
    """Top-V vocabulary by (count desc, term asc); per-doc token and
    OOV counts are exact integers; a doc with no tokens is omitted."""
    from easyner_ray.ops.textstats import oov_counts

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "cat cat dog",          # cat x2, dog x1
            "cat bird bird fish",   # bird x2 here
            "dog dog zebra",        # dog x2 here
            "...",                  # no [a-z0-9]+ tokens at all
        ]),
    })
    # corpus counts: cat 3, dog 3, bird 2, fish 1, zebra 1
    # vocab_size=2 -> {cat, dog} (count desc, term asc ties)
    out = oov_counts(_ds(docs, 2), vocab_size=2).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert 3 not in out.index  # token-less doc omitted
    assert out.loc[0, "n_tokens"] == 3 and out.loc[0, "n_oov"] == 0
    assert out.loc[1, "n_tokens"] == 4 and out.loc[1, "n_oov"] == 3
    assert out.loc[2, "n_tokens"] == 3 and out.loc[2, "n_oov"] == 1


def test_oov_counts_vocab_tiebreak(ray_session):
    """When counts tie at the vocabulary cutoff, term-ascending order
    decides membership in both the engine and the SQL oracle."""
    from easyner_ray.ops.textstats import oov_counts

    docs = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["alpha beta gamma"]),  # all counts tie at 1
    })
    out = oov_counts(_ds(docs), vocab_size=2).to_pandas()
    # vocab = {alpha, beta}; gamma is the one OOV token
    assert out.loc[0, "n_tokens"] == 3 and out.loc[0, "n_oov"] == 1


def test_curate_steps_split_rebalance_mixture(ray_session, tmp_path):
    """The three sampling steps run inside the config-driven chain:
    split_keep drops the helper column and keeps one side; rebalance
    and mixture_sample gate per source."""
    import pyarrow.parquet as pq

    from easyner_ray.pipelines.curate import build_curation

    n = 200
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"src{i % 2}" for i in range(n)]),
        "text": pa.array([f"doc number {i} with some filler words here"
                          for i in range(n)]),
    })
    p = str(tmp_path / "documents.parquet")
    pq.write_table(t, p)

    cfg = {"input": {"documents": p},
           "steps": [
               {"op": "split_keep",
                "fractions": [["train", 0.9], ["heldout", 0.1]],
                "keep": "train"},
               {"op": "rebalance", "targets": {"src0": 0.7, "src1": 0.3}},
               {"op": "mixture_sample", "rates": {"src0": 1.0, "src1": 1.0}},
           ]}
    out = build_curation(cfg).to_pandas()
    assert set(out.columns) == {"doc_id", "source", "text"}  # helper dropped
    assert 0 < len(out) < n

    # split_keep keeps exactly the formula's train side
    ks = np.arange(n, dtype=np.uint64)
    h = (ks * _MULT) & _MASK32
    train = set(ks[h < np.uint64(int(0.9 * 2**32))].tolist())
    assert set(out["doc_id"]).issubset(train)
    # rebalance: src1 (30% target of a 50/50 corpus) is cut harder
    assert (out["source"] == "src0").sum() > (out["source"] == "src1").sum()
