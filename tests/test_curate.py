"""Curation pipeline runner (pipelines/curate.py): each step against a
straight-line recompute, plus the full config chain end-to-end through
the resumable partitioned sink."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def docs_path(tmp_path):
    # duplicates, a near-duplicate, short docs, digits to redact
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog near the river"),       # near-dup of 0
        (3, "tiny"),                                                             # too short
        (4, "a completely different document about data engines and arrow 4242"),
        (5, "another unrelated text with numbers 123 and 456 sprinkled in it ok"),
    ]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    p = str(tmp_path / "documents.parquet")
    pq.write_table(t, p)
    return p


def test_curation_chain_end_to_end(ray_session, docs_path, tmp_path):
    from easyner_ray.pipelines.curate import build_curation

    cfg = {
        "input": {"documents": docs_path},
        "steps": [
            {"op": "token_filter", "min_tokens": 5},
            {"op": "dedup_exact"},
            {"op": "near_dup_filter", "threshold": 0.5, "k": 3},
            {"op": "redact", "pattern": r"\d+", "replacement": "<NUM>"},
        ],
    }
    out = build_curation(cfg).to_pandas().sort_values("doc_id")
    # 3 dropped (short), 1 dropped (exact dup of 0), 2 dropped (near-dup,
    # rep = min id 0 survives)
    assert out["doc_id"].tolist() == [0, 4, 5]
    assert "<NUM>" in out[out.doc_id == 4]["text"].iloc[0]
    assert "4242" not in out[out.doc_id == 4]["text"].iloc[0]


def test_curation_sink_resume(ray_session, docs_path, tmp_path):
    from easyner_ray.pipelines.curate import run_curation

    out_dir = str(tmp_path / "curated")
    cfg = {
        "input": {"documents": docs_path},
        "steps": [{"op": "token_filter", "min_tokens": 5}],
        "output_dir": out_dir,
        "sink": {"num_partitions": 4},
    }
    s1 = run_curation(cfg)
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS"))
    assert s1["new_partitions"]  # first run writes fresh partitions
    # re-run: every partition already manifested -> nothing rewritten
    s2 = run_curation(cfg)
    assert s2["new_partitions"] == []
    assert sorted(s2["resumed_partitions"]) == sorted(s1["new_partitions"])
    got = pq.read_table(out_dir).column("doc_id").to_pylist()
    assert sorted(got) == [0, 1, 2, 4, 5]


def test_curation_hash_sample_and_quality(ray_session, tmp_path):
    from easyner_ray.pipelines.curate import build_curation

    n = 2000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["plain readable text here"] * (n - 100)
                         + ["!!! ??? ### $$$ %%%"] * 100, pa.string()),
    })
    p = str(tmp_path / "documents.parquet")
    pq.write_table(t, p)
    cfg = {
        "input": {"documents": p},
        "steps": [
            {"op": "quality_filter", "max_punct_ratio": 0.3},
            {"op": "hash_sample", "rate": 0.25, "key": "doc_id"},
        ],
    }
    out = build_curation(cfg).to_pandas()
    # punct-heavy docs (ids >= n-100) are gone
    assert (out["doc_id"] < n - 100).all()
    # deterministic sample of the survivors
    keys = np.arange(n - 100).astype(np.uint64)
    h = (keys * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    want = np.flatnonzero(h < np.uint64(int(0.25 * (1 << 32))))
    assert np.array_equal(np.sort(out["doc_id"].to_numpy()), want)


def test_curation_unknown_op_raises(ray_session, docs_path):
    from easyner_ray.pipelines.curate import build_curation

    with pytest.raises(ValueError, match="unknown curation op"):
        build_curation({"input": {"documents": docs_path},
                        "steps": [{"op": "nope"}]})


def test_near_dup_filter_minhash_backend(ray_session, docs_path):
    """method="minhash" removes the same synthetic near-dup cluster as the
    exact-Jaccard default on this fixture (doc 1 exact-dup text, doc 2
    near-dup — both collapse to rep 0), and an unknown method raises."""
    from easyner_ray.pipelines.curate import build_curation

    def run(method):
        cfg = {"input": {"documents": docs_path},
               "steps": [{"op": "token_filter", "min_tokens": 5},
                         {"op": "near_dup_filter", "threshold": 0.5, "k": 3,
                          "method": method}]}
        return sorted(build_curation(cfg).to_pandas()["doc_id"])

    assert run("minhash") == run("jaccard") == [0, 4, 5]
    with pytest.raises(ValueError, match="minhash"):
        run("banding")


def test_chunk_step(ray_session, docs_path):
    """chunk explodes docs into overlapping windows under the same text
    column, so downstream steps (redact) still apply; gold = straight-line
    slicing."""
    from easyner_ray.pipelines.curate import build_curation

    cfg = {"input": {"documents": docs_path},
           "steps": [{"op": "token_filter", "min_tokens": 5},
                     {"op": "dedup_exact"},
                     {"op": "chunk", "size": 20, "overlap": 5},
                     {"op": "redact", "pattern": r"\d+",
                      "replacement": "<NUM>"}]}
    out = build_curation(cfg).to_pandas()
    assert set(out.columns) == {"doc_id", "chunk_idx", "text"}
    # (no raw length bound: redaction may LENGTHEN a chunk, e.g. 42 -> <NUM>)

    src = pq.read_table(docs_path).to_pandas().set_index("doc_id")["text"]
    import re
    for did, g in out.groupby("doc_id"):
        text = src[did]
        # chunk_documents contract: n = max(ceil((len - overlap) / step), 1)
        n = max(-(-(len(text) - 5) // 15), 1)
        gold = [re.sub(r"\d+", "<NUM>", text[i * 15: i * 15 + 20])
                for i in range(n)]
        got = g.sort_values("chunk_idx")["text"].tolist()
        assert got == gold, (did, got, gold)


def test_decontam_step(ray_session, docs_path, tmp_path):
    """The decontamination gate removes docs sharing any 5-gram with the
    benchmark corpus and keeps the clean ones."""
    from easyner_ray.pipelines.curate import build_curation

    bench = pa.table({
        "doc_id": pa.array([900], pa.int64()),
        "text": ["something about the quick brown fox jumps over whatever"],
    })
    bp = str(tmp_path / "bench.parquet")
    pq.write_table(bench, bp)

    cfg = {
        "input": {"documents": docs_path},
        "steps": [{"op": "decontam", "benchmark": bp, "n": 5}],
    }
    out = build_curation(cfg).to_pandas().sort_values("doc_id")
    # docs 0,1,2 share "the quick brown fox jumps" with the benchmark;
    # 3 (sub-n), 4, 5 are clean
    assert out["doc_id"].tolist() == [3, 4, 5]


def test_weighted_sample_step(ray_session, tmp_path):
    """Weighted mixing step: k per group, helper columns stripped, and
    repeated runs give the same membership."""
    import ray.data as rd

    from easyner_ray.pipelines.curate import STEPS

    t = pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": [f"doc number {i}" for i in range(12)],
        "source": ["web"] * 8 + ["books"] * 4,
        "n_chars": pa.array([100 + i for i in range(12)], pa.int64()),
    })
    step = STEPS["weighted_sample"]
    one = step(rd.from_arrow(t), k=3).to_pandas().sort_values("doc_id")
    two = step(rd.from_arrow(t).repartition(4), k=3) \
        .to_pandas().sort_values("doc_id")
    assert list(one.columns) == ["doc_id", "text", "source", "n_chars"]
    assert one["doc_id"].tolist() == two["doc_id"].tolist()
    assert (one["source"] == "web").sum() == 3
    assert (one["source"] == "books").sum() == 3


def test_logprob_filter_step(ray_session):
    """LM band filter: the doc built from rare gibberish tokens scores
    lowest and is dropped at low=0.2; ordinary docs survive; quantile
    band [0,1] keeps everything."""
    import ray.data as rd

    from easyner_ray.pipelines.curate import STEPS

    common = "the cat sat on the mat and the dog sat too"
    texts = [common, common + " again", common + " once more",
             "zqxj vvkp qqzz wwyy xxoo"]          # rare-token gibberish
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(4)), pa.int64()),
        "text": texts,
    }))
    kept = STEPS["logprob_filter"](ds, low=0.3, high=1.0).to_pandas()
    assert 3 not in kept["doc_id"].tolist()
    assert len(kept) >= 2

    all_kept = STEPS["logprob_filter"](rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(4)), pa.int64()),
        "text": texts})), low=0.0, high=1.0).to_pandas()
    assert sorted(all_kept["doc_id"].tolist()) == [0, 1, 2, 3]


def test_pack_step(ray_session, docs_path):
    """pack joins shard-local (bucket, pack_id, n_tokens) back onto the
    full doc rows: every survivor keeps its text, token counts match a
    straight-line whitespace count, and each doc starts inside its pack's
    budget window."""
    from easyner_ray.pipelines.curate import build_curation

    cfg = {"input": {"documents": docs_path},
           "steps": [{"op": "token_filter", "min_tokens": 5},
                     {"op": "pack", "budget": 16, "n_buckets": 2}]}
    out = build_curation(cfg).to_pandas().sort_values("doc_id")
    assert {"doc_id", "text", "bucket", "pack_id", "n_tokens"} <= set(
        out.columns)
    src = pq.read_table(docs_path).to_pandas().set_index("doc_id")["text"]
    survivors = [d for d, t in src.items() if len(t.split()) >= 5]
    assert out["doc_id"].tolist() == survivors
    for _, r in out.iterrows():
        assert r["n_tokens"] == len(src[r["doc_id"]].split())
        assert 0 <= r["bucket"] < 2 and r["pack_id"] >= 0


class TestSinkModes:
    def _cfg(self, out, mode_cfg):
        return {"input": {"sf_dir": "/root/testdata/sf0.001"},
                "output_dir": out,
                "steps": [{"op": "token_filter", "min_tokens": 5},
                          {"op": "dedup_exact"}],
                "sink": mode_cfg}

    def test_training_shards_mode(self, ray_session, tmp_path):
        import os

        from easyner_ray.pipelines.curate import run_curation

        out = str(tmp_path / "shards")
        s = run_curation(self._cfg(out, {"mode": "training_shards",
                                         "n_shards": 8}))
        assert s["rows_written"] > 0
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert 0 < len(files) <= 8  # exactly one file per nonempty shard

    def test_clustered_mode(self, ray_session, tmp_path):
        import os

        from easyner_ray.pipelines.curate import run_curation
        from easyner_ray.state.clustered import read_pruned

        out = str(tmp_path / "clustered")
        s = run_curation(self._cfg(out, {"mode": "clustered",
                                         "cols": ["doc_id"],
                                         "num_partitions": 4}))
        assert s["rows_written"] > 0
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        ds, rep = read_pruned(out, {})
        assert ds.count() == s["rows_written"]
