"""Incremental KG update: fold new shards into an existing graph;
update(build(A), B) must equal build(A ∪ B) exactly."""

from __future__ import annotations

import os

import pytest


def _transcripts(corpus_dir):
    import ray.data as rd

    return rd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"),
                           columns=["conv_id", "turn_idx", "text"])


def _graph_frames(res):
    n = res["nodes"].to_pandas().sort_values(["norm", "cls"]).reset_index(drop=True)
    e = res["edges"].to_pandas().sort_values(["subj", "obj"]).reset_index(drop=True)
    return n[["node_id", "norm", "cls", "n_mentions"]], \
        e[["subj_id", "subj", "pred", "obj_id", "obj", "weight"]]


def test_incremental_equals_full_rebuild(ray_session, tiny_corpus, tmp_path):
    import pyarrow.compute as pc

    from easyner_ray.pipelines.incremental import update_graph
    from easyner_ray.pipelines.kg import build_kg_single_pass
    from easyner_ray.state.sink import verify_manifests, write_partitioned

    ts = _transcripts(tiny_corpus)

    # shard split: conversations with even trailing digit = batch A, odd = B
    def _parity_filter(parity):
        def f(t):
            digit = pc.cast(
                pc.utf8_slice_codeunits(t.column("conv_id"), 11, 12), "int32")
            return t.filter(pc.equal(pc.bit_wise_and(digit, 1), parity))
        return f

    a = ts.map_batches(_parity_filter(0), batch_format="pyarrow")
    b = ts.map_batches(_parity_filter(1), batch_format="pyarrow")

    # graph(A) written to a sink
    g_a = build_kg_single_pass(a)
    root_a = str(tmp_path / "graph_a")
    write_partitioned(g_a["nodes"], os.path.join(root_a, "nodes"),
                      key_col="norm", num_partitions=8)
    write_partitioned(g_a["edges"], os.path.join(root_a, "edges"),
                      key_col="subj", num_partitions=8)

    # incremental fold of B into graph(A) -> snapshot root
    root_b = str(tmp_path / "graph_ab")
    upd = update_graph(b, root_a, out_dir=root_b, num_partitions=8)

    # must equal the full rebuild over A ∪ B
    full = build_kg_single_pass(_transcripts(tiny_corpus))
    un, ue = _graph_frames(upd)
    fn, fe = _graph_frames(full)
    assert un.equals(fn), "incremental nodes diverge from full rebuild"
    assert ue.equals(fe), "incremental edges diverge from full rebuild"
    assert verify_manifests(os.path.join(root_b, "edges"))


def test_incremental_rejects_in_place(ray_session, tiny_corpus, tmp_path):
    from easyner_ray.pipelines.incremental import update_graph

    with pytest.raises(ValueError, match="out_dir must differ"):
        update_graph(_transcripts(tiny_corpus), str(tmp_path / "g"),
                     out_dir=str(tmp_path / "g"))


def test_incremental_preserves_aliases(ray_session, tiny_corpus, tmp_path):
    """Folding new shards into a staged-build graph (alias lists populated)
    must carry the old aliases through, not erase them. New single-pass
    partials contribute counts only (documented: aliases accrue via staged
    rebuilds)."""
    from easyner_ray.pipelines.incremental import update_graph
    from easyner_ray.pipelines.kg import build_kg
    from easyner_ray.state.sink import write_partitioned

    ts = _transcripts(tiny_corpus)
    g = build_kg(ts, checkpoint="memory")
    root = str(tmp_path / "staged_graph")
    write_partitioned(g["nodes"], os.path.join(root, "nodes"),
                      key_col="norm", num_partitions=4)
    write_partitioned(g["edges"], os.path.join(root, "edges"),
                      key_col="subj", num_partitions=4)
    old = g["nodes"].to_pandas().set_index(["norm", "cls"])

    upd = update_graph(ts, root, out_dir=str(tmp_path / "snap2"), num_partitions=4)
    new = upd["nodes"].to_pandas().set_index(["norm", "cls"])
    assert len(new) == len(old)
    for key, row in old.iterrows():
        assert sorted(new.loc[key, "aliases"]) == sorted(row["aliases"]), key
        assert new.loc[key, "n_mentions"] == 2 * row["n_mentions"]
