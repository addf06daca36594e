"""Round-5 session-6 operators: RDF N-Triples export, per-seed harmonic
centrality, cross-conversation template detection. Hand-computed gold on
tiny graphs/tables; the sf0.01 oracle gate covers the same ops against
DuckDB SQL."""

from __future__ import annotations

import pyarrow as pa


def _rd():
    import ray.data as rd

    return rd


def test_ntriples_lines_shapes_and_escaping(ray_session):
    from easyner_ray.sources.rdf_export import ntriples_lines

    nodes = _rd().from_arrow(pa.table({
        "node_id": ["aa11", "bb22"],
        "norm": ['he said "hi"\\now', "plain"],
        "cls": ["bad class", "chemical"],
    }))
    edges = _rd().from_arrow(pa.table({
        "subj_id": ["aa11"], "pred": ["co_occurs_with"],
        "obj_id": ["bb22"], "weight": pa.array([7], pa.int64()),
    }))
    lines = sorted(r["line"] for r in ntriples_lines(nodes, edges).take_all())
    assert len(lines) == 2 * 2 + 2 * 1
    # literal escaping: backslash first, then quote
    assert ('<urn:kg:n:aa11> <http://www.w3.org/2000/01/rdf-schema#label> '
            '"he said \\"hi\\"\\\\now" .') in lines
    # class token sanitized for IRI use
    assert ('<urn:kg:n:aa11> '
            '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
            '<urn:kg:c:bad_class> .') in lines
    assert '<urn:kg:n:aa11> <urn:kg:p:co_occurs_with> <urn:kg:n:bb22> .' \
        in lines
    assert ('<urn:kg:s:aa11-bb22> <urn:kg:p:weight> '
            '"7"^^<http://www.w3.org/2001/XMLSchema#integer> .') in lines


def test_write_ntriples_shards(ray_session, tmp_path):
    import os

    from easyner_ray.sources.rdf_export import write_ntriples

    nodes = _rd().from_arrow(pa.table(
        {"node_id": ["n1"], "norm": ["x"], "cls": ["c"]}))
    edges = _rd().from_arrow(pa.table(
        {"subj_id": ["n1"], "pred": ["co_occurs_with"],
         "obj_id": ["n1"], "weight": pa.array([1], pa.int64())}))
    out = str(tmp_path / "nt")
    write_ntriples(nodes, edges, out)
    text = "".join(
        open(os.path.join(out, f)).read()
        for f in os.listdir(out) if f.endswith(".nt"))
    got = sorted(ln for ln in text.splitlines() if ln)
    assert len(got) == 4
    assert all(ln.endswith(" .") for ln in got)


def test_template_turns_counts_and_threshold(ray_session):
    from easyner_ray.ops.conversations import template_turns

    rows = []
    # "thanks!" appears in 3 convs (one conv twice); "rare" in 1
    for conv, reps in (("A", 2), ("B", 1), ("C", 1)):
        for i in range(reps):
            rows.append((conv, i, "user", "  Thanks!  "))
    rows.append(("A", 9, "user", "rare"))
    rows.append(("B", 9, "assistant", ""))  # empty drops
    t = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
    })
    out = template_turns(_rd().from_arrow(t).repartition(2),
                         min_convs=3).take_all()
    assert len(out) == 1
    row = out[0]
    assert (row["role"], row["text_norm"]) == ("user", "thanks!")
    assert (row["n_convs"], row["n_turns"]) == (3, 4)


def test_harmonic_centrality_path_graph(ray_session):
    """Path a-b-c-d (symmetric edges): from seed a, hops b=1 c=2 d=3 ->
    harmonic = 1 + 1/2 + 1/3 = 1.8333, n_reached = 3."""
    import numpy as np

    from easyner_ray.ops.graph_analytics import bfs_hops

    e = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
         ("c", "d"), ("d", "c")]
    edges = _rd().from_arrow(pa.table({
        "subj": [x[0] for x in e], "obj": [x[1] for x in e],
        "weight": pa.array([1] * len(e), pa.int64())}))
    rows = bfs_hops(edges, ["a"], max_hops=3).take_all()
    h = np.array([r["hop"] for r in rows if r["hop"] > 0])
    assert sorted(h.tolist()) == [1, 2, 3]
    assert round(float(np.sum(1.0 / h)), 4) == 1.8333
