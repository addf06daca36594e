"""Incremental KG updates: fold NEW transcript shards into existing
node/edge sinks without reprocessing old data.

Nodes and edges are purely ADDITIVE aggregates (mention counts, edge
weights), so an update is: run the single-pass partial extraction over the
new shards only, union with the EXISTING aggregate tables (read back from
the sink — they are already one-row-per-key), and re-run the bucketed
final. Work is bounded by |new data| + |current graph|, never by the
corpus history — the 100-TB ingest shape, where a day's shards fold into
a graph whose size is the entity vocabulary, not the corpus.

Exactness invariant (tested): ``update(build(A), B) == build(A ∪ B)``.

The rewrite targets the same partitioned sink layout; every partition is
rewritten (any partition may contain touched keys — hot entities appear
everywhere), but partitions remain independently auditable and the
previous state can be retained by pointing ``out_dir`` at a new root
(snapshot-per-ingest layout).
"""

from __future__ import annotations

import os

import pyarrow as pa


def _edges_as_partials(edges):
    """Existing EDGES rows -> the combined-partial shape (subj,pred,obj,w)."""

    def f(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("subj"), t.column("pred"), t.column("obj"),
             t.column("weight").cast(pa.int64())],
            names=["subj", "pred", "obj", "w"],
        )

    return edges.map_batches(f, batch_format="pyarrow")


def _nodes_as_partials(nodes):
    """Existing NODES rows -> the _partial_nodes shape
    (norm, cls, n, aliases) — old alias lists ride along and survive the
    alias-aware final combine."""

    def f(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("norm"), t.column("cls"),
             t.column("n_mentions").cast(pa.int64()),
             t.column("aliases")],
            names=["norm", "cls", "n", "aliases"],
        )

    return nodes.map_batches(f, batch_format="pyarrow")


def update_graph(
    new_transcripts,
    graph_dir: str,
    *,
    term_sets=None,
    out_dir: str | None = None,
    num_partitions: int = 32,
    ner_concurrency=(1, 8),
):
    """Fold ``new_transcripts`` into the graph at ``graph_dir``
    (``<graph_dir>/nodes`` + ``<graph_dir>/edges`` partitioned sinks).

    Writes the updated graph to ``out_dir`` (snapshot-per-ingest layout).
    ``out_dir`` MUST differ from ``graph_dir``: Ray reads the old graph
    lazily during the write, and Parquet sinks append files — an in-place
    update would read-while-overwriting and duplicate rows. Keeping each
    ingest a new snapshot also preserves the audit trail. Returns
    {"nodes": Dataset, "edges": Dataset, "nodes_sink": ..., "edges_sink": ...}.
    """
    import pyarrow.compute as pc

    import ray as _ray

    from easyner_ray import schemas
    from easyner_ray.ops.relational import add_hash_bucket, bucketed_final
    from easyner_ray.pipelines.kg import (_kg_partials_fn, drop_empty_turns,
                                          int_partials_to_string_partials)
    from easyner_ray.sources import vocab as _vocab
    from easyner_ray.stages.canonicalize import (_combine_nodes_bucket,
                                                 cls_of_norm_map,
                                                 lineage_record, node_id)
    from easyner_ray.stages.splitter import split_sentences
    from easyner_ray.state.sink import read_partitioned, write_partitioned

    if term_sets is None:
        term_sets = [_vocab.vocabulary()]
    cls_ref = _ray.put(cls_of_norm_map(term_sets))
    if out_dir is not None and os.path.realpath(out_dir) == os.path.realpath(graph_dir):
        raise ValueError(
            "out_dir must differ from graph_dir: the old graph is read "
            "lazily during the write (snapshot-per-ingest layout)"
        )

    # partials from the NEW data only (single-pass fused stage; task pool
    # with per-worker cached matcher — see kg._kg_partials_fn); decoded
    # from the compact int stream to string keys so they union with the
    # existing graph's rows
    sentences = split_sentences(drop_empty_turns(new_transcripts))
    combined = int_partials_to_string_partials(
        sentences.map_batches(
            _kg_partials_fn(_ray.put(term_sets)),
            batch_format="pyarrow",
            batch_size=8192,
        ),
        term_sets,
    )

    new_edge_partials = combined.filter(expr="kind == 'e'").select_columns(
        ["subj", "pred", "obj", "w"])
    new_node_partials = combined.filter(expr="kind == 'n'").select_columns(
        ["norm", "cls", "n"])

    # existing aggregates, reinterpreted as partials
    old_edges = _edges_as_partials(
        read_partitioned(os.path.join(graph_dir, "edges"),
                         columns=["subj", "pred", "obj", "weight"])
    )
    old_nodes = _nodes_as_partials(
        read_partitioned(os.path.join(graph_dir, "nodes"),
                         columns=["norm", "cls", "n_mentions", "aliases"])
    )

    edges_agg = bucketed_final(old_edges.union(new_edge_partials),
                               ["subj", "pred", "obj"],
                               pa_aggs=[("w", "sum")], out_names=["weight"])

    def edge_ids(t: pa.Table) -> pa.Table:
        # same (cls, norm) hash key the nodes table uses (broadcast map) —
        # edges stay referentially valid against nodes.node_id, no join
        cls_of = _ray.get(cls_ref)
        subj = t.column("subj").to_pylist()
        obj = t.column("obj").to_pylist()
        return pa.Table.from_arrays(
            [
                pa.array([node_id(cls_of.get(s, ""), s) for s in subj], pa.string()),
                t.column("subj"), t.column("pred"),
                pa.array([node_id(cls_of.get(o, ""), o) for o in obj], pa.string()),
                t.column("obj"), t.column("weight").cast(pa.int64()),
            ],
            schema=schemas.EDGES,
        )

    edges = edges_agg.map_batches(edge_ids, batch_format="pyarrow")

    # Nodes fold through the alias-AWARE final combine: old rows carry their
    # alias lists (preserved + unioned), new single-pass partials contribute
    # counts with empty alias lists (the fused partial stage discards
    # surfaces by design — new aliases accrue only via a staged rebuild).
    def empty_aliases(t: pa.Table) -> pa.Table:
        return t.append_column(
            "aliases", pa.array([[]] * len(t), pa.list_(pa.string()))
        )

    node_partials = old_nodes.union(
        new_node_partials.map_batches(empty_aliases, batch_format="pyarrow"))
    bucketed = node_partials.map_batches(
        lambda t: add_hash_bucket(t, ["norm", "cls"], 64), batch_format="pyarrow"
    )
    nodes = bucketed.groupby("__bucket").map_groups(
        _combine_nodes_bucket, batch_format="pyarrow"
    )

    out = {"nodes": nodes, "edges": edges}
    target = out_dir
    if target:
        # snapshot write into the fresh root; resume disabled because every
        # partition legitimately changes content on update
        out["nodes_sink"] = write_partitioned(
            nodes, os.path.join(target, "nodes"), key_col="norm",
            num_partitions=num_partitions, resume=False,
            lineage=lineage_record("nodes-incremental", [graph_dir]),
        )
        out["edges_sink"] = write_partitioned(
            edges, os.path.join(target, "edges"), key_col="subj",
            num_partitions=num_partitions, resume=False,
            lineage=lineage_record("edges-incremental", [graph_dir]),
        )
    return out
