"""Flagship pipeline: transcripts -> knowledge graph (north rule).

    read_parquet(transcripts)
      -> filter empty turns (vectorized predicate)
      -> sentence-split explode               [stateless map_batches]
      -> MultiNER actor pool                  [dict + model taggers, one pass]
      -> (row-local) triples | explode mentions
      -> two-phase nodes / edges aggregation  [the only shuffles]
      -> resumable partitioned Parquet sink   [lineage manifests]

Branch handling: the nested sentence-mentions dataset feeds several
consumers (mentions, triples, search). Ray Data re-executes the shared
lineage per consumer, so ``build_kg`` checkpoints it — in memory
(``materialize``, fine at bench scale) or as Parquet (the 100-TB shape:
write once, read per consumer, and the checkpoint doubles as the resume
point).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc

from easyner_ray.sources import vocab as _vocab
from easyner_ray.stages.canonicalize import (aggregate_edges, canonical_nodes,
                                             cls_of_norm_map, lineage_record)
from easyner_ray.stages.dict_ner import explode_mentions
from easyner_ray.stages.merge import tag_mentions_multi
from easyner_ray.stages.splitter import split_sentences
from easyner_ray.stages.triples import sentence_triples
from easyner_ray.state.sink import write_partitioned


def read_transcripts(path, columns=("conv_id", "turn_idx", "text")):
    """Prune at the read: the KG build needs only 3 of the 6 columns."""
    import ray.data as rd

    return rd.read_parquet(path, columns=list(columns))


def drop_empty_turns(transcripts):
    return transcripts.map_batches(
        lambda t: t.filter(pc.greater(pc.utf8_length(pc.coalesce(t.column("text"), "")), 0)),
        batch_format="pyarrow",
    )


def extract_sentence_mentions(
    transcripts,
    term_sets=None,
    *,
    resolve: bool = False,
    ner_concurrency=(1, 8),
    ner_batch_size: int = 1024,
):
    """transcripts -> nested sentence-mentions (the KG build's backbone)."""
    if term_sets is None:
        term_sets = [_vocab.vocabulary()]
    sentences = split_sentences(drop_empty_turns(transcripts))
    return tag_mentions_multi(
        sentences,
        term_sets,
        resolve=resolve,
        concurrency=ner_concurrency,
        batch_size=ner_batch_size,
    )


def build_kg(
    transcripts,
    term_sets=None,
    *,
    resolve: bool = False,
    out_dir: str | None = None,
    checkpoint: str = "memory",
    num_partitions: int = 32,
    ner_concurrency=(1, 8),
    source_desc: str = "",
):
    """Run the full KG build. Returns dict of Datasets (and sink summaries
    when ``out_dir`` is given).

    checkpoint: 'memory' (materialize the nested backbone) or 'parquet'
    (write/read-back under out_dir — requires out_dir; the scale shape).
    """
    sm = extract_sentence_mentions(
        transcripts, term_sets, resolve=resolve, ner_concurrency=ner_concurrency
    )

    if checkpoint == "parquet":
        if not out_dir:
            raise ValueError("checkpoint='parquet' needs out_dir")
        ckpt = os.path.join(out_dir, "sentence_mentions")
        write_partitioned(
            sm,
            ckpt,
            key_col="conv_id",
            num_partitions=num_partitions,
            lineage=lineage_record("sentence_mentions", [source_desc]),
        )
        from easyner_ray.state.sink import read_partitioned

        sm = read_partitioned(ckpt)
    elif checkpoint == "memory":
        sm = sm.materialize()

    if term_sets is None:
        term_sets = [_vocab.vocabulary()]
    mentions = explode_mentions(sm)
    triples = sentence_triples(sm)
    nodes = canonical_nodes(mentions)
    edges = aggregate_edges(triples, cls_of_norm=cls_of_norm_map(term_sets))

    out = {
        "sentence_mentions": sm,
        "mentions": mentions,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
    }
    if out_dir:
        out["nodes_sink"] = write_partitioned(
            nodes,
            os.path.join(out_dir, "nodes"),
            key_col="norm",
            num_partitions=num_partitions,
            lineage=lineage_record("nodes", [source_desc]),
        )
        out["edges_sink"] = write_partitioned(
            edges,
            os.path.join(out_dir, "edges"),
            key_col="subj",
            num_partitions=num_partitions,
            lineage=lineage_record("edges", [source_desc]),
        )
    return out


# ------------------------------------------------------- single-pass build --

_COMBINED_FIELDS = [
    ("kind", "string"), ("subj", "string"), ("pred", "string"),
    ("obj", "string"), ("w", "int64"), ("norm", "string"),
    ("cls", "string"), ("n", "int64"),
]


class KGPartialsNER:
    """The single-pass fused actor: sentence batch -> tagged mentions ->
    per-batch node/edge PARTIAL aggregates, all inside one actor call.

    Keeping the partial aggregation INSIDE the pool matters: as a separate
    task stage it competes with the pinned actors for the few free CPUs
    and backpressure idles the pool (measured 52% actor utilization).
    Python dict counting is fine here — a batch holds a few thousand
    sentences with a handful of mentions each, and the emitted rows are
    bounded by distinct keys per batch, not mentions.
    """

    def __init__(self, term_sets):
        from easyner_ray.stages.merge import MultiNER

        self.ner = MultiNER(term_sets)
        self._norm_cache: dict[str, str] = {}

    def __call__(self, batch):
        import pyarrow as pa

        from easyner_ray.functions.tokenize import norm_key
        from easyner_ray.stages.triples import PRED_SENTENCE

        cache = self._norm_cache
        tag = self.ner.tag
        node_n: dict[tuple[str, str], int] = {}
        edge_w: dict[tuple[str, str], int] = {}
        for text in batch.column("text").to_pylist():
            found = tag(text)
            if not found:
                continue
            norms_here = set()
            for _s, _e, surf, cls in found:
                norm = cache.get(surf)
                if norm is None:
                    norm = norm_key(surf)
                    cache[surf] = norm
                key = (norm, cls)
                node_n[key] = node_n.get(key, 0) + 1
                norms_here.add(norm)
            if len(norms_here) >= 2:
                uniq = sorted(norms_here)
                for a in uniq:
                    for b in uniq:
                        if a != b:
                            k = (a, b)
                            edge_w[k] = edge_w.get(k, 0) + 1
        n_e, n_n = len(edge_w), len(node_n)
        e_keys = list(edge_w)
        n_keys = list(node_n)
        return pa.Table.from_arrays(
            [
                pa.array(["e"] * n_e + ["n"] * n_n, pa.string()),
                pa.array([k[0] for k in e_keys] + [None] * n_n, pa.string()),
                pa.array([PRED_SENTENCE] * n_e + [None] * n_n, pa.string()),
                pa.array([k[1] for k in e_keys] + [None] * n_n, pa.string()),
                pa.array([edge_w[k] for k in e_keys] + [None] * n_n, pa.int64()),
                pa.array([None] * n_e + [k[0] for k in n_keys], pa.string()),
                pa.array([None] * n_e + [k[1] for k in n_keys], pa.string()),
                pa.array([None] * n_e + [node_n[k] for k in n_keys], pa.int64()),
            ],
            names=[f for f, _ in _COMBINED_FIELDS],
        )


def _recollapse_combined(batch):
    """Second partial level over big coalesced batches: shrinks the rows
    entering the bucket shuffles by another ~5x."""
    import pyarrow as pa
    import pyarrow.compute as pc

    e = batch.filter(pc.equal(batch.column("kind"), "e"))
    n = batch.filter(pc.equal(batch.column("kind"), "n"))
    ge = e.group_by(["subj", "pred", "obj"]).aggregate([("w", "sum")])
    gn = n.group_by(["norm", "cls"]).aggregate([("n", "sum")])
    n_e, n_n = len(ge), len(gn)
    return pa.Table.from_arrays(
        [
            pa.array(["e"] * n_e + ["n"] * n_n, pa.string()),
            pa.concat_arrays([ge.column("subj").combine_chunks(), pa.nulls(n_n, pa.string())]),
            pa.concat_arrays([ge.column("pred").combine_chunks(), pa.nulls(n_n, pa.string())]),
            pa.concat_arrays([ge.column("obj").combine_chunks(), pa.nulls(n_n, pa.string())]),
            pa.concat_arrays([ge.column("w_sum").cast(pa.int64()).combine_chunks(),
                              pa.nulls(n_n, pa.int64())]),
            pa.concat_arrays([pa.nulls(n_e, pa.string()), gn.column("norm").combine_chunks()]),
            pa.concat_arrays([pa.nulls(n_e, pa.string()), gn.column("cls").combine_chunks()]),
            pa.concat_arrays([pa.nulls(n_e, pa.int64()),
                              gn.column("n_sum").cast(pa.int64()).combine_chunks()]),
        ],
        names=[f for f, _ in _COMBINED_FIELDS],
    )


def build_kg_single_pass(
    transcripts,
    term_sets=None,
    *,
    ner_concurrency=(1, 8),
    ner_batch_size: int = 8192,
):
    """The throughput shape of the KG build: read -> split+NER+partials in
    ONE fused actor-pool pass -> recollapse -> materialize the (small)
    combined partial stream -> two bucket-shuffle finals.

    vs :func:`build_kg`: NER runs once, nothing row-level materializes
    (the checkpoint is the collapsed partials — ~2 orders of magnitude
    smaller than the nested backbone), node aliases omitted.
    Returns {"nodes": Dataset, "edges": Dataset}.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray as _ray

    from easyner_ray import schemas
    from easyner_ray.ops.relational import bucketed_final
    from easyner_ray.sources import vocab as _vocab
    from easyner_ray.stages.canonicalize import node_id
    from easyner_ray.stages.splitter import split_sentences

    if term_sets is None:
        term_sets = [_vocab.vocabulary()]
    cls_ref = _ray.put(cls_of_norm_map(term_sets))
    sentences = split_sentences(drop_empty_turns(transcripts))
    combined = sentences.map_batches(
        KGPartialsNER,
        fn_constructor_kwargs={"term_sets": term_sets},
        batch_format="pyarrow",
        batch_size=ner_batch_size,
        concurrency=ner_concurrency,
    )
    combined = combined.map_batches(_recollapse_combined, batch_format="pyarrow",
                                    batch_size=1_000_000).materialize()

    edge_partials = combined.filter(expr="kind == 'e'").select_columns(
        ["subj", "pred", "obj", "w"])
    node_partials = combined.filter(expr="kind == 'n'").select_columns(
        ["norm", "cls", "n"])

    edges_agg = bucketed_final(edge_partials, ["subj", "pred", "obj"],
                               pa_aggs=[("w", "sum")], out_names=["weight"])

    def edge_ids(t: pa.Table) -> pa.Table:
        # endpoint ids hash the SAME (cls, norm) key node_ids uses, via the
        # broadcast norm->cls map — referential integrity without a join
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

    nodes_agg = bucketed_final(node_partials, ["norm", "cls"],
                               pa_aggs=[("n", "sum")], out_names=["n_mentions"])

    def node_ids(t: pa.Table) -> pa.Table:
        norms = t.column("norm").to_pylist()
        clss = t.column("cls").to_pylist()
        return pa.Table.from_arrays(
            [
                pa.array([node_id(c, nm) for c, nm in zip(clss, norms)], pa.string()),
                t.column("norm"), t.column("cls"),
                t.column("n_mentions").cast(pa.int64()),
                pa.array([[] for _ in norms], pa.list_(pa.string())),
            ],
            schema=schemas.NODES,
        )

    nodes = nodes_agg.map_batches(node_ids, batch_format="pyarrow")
    return {"nodes": nodes, "edges": edges}
