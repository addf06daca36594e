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


# Worker-process cache for task-pool NER state. The dictionary matcher
# builds in ~1ms, so it does NOT need a pinned actor pool (whose creation
# latency and CPU pinning dominate at bench scale and can starve the read
# at low CPU counts): plain map_batches TASKS reuse Ray's prestarted
# workers, and each worker process builds the matcher once, lazily, keyed
# by the broadcast term-set ObjectRef. Expensive model state (Transformers
# NER) keeps the actor-pool shape — this path is for cheap state only.
_PARTIALS_CACHE: dict = {}


def _kg_partials_fn(term_sets_ref):
    import ray as _ray

    key = term_sets_ref.hex() if hasattr(term_sets_ref, "hex") else str(id(term_sets_ref))

    def fn(batch):
        ner = _PARTIALS_CACHE.get(key)
        if ner is None:
            ts = (_ray.get(term_sets_ref)
                  if isinstance(term_sets_ref, _ray.ObjectRef) else term_sets_ref)
            ner = KGPartialsNER(ts)
            _PARTIALS_CACHE[key] = ner
        return ner(batch)

    return fn


def build_kg_single_pass(
    transcripts,
    term_sets=None,
    *,
    ner_concurrency=(1, 8),
    ner_batch_size: int = 8192,
    combine: str = "tree",
):
    """The throughput shape of the KG build: read -> split+NER+partials in
    ONE fused task-pool pass (matcher cached per worker process) -> final
    combine -> materialize the finished graph (small) -> nodes/edges are
    cheap filters over it. ``ner_concurrency`` is accepted for API
    compatibility and ignored (tasks scale with free CPUs; no pinned pool
    to size).

    ``combine`` picks the final-aggregation strategy:

      * ``"tree"`` (default) — NO keyed shuffle: the partial stream
        materializes (the resume checkpoint), a coalescing ``map_batches``
        collapses ~1M-row chunks to one row per key, and one tiny task
        finishes the graph. Correct whenever the final keyspace fits a
        task; with dictionary NER the keyspace is bounded by |vocab|^2
        pairs + |vocab| nodes — far below corpus size. The 100-TB shape
        for closed vocabularies.
      * ``"shuffle"`` — ONE bucket-shuffle final (hash of the kind-specific
        key, 64 buckets, per-bucket Arrow group_by). Use when the keyspace
        itself is corpus-scale (open-vocabulary model NER).

    vs :func:`build_kg`: NER runs once, nothing row-level materializes
    (the checkpoint is the collapsed partials — ~2 orders of magnitude
    smaller than the nested backbone), node aliases omitted.
    Returns {"nodes": Dataset, "edges": Dataset}.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray as _ray

    from easyner_ray import schemas
    from easyner_ray.ops.relational import add_hash_bucket
    from easyner_ray.sources import vocab as _vocab
    from easyner_ray.stages.canonicalize import node_id
    from easyner_ray.stages.splitter import split_sentences

    if term_sets is None:
        term_sets = [_vocab.vocabulary()]
    cls_ref = _ray.put(cls_of_norm_map(term_sets))
    sentences = split_sentences(drop_empty_turns(transcripts))
    # task pool + per-worker cached matcher (see _kg_partials_fn): no actor
    # creation latency, no pinned CPUs; ner_concurrency is accepted for API
    # compatibility but tasks simply scale with free CPUs. No second-level
    # recollapse: each batch is already collapsed to one row per key by the
    # fused partial stage, and rebatching to giant blocks for another
    # combine costs more than shuffling the extra rows (measured ~3x).
    combined = sentences.map_batches(
        _kg_partials_fn(_ray.put(term_sets)),
        batch_format="pyarrow",
        batch_size=ner_batch_size,
    )

    # bucket on the kind-specific key (edge triple or node (norm, cls)) —
    # the shuffle variant; each bucket group-bys the two kinds separately
    def keyed(t: pa.Table) -> pa.Table:
        key = pc.if_else(
            pc.equal(t.column("kind"), "e"),
            pc.binary_join_element_wise(
                pc.coalesce(t.column("subj"), ""), pc.coalesce(t.column("pred"), ""),
                pc.coalesce(t.column("obj"), ""), "\x00"),
            pc.binary_join_element_wise(
                pc.coalesce(t.column("norm"), ""), pc.coalesce(t.column("cls"), ""),
                "\x00"),
        )
        return add_hash_bucket(t.append_column("__key", key), ["__key"], 64)

    def collapse_partials(t: pa.Table) -> pa.Table:
        """partial-shape -> partial-shape, one row per key (algebraic, so
        it can be applied at any tree level)."""
        e = t.filter(pc.equal(t.column("kind"), "e"))
        n = t.filter(pc.equal(t.column("kind"), "n"))
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

    def final_bucket(t: pa.Table) -> pa.Table:
        cls_of = _ray.get(cls_ref)
        e = t.filter(pc.equal(t.column("kind"), "e"))
        n = t.filter(pc.equal(t.column("kind"), "n"))
        ge = e.group_by(["subj", "pred", "obj"]).aggregate([("w", "sum")])
        gn = n.group_by(["norm", "cls"]).aggregate([("n", "sum")])
        subj = ge.column("subj").to_pylist()
        obj = ge.column("obj").to_pylist()
        norms = gn.column("norm").to_pylist()
        clss = gn.column("cls").to_pylist()
        n_e, n_n = len(ge), len(gn)
        return pa.Table.from_arrays(
            [
                pa.array(["e"] * n_e + ["n"] * n_n, pa.string()),
                # edge columns (endpoint ids hash the SAME (cls, norm) key
                # node ids use, via the broadcast norm->cls map)
                pa.array([node_id(cls_of.get(s, ""), s) for s in subj] + [None] * n_n,
                         pa.string()),
                pa.concat_arrays([ge.column("subj").combine_chunks(), pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([ge.column("pred").combine_chunks(), pa.nulls(n_n, pa.string())]),
                pa.array([node_id(cls_of.get(o, ""), o) for o in obj] + [None] * n_n,
                         pa.string()),
                pa.concat_arrays([ge.column("obj").combine_chunks(), pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([ge.column("w_sum").cast(pa.int64()).combine_chunks(),
                                  pa.nulls(n_n, pa.int64())]),
                # node columns
                pa.array([None] * n_e + [node_id(c, nm) for c, nm in zip(clss, norms)],
                         pa.string()),
                pa.concat_arrays([pa.nulls(n_e, pa.string()), gn.column("norm").combine_chunks()]),
                pa.concat_arrays([pa.nulls(n_e, pa.string()), gn.column("cls").combine_chunks()]),
                pa.concat_arrays([pa.nulls(n_e, pa.int64()),
                                  gn.column("n_sum").cast(pa.int64()).combine_chunks()]),
            ],
            names=["kind", "subj_id", "subj", "pred", "obj_id", "obj", "weight",
                   "node_id", "norm", "cls", "n_mentions"],
        )

    if combine == "tree":
        # materialize the partial stream (the resume checkpoint; also a
        # fusion barrier so the coalescing combine below doesn't force the
        # NER stage onto million-row batches), then collapse ~1M-row chunks
        # and finish in one tiny task — no keyed shuffle anywhere
        part = combined.materialize()
        lvl1 = part.map_batches(collapse_partials, batch_format="pyarrow",
                                batch_size=1_000_000)
        graph = (
            lvl1.repartition(1)
            .map_batches(final_bucket, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
    else:
        graph = (
            combined.map_batches(keyed, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(final_bucket, batch_format="pyarrow")
            .materialize()
        )

    def as_nodes(t: pa.Table) -> pa.Table:
        n = t.filter(pc.equal(t.column("kind"), "n"))
        return pa.Table.from_arrays(
            [n.column("node_id"), n.column("norm"), n.column("cls"),
             n.column("n_mentions"),
             pa.array([[]] * len(n), pa.list_(pa.string()))],
            schema=schemas.NODES,
        )

    def as_edges(t: pa.Table) -> pa.Table:
        e = t.filter(pc.equal(t.column("kind"), "e"))
        return pa.Table.from_arrays(
            [e.column("subj_id"), e.column("subj"), e.column("pred"),
             e.column("obj_id"), e.column("obj"), e.column("weight")],
            schema=schemas.EDGES,
        )

    nodes = graph.map_batches(as_nodes, batch_format="pyarrow")
    edges = graph.map_batches(as_edges, batch_format="pyarrow")
    return {"nodes": nodes, "edges": edges}
