"""Node canonicalization + edge aggregation — THE wide shuffles of the KG
build (SURVEY.md §2.5 A8, §4).

Both are two-phase (partial-then-final) aggregations: a VECTORIZED
``pyarrow.Table.group_by`` pass collapses each batch to one row per key, so
the shuffle that follows moves at most (#keys x #batches) rows instead of
every mention. This is what makes hot keys (the "rapamycin" pattern — one
entity in >60% of documents, cf. the reference's sample analysis TSV) safe:
a hot key contributes ONE partial row per batch regardless of its in-batch
frequency, which bounds the final group size by the batch count — the same
guarantee salting would give, without a salt column.

The final combine is a native Ray ``groupby().aggregate`` (Sum + a custom
``AggregateFnV2`` for the alias union) — no per-group pandas ``map_groups``,
so the node count can grow to millions without a Python-per-group penalty.

``node_id`` is a deterministic content hash ``md5(cls|norm)[:16]`` — so
edges resolve their endpoint ids by hashing, with NO join against the nodes
table (a join the reference's NEL path would have needed at scale).
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

from easyner_ray import schemas

MAX_ALIASES = 20


def node_id(cls: str, norm: str) -> str:
    return hashlib.md5(f"{cls}|{norm}".encode()).hexdigest()[:16]


def cls_of_norm_map(term_sets) -> dict[str, str]:
    """norm -> cls map derived from the dictionary term sets, used to hash
    edge endpoint ids with the SAME (cls, norm) key the nodes table uses —
    keeping edges.subj_id/obj_id referentially valid against nodes.node_id
    without any join. Conflicts (a norm carrying two classes across term
    sets) resolve to the lexicographically smallest cls, matching the
    oracle's ``min(cls)``."""
    from easyner_ray.functions.tokenize import norm_key

    out: dict[str, str] = {}
    for terms in term_sets:
        for term, cls in terms:
            n = norm_key(term)
            prev = out.get(n)
            if prev is None or cls < prev:
                out[n] = cls
    return out


def _partial_nodes(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["norm", "cls"]).aggregate(
        [("surface", "count"), ("surface", "distinct")]
    )
    aliases = [
        sorted(x)[:MAX_ALIASES] for x in g.column("surface_distinct").to_pylist()
    ]
    return pa.Table.from_arrays(
        [
            g.column("norm"),
            g.column("cls"),
            g.column("surface_count").cast(pa.int64()),
            pa.array(aliases, pa.list_(pa.string())),
        ],
        names=["norm", "cls", "n", "aliases"],
    )


def _combine_nodes_bucket(t: pa.Table) -> pa.Table:
    """Per-bucket vectorized final: sum counts; union alias lists by
    flattening list offsets (Arrow kernels) + one distinct group_by."""
    import pyarrow.compute as pc

    counts = t.group_by(["norm", "cls"]).aggregate([("n", "sum")])
    # flatten aliases with their parent (norm, cls) keys, then distinct-list
    al = t.column("aliases").combine_chunks()
    flat_al = pc.list_flatten(al)
    parent = pc.list_parent_indices(al)
    keys = pa.Table.from_arrays(
        [
            t.column("norm").take(parent),
            t.column("cls").take(parent),
            flat_al,
        ],
        names=["norm", "cls", "alias"],
    )
    al_g = keys.group_by(["norm", "cls"]).aggregate([("alias", "distinct")])
    # pyarrow's join can't carry list columns; align alias lists to the
    # count rows with a per-bucket dict (bucket keyspace is #nodes /
    # n_buckets). Output is driven by COUNTS — a key whose partials all
    # carry empty alias lists (single-pass / incremental shapes) must
    # still emit its node.
    als = {
        (n, c): sorted(a)[:MAX_ALIASES]
        for n, c, a in zip(
            al_g.column("norm").to_pylist(),
            al_g.column("cls").to_pylist(),
            al_g.column("alias_distinct").to_pylist(),
        )
    }
    norms = counts.column("norm").to_pylist()
    clss = counts.column("cls").to_pylist()
    aliases = [als.get((n, c), []) for n, c in zip(norms, clss)]
    ids = [node_id(c, n) for c, n in zip(clss, norms)]
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array(norms, pa.string()),
            pa.array(clss, pa.string()),
            counts.column("n_sum").cast(pa.int64()),
            pa.array(aliases, pa.list_(pa.string())),
        ],
        schema=schemas.NODES,
    )


def canonical_nodes(mentions, batch_size: int = 524288, n_buckets: int = 64):
    """Flat mentions Dataset -> nodes Dataset (schemas.NODES).

    Final combine is a coarse-bucket shuffle (hash of norm) + per-bucket
    Arrow group_by — no Python-per-group cost, so node cardinality can hit
    millions (see ops.relational.bucketed_final for the rationale)."""
    from easyner_ray.ops.relational import add_hash_bucket

    partial = mentions.map_batches(_partial_nodes, batch_format="pyarrow", batch_size=batch_size)
    bucketed = partial.map_batches(
        lambda t: add_hash_bucket(t, ["norm", "cls"], n_buckets), batch_format="pyarrow"
    )
    return bucketed.groupby("__bucket").map_groups(
        _combine_nodes_bucket, batch_format="pyarrow"
    )


def _partial_edges(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["subj", "pred", "obj"]).aggregate([("subj", "count")])
    return pa.Table.from_arrays(
        [
            g.column("subj"),
            g.column("pred"),
            g.column("obj"),
            g.column("subj_count").cast(pa.int64()),
        ],
        names=["subj", "pred", "obj", "w"],
    )


def aggregate_edges(triples, batch_size: int = 524288, cls_of_norm=None):
    """Triples Dataset -> aggregated edges (schemas.EDGES).

    ``weight`` counts triple occurrences (one per sentence of evidence —
    per-sentence distinctness is already enforced upstream).
    ``cls_of_norm``: optional broadcastable dict norm->cls used to compute
    endpoint node ids; when None, ids hash the bare norm (untyped graph).
    """
    import ray as _ray

    from easyner_ray.ops.relational import bucketed_final

    partial = triples.map_batches(_partial_edges, batch_format="pyarrow", batch_size=batch_size)
    agg = bucketed_final(partial, ["subj", "pred", "obj"],
                         pa_aggs=[("w", "sum")], out_names=["weight"])

    cls_ref = _ray.put(cls_of_norm) if isinstance(cls_of_norm, dict) and cls_of_norm else cls_of_norm

    def add_ids(t: pa.Table) -> pa.Table:
        cls_of = _ray.get(cls_ref) if isinstance(cls_ref, _ray.ObjectRef) else (cls_ref or {})
        subj = t.column("subj").to_pylist()
        obj = t.column("obj").to_pylist()
        sid = [node_id(cls_of.get(s, ""), s) for s in subj]
        oid = [node_id(cls_of.get(o, ""), o) for o in obj]
        return pa.Table.from_arrays(
            [
                pa.array(sid, pa.string()),
                t.column("subj"),
                t.column("pred"),
                pa.array(oid, pa.string()),
                t.column("obj"),
                t.column("weight").cast(pa.int64()),
            ],
            schema=schemas.EDGES,
        )

    return agg.map_batches(add_ids, batch_format="pyarrow")


def lineage_record(stage: str, inputs: list[str], extra: dict | None = None) -> str:
    """Small JSON lineage blob written into partition manifests."""
    return json.dumps({"stage": stage, "inputs": inputs, **(extra or {})}, sort_keys=True)
