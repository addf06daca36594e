"""Node canonicalization + edge aggregation — THE wide shuffles of the KG
build (SURVEY.md §2.5 A8, §4).

Both are two-phase (partial-then-final) aggregations: a vectorized
``map_batches`` pass first collapses each batch to one row per key, so the
``groupby`` that follows shuffles at most (#keys x #batches) rows instead of
every mention. This is what makes hot keys (the "rapamycin" pattern — one
entity in >60% of documents, cf. the reference's sample analysis TSV)
safe: a hot key contributes ONE partial row per batch regardless of its
in-batch frequency, which bounds the final group size by the batch count —
the same guarantee salting would give, without a salt column.

``node_id`` is a deterministic content hash ``md5(cls|norm)[:16]`` — so
edges resolve their endpoint ids by hashing, with NO join against the nodes
table (a join the reference's NEL path would have needed at scale).
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
import pyarrow as pa

from easyner_ray import schemas

MAX_ALIASES = 20


def node_id(cls: str, norm: str) -> str:
    return hashlib.md5(f"{cls}|{norm}".encode()).hexdigest()[:16]


def _partial_nodes(batch: pa.Table) -> pa.Table:
    norms = batch.column("norm").to_pylist()
    clss = batch.column("cls").to_pylist()
    surfs = batch.column("surface").to_pylist()
    acc: dict[tuple[str, str], list] = {}
    for norm, cls, surf in zip(norms, clss, surfs):
        ent = acc.get((norm, cls))
        if ent is None:
            acc[(norm, cls)] = [1, {surf}]
        else:
            ent[0] += 1
            if len(ent[1]) < MAX_ALIASES:
                ent[1].add(surf)
    keys = sorted(acc)
    return pa.Table.from_arrays(
        [
            pa.array([k[0] for k in keys], pa.string()),
            pa.array([k[1] for k in keys], pa.string()),
            pa.array([acc[k][0] for k in keys], pa.int64()),
            pa.array([sorted(acc[k][1]) for k in keys], pa.list_(pa.string())),
        ],
        names=["norm", "cls", "n", "aliases"],
    )


def canonical_nodes(mentions, batch_size: int = 65536):
    """Flat mentions Dataset -> nodes Dataset (schemas.NODES)."""
    partial = mentions.map_batches(_partial_nodes, batch_format="pyarrow", batch_size=batch_size)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        norm = g["norm"].iloc[0]
        cls = g["cls"].iloc[0]
        aliases: set[str] = set()
        for a in g["aliases"]:
            aliases.update(a)
            if len(aliases) >= MAX_ALIASES:
                break
        return pd.DataFrame(
            {
                "node_id": [node_id(cls, norm)],
                "norm": [norm],
                "cls": [cls],
                "n_mentions": pd.array([int(g["n"].sum())], dtype="int64"),
                "aliases": [sorted(aliases)[:MAX_ALIASES]],
            }
        )

    return partial.groupby(["norm", "cls"]).map_groups(final, batch_format="pandas")


def _partial_edges(batch: pa.Table) -> pa.Table:
    subj = batch.column("subj").to_pylist()
    pred = batch.column("pred").to_pylist()
    obj = batch.column("obj").to_pylist()
    acc: dict[tuple[str, str, str], int] = {}
    for s, p, o in zip(subj, pred, obj):
        acc[(s, p, o)] = acc.get((s, p, o), 0) + 1
    keys = sorted(acc)
    return pa.Table.from_arrays(
        [
            pa.array([k[0] for k in keys], pa.string()),
            pa.array([k[1] for k in keys], pa.string()),
            pa.array([k[2] for k in keys], pa.string()),
            pa.array([acc[k] for k in keys], pa.int64()),
        ],
        names=["subj", "pred", "obj", "w"],
    )


def aggregate_edges(triples, batch_size: int = 65536, cls_of_norm=None):
    """Triples Dataset -> aggregated edges (schemas.EDGES minus classes).

    ``weight`` counts triple occurrences (one per sentence of evidence —
    the per-sentence distinctness is already enforced upstream).
    ``cls_of_norm``: optional broadcastable dict norm->cls used to compute
    endpoint node ids; when None, ids hash the bare norm (untyped graph).
    """
    from ray.data.aggregate import Sum

    partial = triples.map_batches(_partial_edges, batch_format="pyarrow", batch_size=batch_size)
    agg = partial.groupby(["subj", "pred", "obj"]).aggregate(Sum("w", alias_name="weight"))

    import ray as _ray

    cls_ref = cls_of_norm

    class AddIds:
        def __init__(self, cls_ref=None):
            self.cls_of = _ray.get(cls_ref) if isinstance(cls_ref, _ray.ObjectRef) else (cls_ref or {})

        def __call__(self, t: pa.Table) -> pa.Table:
            subj = t.column("subj").to_pylist()
            obj = t.column("obj").to_pylist()
            sid = [node_id(self.cls_of.get(s, ""), s) for s in subj]
            oid = [node_id(self.cls_of.get(o, ""), o) for o in obj]
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

    return agg.map_batches(
        AddIds,
        fn_constructor_kwargs={"cls_ref": cls_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def lineage_record(stage: str, inputs: list[str], extra: dict | None = None) -> str:
    """Small JSON lineage blob written into partition manifests."""
    return json.dumps({"stage": stage, "inputs": inputs, **(extra or {})}, sort_keys=True)
