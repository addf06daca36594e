"""Entity linking (NEL) — broadcast exact-match lookup, actor-pool stage.

Reference semantics (reference ``nel.py:7-37``): a term->ID table loaded
from TSV; for each entity an exact match on the term; ALL matching ids are
taken (one mention can yield several linked rows); no match -> ``""``.

Engine realization: the alias table is the small side — broadcast once via
``ray.put`` and held as a dict[norm -> list[id]] in each actor's
``__init__`` (a map-side join; no shuffle). Input: flat mentions
(schemas.MENTIONS); output: schemas.LINKED_MENTIONS where an ambiguous term
explodes into one row per id, mirroring the reference's list-extend.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from easyner_ray import schemas


def build_alias_dict(pairs) -> dict[str, list[str]]:
    d: dict[str, list[str]] = {}
    for term, id_ in pairs:
        d.setdefault(term, []).append(id_)
    for v in d.values():
        v.sort()
    return d


class LinkMentions:
    def __init__(self, alias):
        if isinstance(alias, ray.ObjectRef):
            alias = ray.get(alias)
        if not isinstance(alias, dict):
            alias = build_alias_dict(alias)
        self.alias = alias

    def __call__(self, batch: pa.Table) -> pa.Table:
        norms = batch.column("norm").to_pylist()
        take: list[int] = []  # source row index per output row
        ids: list[str] = []
        for i, n in enumerate(norms):
            matched = self.alias.get(n)
            if not matched:
                take.append(i)
                ids.append("")
            else:
                for id_ in matched:
                    take.append(i)
                    ids.append(id_)
        out = batch.take(pa.array(take, pa.int64()))
        return out.append_column(pa.field("entity_id", pa.string()), pa.array(ids, pa.string()))


def link_mentions(mentions, alias, *, concurrency=(1, 8), batch_size: int = 8192, num_cpus: float = 1):
    """mentions Dataset + alias (dict / pairs / ObjectRef) -> linked mentions."""
    alias_arg = alias
    if not isinstance(alias, ray.ObjectRef):
        if not isinstance(alias, dict):
            alias = build_alias_dict(alias)
        alias_arg = ray.put(alias) if len(alias) > 10_000 else alias
    ds = mentions.map_batches(
        LinkMentions,
        fn_constructor_kwargs={"alias": alias_arg},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
    return ds
