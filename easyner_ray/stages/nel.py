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
    """Vectorized broadcast lookup: the alias dict flattens ONCE per
    worker into (all_ids, offset, count) arrays; per batch the norm column
    dictionary-encodes, every row's candidate ids resolve through numpy
    repeat-range arithmetic, and the 1->many explode is a single ``take``
    — no Python loop over mention rows."""

    def __init__(self, alias):
        import numpy as np

        if isinstance(alias, ray.ObjectRef):
            alias = ray.get(alias)
        if not isinstance(alias, dict):
            alias = build_alias_dict(alias)
        self.alias = alias
        flat: list[str] = []
        self._off: dict[str, tuple[int, int]] = {}
        for term, ids in alias.items():
            self._off[term] = (len(flat), len(ids))
            flat.extend(ids)
        self._all_ids = np.array(flat + [""], dtype=object)
        self._miss = len(flat)  # index of the sentinel "" id

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        enc = batch.column("norm").combine_chunks().dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dict_vals = enc.dictionary.to_pylist()
        d_start = np.empty(len(dict_vals), dtype=np.int64)
        d_cnt = np.empty(len(dict_vals), dtype=np.int64)
        for i, v in enumerate(dict_vals):  # once per DISTINCT norm
            start, cnt = self._off.get(v, (self._miss, 1))
            d_start[i], d_cnt[i] = start, cnt
        idx = np.asarray(enc.indices)
        starts, lens = d_start[idx], d_cnt[idx]
        total = int(lens.sum())
        # flat positions: for each row r, the range [starts[r], +lens[r])
        pos = (np.arange(total)
               - np.repeat(np.cumsum(lens) - lens, lens)
               + np.repeat(starts, lens))
        ids = pa.array(self._all_ids[pos], pa.string())
        take = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), lens))
        out = batch.take(take)
        return out.append_column(pa.field("entity_id", pa.string()), ids)


def link_mentions(mentions, alias, *, concurrency=None, batch_size: int = 8192, num_cpus: float = 1):
    """mentions Dataset + alias (dict / pairs / ObjectRef) -> linked mentions.

    Task pool with per-worker cached state keyed by the broadcast alias
    ref (always ``ray.put`` so the cache key is an ObjectRef hex, never a
    reusable ``id()``): hydration is one zero-copy object-store read, so an
    actor pool's creation latency would dominate at bench scale.
    ``concurrency`` is accepted for API compatibility and ignored."""
    from easyner_ray.ops.similarity import _task_fn

    if not isinstance(alias, ray.ObjectRef):
        if not isinstance(alias, dict):
            alias = build_alias_dict(alias)
        alias = ray.put(alias)
    alias_ref = alias
    return mentions.map_batches(
        _task_fn("nel", (alias_ref,), lambda: LinkMentions(alias=alias_ref)),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=num_cpus,
    )
