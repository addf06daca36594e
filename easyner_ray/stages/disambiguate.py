"""Scored entity disambiguation — the north-star NEL upgrade.

The reference's NEL is an exact-match lookup taking ALL matching ids
(``nel.py:26-30``); the north rule upgrades it to candidate generation +
scored disambiguation. Engine shape: a stateful actor pool holding

  * the alias table (norm -> candidate ids) — broadcast once;
  * an id-profile embedding matrix — here a deterministic hash-projection
    stub standing in for a learned KB embedding (the container has no
    model weights; the actor signature, scoring math and output layout are
    the real thing);

and scoring each candidate by cosine(context_vector, id_profile), where
the context vector embeds the OTHER mention norms in the same sentence
(co-occurrence context — seeded by the reference's hasCoOccurrence
predicate, ``entity_parser.py:41-42``). Deterministic tie-break on id.

Input: nested sentence-mentions (sentence-atomic rows mean the context is
row-local — no shuffle). Output: flat linked mentions with ``entity_id``
and ``link_score``; unambiguous/unmatched behavior matches the reference
('' for no candidate, the single id for exactly one).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray

from easyner_ray import schemas

DIM = 32

LINKED_SCHEMA = schemas.MENTIONS.append(pa.field("entity_id", pa.string())).append(
    pa.field("link_score", pa.float64())
)


def hash_embed(text: str, dim: int = DIM) -> np.ndarray:
    """Deterministic unit vector from a string (stub KB/context encoder):
    seeded pseudo-random projection keyed by crc32."""
    rng = np.random.RandomState(zlib.crc32(text.encode()) & 0xFFFFFFFF)
    v = rng.randn(dim)
    return v / (np.linalg.norm(v) or 1.0)


class Disambiguator:
    def __init__(self, alias, dim: int = DIM):
        if isinstance(alias, ray.ObjectRef):
            alias = ray.get(alias)
        from easyner_ray.stages.nel import build_alias_dict

        if not isinstance(alias, dict):
            alias = build_alias_dict(alias)
        self.alias = alias
        self.dim = dim
        # id-profile matrix built ONCE per actor
        ids = sorted({i for v in alias.values() for i in v})
        self.id_vec = {i: hash_embed("id:" + i, dim) for i in ids}
        self._ctx_cache: dict[str, np.ndarray] = {}

    def _ctx(self, norm: str) -> np.ndarray:
        v = self._ctx_cache.get(norm)
        if v is None:
            v = hash_embed("ctx:" + norm, self.dim)
            self._ctx_cache[norm] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in LINKED_SCHEMA.names}
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        sidx = batch.column("sent_idx").to_pylist()
        ments = batch.column("mentions").to_pylist()
        for cid, ti, si, ms in zip(conv, tidx, sidx, ments):
            norms = [m["norm"] for m in ms]
            for m in ms:
                cands = self.alias.get(m["norm"], [])
                if not cands:
                    chosen, score = "", 0.0
                elif len(cands) == 1:
                    chosen, score = cands[0], 1.0
                else:
                    # context = mean of the OTHER mention norms' vectors
                    others = [n for n in norms if n != m["norm"]]
                    if others:
                        ctx = np.mean([self._ctx(n) for n in others], axis=0)
                        nrm = np.linalg.norm(ctx)
                        ctx = ctx / nrm if nrm else ctx
                    else:
                        ctx = self._ctx(m["norm"])
                    scored = sorted(
                        ((float(self.id_vec[c] @ ctx), c) for c in cands),
                        key=lambda t: (-t[0], t[1]),
                    )
                    score, chosen = scored[0]
                out["conv_id"].append(cid)
                out["turn_idx"].append(ti)
                out["sent_idx"].append(si)
                out["mention_idx"].append(m["mention_idx"])
                out["surface"].append(m["surface"])
                out["norm"].append(m["norm"])
                out["cls"].append(m["cls"])
                out["start"].append(m["start"])
                out["end"].append(m["end"])
                out["entity_id"].append(chosen)
                out["link_score"].append(score)
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in LINKED_SCHEMA], schema=LINKED_SCHEMA
        )


def disambiguate_mentions(sentence_mentions, alias, *, concurrency=(1, 8),
                          batch_size: int = 2048, num_cpus: float = 1):
    """Nested sentence-mentions + alias table -> one linked row per mention
    with the best-scoring candidate id (deterministic)."""
    alias_arg = alias
    if not isinstance(alias, ray.ObjectRef) and not isinstance(alias, dict):
        from easyner_ray.stages.nel import build_alias_dict

        alias = build_alias_dict(alias)
        alias_arg = alias
    if isinstance(alias, dict) and len(alias) > 10_000:
        alias_arg = ray.put(alias)
    return sentence_mentions.map_batches(
        Disambiguator,
        fn_constructor_kwargs={"alias": alias_arg},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
