"""Co-occurrence association scoring over the KG sentence graph —
PMI / NPMI edge weights.

The reference's analysis layer stops at raw co-occurrence counts
(`easyner/analysis.py` entity frequencies; edges carry plain evidence
counts). Association-normalized weights are the standard next step for a
co-occurrence KG — raw counts rank ubiquitous entities first, NPMI ranks
genuinely associated pairs first. Spec:

    pmi(a,b)  = ln( c_ab * N / (c_a * c_b) )
    npmi(a,b) = pmi / ln( N / c_ab )          in (-1, 1]

where ``c_ab`` = number of sentences mentioning BOTH a and b (distinct
per sentence), ``c_a`` = number of sentences mentioning a, and ``N`` =
total sentence count (including mention-free sentences — the corpus-size
normalizer).

Scale shape: pair counts ride the existing :func:`sentence_triples`
explode (vectorized, per-sentence distinct) into a bucketed grouped
count; singles are one more vocabulary-sized grouped count; both joins
are vocabulary-sized and take :func:`adaptive_join`'s broadcast path
under the byte gate (hash-shuffle above it). The only float math is the
final map over the (vocab x vocab)-bounded edge table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SINGLES_SCHEMA = pa.schema([("norm", pa.string())])


def _singles_batch(t: pa.Table) -> pa.Table:
    """One row per (sentence, distinct norm) — sentence identity is the
    batch row, so per-batch parent indices are a complete sentence key."""
    ments = t.column("mentions").combine_chunks()
    flat = pc.list_flatten(ments)
    if len(flat) == 0:
        return _SINGLES_SCHEMA.empty_table()
    g = pa.Table.from_arrays(
        [pc.list_parent_indices(ments), flat.field("norm")],
        names=["p", "norm"],
    ).group_by(["p", "norm"]).aggregate([])
    return g.select(["norm"])


def npmi_edges(tagged_sentences, n_sentences: int, *,
               round_digits: int = 4):
    """Tagged-sentence Dataset (nested ``mentions``) -> undirected
    association edges ``(norm_a, norm_b, c_ab, c_a, c_b, npmi)`` with
    ``norm_a < norm_b``. ``n_sentences`` is the TOTAL corpus sentence
    count (caller computes it where the stream is already materialized).

    ``tagged_sentences`` is consumed twice (pairs + singles) — it is
    checkpointed here so the upstream NER pipeline runs once (Ray Data
    plans are trees; a fan-out without a checkpoint re-executes lineage
    per consumer).
    """
    from easyner_ray.ops.relational import adaptive_join, grouped_agg
    from easyner_ray.stages.triples import sentence_triples

    tagged = tagged_sentences.materialize()

    pairs = grouped_agg(
        sentence_triples(tagged).map_batches(
            lambda t: t.filter(
                pc.less(t.column("subj"), t.column("obj"))
            ).select(["subj", "obj"]),
            batch_format="pyarrow"),
        ["subj", "obj"], [("subj", "count", "c_ab")],
        final="tree",  # pair keyspace is vocab^2-bounded
    ).map_batches(
        lambda t: t.rename_columns(["norm_a", "norm_b", "c_ab"]),
        batch_format="pyarrow")

    singles = grouped_agg(
        tagged.map_batches(_singles_batch, batch_format="pyarrow"),
        ["norm"], [("norm", "count", "c")], final="tree",
    ).materialize()  # consumed twice (both join sides)

    out = adaptive_join(
        pairs,
        singles.map_batches(lambda t: t.rename_columns(["norm", "c_a"]),
                            batch_format="pyarrow"),
        on="norm_a", right_on="norm")
    out = adaptive_join(
        out,
        singles.map_batches(lambda t: t.rename_columns(["norm", "c_b"]),
                            batch_format="pyarrow"),
        on="norm_b", right_on="norm")

    def score(t: pa.Table, n=float(n_sentences), rd=round_digits) -> pa.Table:
        c_ab = t.column("c_ab").combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        c_a = t.column("c_a").combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        c_b = t.column("c_b").combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log(c_ab * n / (c_a * c_b))
        denom = np.log(n / c_ab)
        # Python round on the final small table (np.round is one ulp off
        # the SQL oracle's round on halfway values). c_ab == n (a pair in
        # EVERY sentence) makes the denominator 0 — emit 1.0, the defined
        # limit of NPMI as p(a,b) -> 1 (oracle mirrors with CASE WHEN).
        npmi = pa.array([1.0 if ab >= n else round(float(p / d), rd)
                         for p, d, ab in zip(pmi, denom, c_ab)],
                        pa.float64())
        return t.append_column("npmi", npmi)

    return out.map_batches(score, batch_format="pyarrow")
