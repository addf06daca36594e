"""Entity frequency analysis (reference A1/A2/A3 re-expressed).

Reference: a single-process global dict accumulating per-entity
``total_count`` / ``articles_spanned`` / derived frequencies, sorted desc
(reference ``analysis.py:18-80``). The engine computes the same measures as
distributed aggregations over the flat mentions table:

  * total_count       = count(*) per entity key
  * convs_spanned     = exact distinct conv_id per entity key
  * freq_per_conv     = total_count / convs_spanned

Exact distinct at scale: first collapse to distinct (entity, conv_id) pairs
(itself a pre-aggregated groupby — the pair cardinality is bounded by
mentions and hot keys are diluted by the conv_id dimension), then count per
entity. The entity key is the normalized surface (``norm``) — the
reference keys raw model output strings; its model path emits lowercased
surfaces, making ``norm`` the faithful scale-out key (SURVEY.md §2.7).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Count, Sum


def _partial_pair_counts(batch: pa.Table) -> pa.Table:
    norms = batch.column("norm").to_pylist()
    convs = batch.column("conv_id").to_pylist()
    acc: dict[tuple[str, str], int] = {}
    for n, c in zip(norms, convs):
        acc[(n, c)] = acc.get((n, c), 0) + 1
    keys = sorted(acc)
    return pa.Table.from_arrays(
        [
            pa.array([k[0] for k in keys], pa.string()),
            pa.array([k[1] for k in keys], pa.string()),
            pa.array([acc[k] for k in keys], pa.int64()),
        ],
        names=["entity", "conv_id", "n"],
    )


def entity_frequency(mentions, batch_size: int = 65536):
    """mentions -> (entity, total_count, convs_spanned, freq_per_conv)."""
    pairs = mentions.map_batches(
        _partial_pair_counts, batch_format="pyarrow", batch_size=batch_size
    )
    per_pair = pairs.groupby(["entity", "conv_id"]).aggregate(Sum("n", alias_name="n"))
    freq = per_pair.groupby("entity").aggregate(
        Sum("n", alias_name="total_count"), Count(alias_name="convs_spanned")
    )

    def derive(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        total = t.column("total_count").cast(pa.int64())
        spanned = t.column("convs_spanned").cast(pa.int64())
        return pa.Table.from_arrays(
            [
                t.column("entity"),
                total,
                spanned,
                pc.divide(total.cast(pa.float64()), spanned.cast(pa.float64())),
            ],
            names=["entity", "total_count", "convs_spanned", "freq_per_conv"],
        )

    return freq.map_batches(derive, batch_format="pyarrow")


def top_entities(mentions, n: int = 50):
    """Reference A3: head-N by total_count (sort desc + limit)."""
    return entity_frequency(mentions).sort(
        ["total_count", "entity"], descending=[True, False]
    ).limit(n)
