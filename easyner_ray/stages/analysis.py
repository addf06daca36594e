"""Entity frequency analysis (reference A1/A2/A3 re-expressed).

Reference: a single-process global dict accumulating per-entity
``total_count`` / ``articles_spanned`` / derived frequencies, sorted desc
(reference ``analysis.py:18-80``). The engine computes the same measures as
distributed aggregations over the flat mentions table:

  * total_count       = count(*) per entity key
  * convs_spanned     = exact distinct conv_id per entity key
  * freq_per_conv     = total_count / convs_spanned

Exact distinct at scale: first collapse to per-(entity, conv_id) counts
(a pre-aggregated two-phase groupby — hot keys are diluted by the conv_id
dimension), then count pairs per entity. Both shuffles use the coarse-
bucket Arrow final (ops.relational.bucketed_final): the pair key space is
#entities x #convs, far too many groups for a Python-per-group combine.

The entity key is the normalized surface (``norm``) — the reference keys
raw model output strings; its model path emits lowercased surfaces, making
``norm`` the faithful scale-out key (SURVEY.md §2.7).
"""

from __future__ import annotations

import pyarrow as pa

from easyner_ray.ops.relational import bucketed_final


def _partial_pair_counts(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["norm", "conv_id"]).aggregate([("norm", "count")])
    return pa.Table.from_arrays(
        [
            g.column("norm"),
            g.column("conv_id"),
            g.column("norm_count").cast(pa.int64()),
        ],
        names=["entity", "conv_id", "n"],
    )


def entity_frequency(mentions, batch_size: int = 65536):
    """mentions -> (entity, total_count, convs_spanned, freq_per_conv).

    The pair partial runs at the UPSTREAM's block granularity
    (``batch_size=None``): an explicit coarse batch size here fuses into
    the mention-producing chain and coalesces it onto a handful of huge
    batches — measured at sf0.1: 3 tasks instead of 64 for the whole
    split+NER chain, and the downstream pair shuffle inherits those 3
    blocks as its entire sort parallelism (9 s vs 2 s end-to-end). The
    per-block group_by collapses repeats just as well; the fusion trap is
    documented in pipelines/kg.py."""
    # materialize() the per-batch-collapsed pair stream: (a) fusion
    # barrier (same trap as pipelines/kg.py), (b) makes size_bytes()
    # metadata-cheap for the final-strategy pick below
    pairs = mentions.map_batches(
        _partial_pair_counts, batch_format="pyarrow", batch_size=None
    ).materialize()

    def pair_to_entity_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["entity"]).aggregate([("n", "sum"), ("n", "count")])
        return pa.Table.from_arrays(
            [
                g.column("entity"),
                g.column("n_sum").cast(pa.int64()),
                g.column("n_count").cast(pa.int64()),
            ],
            names=["entity", "tc", "cs"],
        )

    if pairs.size_bytes() < (256 << 20):
        # Small pair stream: the 64-bucket sort exchange costs ~1.5 s of
        # pure scheduling for a stream one Arrow group_by chews through in
        # ~50 ms (measured at sf0.1: 435k rows / 18 MB) — coalesce to one
        # task and finish there. The keyspace check is on actual bytes,
        # so growing inputs switch shape automatically.
        def finish(t: pa.Table) -> pa.Table:
            g = t.group_by(["entity", "conv_id"]).aggregate([("n", "sum")])
            per_pair = pa.Table.from_arrays(
                [g.column("entity"), g.column("conv_id"),
                 g.column("n_sum").cast(pa.int64())],
                names=["entity", "conv_id", "n"])
            return pair_to_entity_partial(per_pair).rename_columns(
                ["entity", "total_count", "convs_spanned"])

        freq = pairs.repartition(1).map_batches(
            finish, batch_format="pyarrow", batch_size=None)
    else:
        # 100-TB shape: (entity, conv) keyspace scales with the corpus —
        # dedupe through the coarse-bucket exchange, then tree-combine
        # the vocabulary-sized entity partials shuffle-free.
        from easyner_ray.ops.relational import tree_final

        per_pair = bucketed_final(pairs, ["entity", "conv_id"],
                                  pa_aggs=[("n", "sum")], out_names=["n"])
        entity_partial = per_pair.map_batches(
            pair_to_entity_partial, batch_format="pyarrow",
            batch_size=batch_size
        )
        freq = tree_final(entity_partial.materialize(), ["entity"],
                          pa_aggs=[("tc", "sum"), ("cs", "sum")],
                          out_names=["total_count", "convs_spanned"])

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


def export_top_entities(mentions, out_dir: str, n: int = 50, prefix: str = "analysis"):
    """Reference A3 artifact surface (``analysis.py:82-150``): top-N entity
    frequency table as TSV, plus a bar chart PNG when matplotlib is
    installed (gated import — not present in this container).

    Returns {"tsv": path, "png": path | None}.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    df = top_entities(mentions, n=n).to_pandas()
    tsv = os.path.join(out_dir, f"{prefix}_top{n}.tsv")
    df.to_csv(tsv, sep="\t", index=False)

    png = None
    try:  # pragma: no cover - matplotlib not installed in the sandbox
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, max(3, n * 0.25)))
        ax.barh(df["entity"][::-1], df["total_count"][::-1])
        ax.set_xlabel("total_count")
        fig.tight_layout()
        png = os.path.join(out_dir, f"{prefix}_top{n}.png")
        fig.savefig(png)
        plt.close(fig)
    except ImportError:
        pass
    return {"tsv": tsv, "png": png}


def entity_frequency_per_conv(mentions, batch_size: int = 524288):
    """Reference A2 per-article variant (``evals.py:5-50``): mention counts
    keyed by (conversation, entity). Two-phase bucketed aggregate."""
    import pyarrow as pa

    from easyner_ray.ops.relational import bucketed_final

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id", "norm"]).aggregate([("norm", "count")])
        return pa.Table.from_arrays(
            [g.column("conv_id"), g.column("norm"),
             g.column("norm_count").cast(pa.int64())],
            names=["conv_id", "entity", "n"],
        )

    p = mentions.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    return bucketed_final(p, ["conv_id", "entity"], pa_aggs=[("n", "sum")], out_names=["n"])


def entity_frequency_batches(mentions_with_part, batch_size: int = 65536,
                             max_set: int | None = None):
    """Reference A1 with the BATCH dimension (``analysis.py:40-80``):
    per-entity ``total_count`` / ``convs_spanned`` / ``batches_spanned`` /
    ``freq_per_conv`` / ``freq_per_batch`` plus the materialized
    ``articles_set`` (sorted distinct conv ids, comma-joined — the
    reference keeps a Python set per entity; a string column keeps the
    artifact exact AND columnar).

    Input must carry a ``part_id`` int column — the ingest-batch id
    (reference: source file index; engine: any deterministic function of
    the shard/conv). Exactness at scale: collapse to per-(entity, part,
    conv) counts first (two-phase), then per-entity distinct counts inside
    entity-keyed buckets. ``articles_set`` is exact but O(#convs) per
    entity; ``max_set`` is the 100-TB switch — when set, the column keeps
    only the FIRST ``max_set`` sorted conv ids (deterministic truncation),
    bounding the per-entity string while every count stays exact.
    ``max_set=None`` (default) materializes the exact set.
    """
    import pandas as pd

    from easyner_ray.ops.relational import add_hash_bucket

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["norm", "part_id", "conv_id"]).aggregate([("norm", "count")])
        return pa.Table.from_arrays(
            [g.column("norm"), g.column("part_id").cast(pa.int32()),
             g.column("conv_id"), g.column("norm_count").cast(pa.int64())],
            names=["entity", "part_id", "conv_id", "n"],
        )

    triples = mentions_with_part.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    per_triple = bucketed_final(triples, ["entity", "part_id", "conv_id"],
                                pa_aggs=[("n", "sum")], out_names=["n"])

    def combine_entity(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for entity, g in df.groupby("entity", sort=False):
            total = int(g["n"].sum())
            convs = g["conv_id"].nunique()
            batches = g["part_id"].nunique()
            ids = sorted(g["conv_id"].unique())
            if max_set is not None:
                ids = ids[:max_set]
            rows.append({
                "entity": entity,
                "total_count": total,
                "convs_spanned": int(convs),
                "batches_spanned": int(batches),
                "freq_per_conv": total / convs,
                "freq_per_batch": total / batches,
                "articles_set": ",".join(ids),
            })
        return pd.DataFrame(rows, columns=["entity", "total_count", "convs_spanned",
                                           "batches_spanned", "freq_per_conv",
                                           "freq_per_batch", "articles_set"])

    bucketed = per_triple.map_batches(
        lambda t: add_hash_bucket(t, ["entity"], 64), batch_format="pyarrow"
    )
    return bucketed.groupby("__bucket").map_groups(combine_entity, batch_format="pandas")
