"""Entity search — the graph's sentence-evidence selector.

Reference (``search.py:30-53``): filter sentences containing watchlist
entities, keep (text, entities, spans). Engine: a broadcast-set semi-join
over the NESTED sentence-mentions rows — row-local ``map_batches`` filter,
no shuffle; the watchlist is actor state.
"""

from __future__ import annotations

import pyarrow as pa

import ray


class WatchlistFilter:
    def __init__(self, watchlist):
        if isinstance(watchlist, ray.ObjectRef):
            watchlist = ray.get(watchlist)
        self.watch = frozenset(watchlist)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized: flatten mention norms, membership-test against the
        watchlist, count hits per sentence via the parent indices."""
        import numpy as np
        import pyarrow.compute as pc

        ments = batch.column("mentions").combine_chunks()
        flat = pc.list_flatten(ments)
        if len(flat) == 0:
            empty = batch.take(pa.array([], pa.int64()))
            return empty.append_column(
                pa.field("n_watch_mentions", pa.int64()), pa.array([], pa.int64())
            )
        parent = pc.list_parent_indices(ments).to_numpy()
        is_hit = pc.is_in(
            flat.field("norm"), value_set=pa.array(sorted(self.watch), pa.string())
        ).to_numpy(zero_copy_only=False)
        counts = np.bincount(parent[is_hit], minlength=len(batch))
        keep = np.nonzero(counts)[0]
        out = batch.take(pa.array(keep, pa.int64()))
        return out.append_column(
            pa.field("n_watch_mentions", pa.int64()),
            pa.array(counts[keep].astype("int64"), pa.int64()),
        )


def search_sentences(sentence_mentions, watchlist, *, concurrency=(1, 4), batch_size: int = 4096):
    """Nested sentence-mentions -> rows whose sentence contains >=1 watchlist
    entity (by norm), with a ``n_watch_mentions`` count column."""
    return sentence_mentions.map_batches(
        WatchlistFilter,
        fn_constructor_kwargs={"watchlist": list(watchlist)},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
