"""Multi-model mention merging (reference J2/J3 re-expressed).

The reference zips k NER result folders positionally — files matched by
numeric suffix, docs zipped with hard mismatch errors (reference
``entity_merger.py:36-57,91-100``; class-tagged variant
``entity_merger2.py:54-95``). The engine replaces positional alignment with
two shapes:

  * :class:`MultiNER` — the FAST path: one actor holds all k taggers and
    emits the merged (optionally conflict-resolved) mention list per
    sentence in a single pass. No join, no shuffle, models loaded once per
    actor. Use when all taggers run in the same pool (CPU dictionaries +
    stub model).
  * :func:`merge_sentence_mentions` — the GENERAL path: union k nested
    sentence-mentions datasets (e.g. a GPU model pool's output and a CPU
    dictionary pool's output) and equi-join on the composite key
    ``(conv_id, turn_idx, sent_idx)`` via groupby().map_groups. This is a
    shuffle; key cardinality = #sentences, no hot keys by construction.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray

from easyner_ray.functions.conflict import resolve_conflicts
from easyner_ray.functions.phrase_match import PhraseMatcher
from easyner_ray.functions.sepmerge import separator_merge
from easyner_ray.stages.dict_ner import mentions_to_structs, sentence_mentions_table_flat


class MultiNER:
    """k phrase-match taggers fused in one actor; merged per-sentence output
    sorted by (start, end, cls), optionally conflict-resolved / sep-merged."""

    def __init__(self, term_sets, resolve: bool = False, sep_merge: bool = False,
                 lowercase_surfaces=None):
        """term_sets: list of term lists [(term, cls)] (or ObjectRefs);
        lowercase_surfaces: per-tagger bool list (model-path convention)."""
        if isinstance(term_sets, ray.ObjectRef):
            term_sets = ray.get(term_sets)
        term_sets = [ray.get(t) if isinstance(t, ray.ObjectRef) else t for t in term_sets]
        self.matchers = [PhraseMatcher(t) for t in term_sets]
        self.lower = lowercase_surfaces or [False] * len(self.matchers)
        self.resolve = resolve
        self.sep_merge = sep_merge

    def tag(self, text: str) -> list[tuple[int, int, str, str]]:
        """-> sorted (start, end, surface, cls) tuples (the fast path when
        no postprocessing is enabled — struct building stays columnar)."""
        if len(self.matchers) == 1 and not self.lower[0]:
            found = self.matchers[0].find(text)  # already sorted
        else:
            found = []
            for matcher, lower in zip(self.matchers, self.lower):
                for s, e, surf, cls in matcher.find(text):
                    found.append((s, e, surf.lower() if lower else surf, cls))
            found.sort(key=lambda m: (m[0], m[1], m[3]))
        return found

    def tag_post(self, text: str) -> list[tuple[int, int, str, str]]:
        """tag + separator-merge / conflict-resolution postprocessing
        (dict-shaped internally, returned as tuples)."""
        ms = mentions_to_structs(self.tag(text))
        if self.sep_merge:
            ms = separator_merge(ms, text)
        if self.resolve:
            ms = resolve_conflicts(ms)
        return [(m["start"], m["end"], m["surface"], m["cls"]) for m in ms]

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = self.tag_post if (self.sep_merge or self.resolve) else self.tag
        rows = [fn(t) for t in batch.column("text").to_pylist()]
        return sentence_mentions_table_flat(batch, rows)


# worker-process cache (same rationale as dict_ner._DICT_NER_CACHE: the
# matchers are ~1ms state, so cached tasks beat a pinned actor pool)
_MULTI_NER_CACHE: dict = {}


def _multi_ner_fn(term_sets_ref, resolve, sep_merge, lowercase_surfaces):
    key = (term_sets_ref.hex() if hasattr(term_sets_ref, "hex") else id(term_sets_ref),
           resolve, sep_merge, tuple(lowercase_surfaces or ()))

    def fn(batch: pa.Table) -> pa.Table:
        ner = _MULTI_NER_CACHE.get(key)
        if ner is None:
            ner = MultiNER(term_sets_ref, resolve=resolve, sep_merge=sep_merge,
                           lowercase_surfaces=lowercase_surfaces)
            while len(_MULTI_NER_CACHE) >= 4:  # bound the per-worker leak
                _MULTI_NER_CACHE.pop(next(iter(_MULTI_NER_CACHE)))
            _MULTI_NER_CACHE[key] = ner
        return ner(batch)

    return fn


def tag_mentions_multi(
    sentences,
    term_sets,
    *,
    resolve: bool = False,
    sep_merge: bool = False,
    lowercase_surfaces=None,
    concurrency=(1, 8),
    batch_size: int = 1024,
    num_cpus: float = 1,
    backend: str = "tasks",
):
    if backend == "tasks":
        ts_ref = term_sets if isinstance(term_sets, ray.ObjectRef) else ray.put(term_sets)
        return sentences.map_batches(
            _multi_ner_fn(ts_ref, resolve, sep_merge, lowercase_surfaces),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return sentences.map_batches(
        MultiNER,
        fn_constructor_kwargs={
            "term_sets": term_sets,
            "resolve": resolve,
            "sep_merge": sep_merge,
            "lowercase_surfaces": lowercase_surfaces,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def merge_sentence_mentions(datasets, resolve: bool = True):
    """Union k nested sentence-mentions datasets and merge per sentence.

    Replaces the reference's positional zip with an equi-join on
    (conv_id, turn_idx, sent_idx). Mentions are concatenated, re-sorted by
    (start, end, cls) — the reference merger2's (start, end) sort,
    ``entity_merger2.py:87-93`` — deduped on (start, end, cls), and
    optionally conflict-resolved (O6).
    """
    from easyner_ray.ops.relational import add_hash_bucket

    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)

    def combine_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One task per coarse bucket of sentence keys; the per-sentence
        merge loop runs inside (bucket count, not sentence count, bounds
        the task-launch overhead)."""
        o_conv, o_turn, o_sent, o_ments = [], [], [], []
        for (cid, ti, si), sub in g.groupby(["conv_id", "turn_idx", "sent_idx"], sort=False):
            merged: list[dict] = []
            for ms in sub["mentions"]:
                merged.extend(ms)
            seen: set[tuple[int, int, str]] = set()
            uniq: list[dict] = []
            for m in sorted(merged, key=lambda m: (m["start"], m["end"], m["cls"])):
                key = (m["start"], m["end"], m["cls"])
                if key not in seen:
                    seen.add(key)
                    uniq.append(m)
            if resolve:
                uniq = resolve_conflicts(uniq)
            else:
                uniq = [dict(m, mention_idx=i) for i, m in enumerate(uniq)]
            o_conv.append(cid)
            o_turn.append(ti)
            o_sent.append(si)
            o_ments.append(uniq)
        return pd.DataFrame(
            {
                "conv_id": o_conv,
                "turn_idx": pd.array(o_turn, dtype="int32"),
                "sent_idx": pd.array(o_sent, dtype="int32"),
                "mentions": o_ments,
            }
        )

    bucketed = ds.map_batches(
        lambda t: add_hash_bucket(t, ["conv_id", "turn_idx", "sent_idx"], 64),
        batch_format="pyarrow",
    )
    return bucketed.groupby("__bucket").map_groups(combine_bucket, batch_format="pandas")


def to_class_map(sentence_mentions_row: list[dict]) -> dict[str, list[str]]:
    """The reference merger1's per-class entity map shape
    (``entity_merger.py:28-29``): {class: [surface, ...]} per sentence.
    Golden-artifact materializer (pairs with loaders.to_easyner_json)."""
    out: dict[str, list[str]] = {}
    for m in sentence_mentions_row:
        out.setdefault(m["cls"], []).append(m["surface"])
    return out


def remap_mention_classes(mentions, batch_size: int = 65536):
    """Vectorized class-remap column transform over the flat mentions table
    (reference §2.7 class remap tables)."""
    import pyarrow as pa

    from easyner_ray.functions.tokenize import CLASS_REMAP

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cls = pc.utf8_lower(batch.column("cls"))
        # dictionary-encode then remap the (tiny) dictionary
        enc = pc.dictionary_encode(cls.combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        new_dict = pa.array(
            [CLASS_REMAP.get(v, v) for v in enc.dictionary.to_pylist()], pa.string()
        )
        remapped = new_dict.take(enc.indices)
        i = batch.schema.get_field_index("cls")
        return batch.set_column(i, "cls", remapped)

    return mentions.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def merge_mentions_flat(nested_datasets, n_buckets: int = 64):
    """Vectorized multi-run merge producing the FLAT mentions table
    directly (the shape every aggregate consumes anyway): union the nested
    runs, explode, dedupe on (sentence key, start, end, cls) and renumber
    ``mention_idx`` per sentence in (start, end, cls) order — all
    column-level pandas ops inside coarse sentence-key buckets, no Python
    loop per sentence. Equals ``explode(merge_sentence_mentions(...,
    resolve=False))`` exactly."""
    from easyner_ray import schemas
    from easyner_ray.ops.relational import add_hash_bucket
    from easyner_ray.stages.dict_ner import explode_mentions

    ds = nested_datasets[0]
    for other in nested_datasets[1:]:
        ds = ds.union(other)
    flat = explode_mentions(ds)
    bucketed = flat.map_batches(
        lambda t: add_hash_bucket(t, ["conv_id", "turn_idx", "sent_idx"], n_buckets),
        batch_format="pyarrow",
    )

    KEYS = ["conv_id", "turn_idx", "sent_idx"]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(KEYS + ["start", "end", "cls"], kind="mergesort")
        df = df.drop_duplicates(KEYS + ["start", "end", "cls"], keep="first")
        df = df.assign(mention_idx=df.groupby(KEYS, sort=False).cumcount().astype("int32"))
        return df[["conv_id", "turn_idx", "sent_idx", "mention_idx",
                   "surface", "norm", "cls", "start", "end"]]

    merged = bucketed.groupby("__bucket").map_groups(combine, batch_format="pandas")
    return merged.map_batches(
        lambda t: schemas.ensure_schema(t, schemas.MENTIONS, "merge_mentions_flat"),
        batch_format="pyarrow",
    )
