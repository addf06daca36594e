"""Dictionary NER as a stateful actor-pool ``map_batches`` stage.

Reference semantics: spaCy PhraseMatcher over term dictionaries, all
(possibly overlapping) case-insensitive matches (reference
``ner_main.py:35-86``). The reference rebuilds the matcher per batch *file*
(``ner_main.py:94``); here the matcher is built ONCE per actor in
``__init__`` from a broadcast term list (``ray.put`` once on the driver,
``ray.get`` per actor — the small-side-broadcast pattern, never re-shipped
per batch).

Output is NESTED (schemas.SENTENCE_MENTIONS): one row per sentence with a
``mentions`` list<struct> column. A sentence row is atomic, so every
per-sentence downstream op (triple extraction, conflict resolution,
separator merging) is row-local — no shuffle and no risk of Ray's
re-batching splitting a sentence's mentions. ``explode_mentions`` flattens
to the long mentions table (schemas.MENTIONS) for the aggregation ops.
Spans are end-exclusive; ``mention_idx`` orders by (start, end, cls).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from easyner_ray import schemas
from easyner_ray.functions.phrase_match import PhraseMatcher
from easyner_ray.functions.tokenize import norm_key


def mentions_to_structs(found: list[tuple[int, int, str, str]]) -> list[dict]:
    """(start, end, surface, cls) matches -> mention struct dicts."""
    return [
        {
            "mention_idx": i,
            "surface": surf,
            "norm": norm_key(surf),
            "cls": cls,
            "start": s,
            "end": e,
        }
        for i, (s, e, surf, cls) in enumerate(found)
    ]


def sentence_mentions_table(
    batch: pa.Table, per_row_mentions: list[list[dict]]
) -> pa.Table:
    return pa.Table.from_arrays(
        [
            batch.column("conv_id"),
            batch.column("turn_idx"),
            batch.column("sent_idx"),
            pa.array(per_row_mentions, pa.list_(schemas.MENTION_STRUCT)),
        ],
        schema=schemas.SENTENCE_MENTIONS,
    )


def sentence_mentions_table_flat(
    batch: pa.Table, per_row_found: list[list[tuple[int, int, str, str]]],
    keep_text: bool = False, keep_cols: tuple[str, ...] = (),
) -> pa.Table:
    """Build the nested mentions column DIRECTLY as
    ``ListArray(offsets, StructArray)`` from flat per-row match tuples —
    skips the list-of-dicts detour (python dict -> Arrow struct conversion
    was the NER stage's hottest non-matcher cost)."""
    offsets = [0]
    f_idx: list[int] = []
    f_surf: list[str] = []
    f_norm: list[str] = []
    f_cls: list[str] = []
    f_start: list[int] = []
    f_end: list[int] = []
    total = 0
    for found in per_row_found:
        for i, (s, e, surf, cls) in enumerate(found):
            f_idx.append(i)
            f_surf.append(surf)
            f_norm.append(norm_key(surf))
            f_cls.append(cls)
            f_start.append(s)
            f_end.append(e)
        total += len(found)
        offsets.append(total)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(f_idx, pa.int32()),
            pa.array(f_surf, pa.string()),
            pa.array(f_norm, pa.string()),
            pa.array(f_cls, pa.string()),
            pa.array(f_start, pa.int32()),
            pa.array(f_end, pa.int32()),
        ],
        fields=list(schemas.MENTION_STRUCT),
    )
    ments = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    out = pa.Table.from_arrays(
        [
            batch.column("conv_id"),
            batch.column("turn_idx"),
            batch.column("sent_idx"),
            ments,
        ],
        schema=schemas.SENTENCE_MENTIONS,
    )
    if keep_text:
        out = out.append_column("text", batch.column("text"))
    for c in keep_cols:
        out = out.append_column(c, batch.column(c))
    return out


class DictNER:
    def __init__(self, terms, keep_text: bool = False, keep_cols: tuple[str, ...] = ()):
        if isinstance(terms, ray.ObjectRef):
            terms = ray.get(terms)
        self.matcher = PhraseMatcher(terms)
        self.keep_text = keep_text
        self.keep_cols = tuple(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        find = self.matcher.find
        rows = [find(t) for t in batch.column("text").to_pylist()]
        return sentence_mentions_table_flat(
            batch, rows, keep_text=self.keep_text, keep_cols=self.keep_cols
        )


# Worker-process cache for task-pool DictNER state: the phrase matcher
# builds in ~1ms, so pinning an actor pool for it costs more (actor
# creation latency + reserved CPUs that can starve the read at low CPU
# counts) than rebuilding it once per worker process. Keyed by the terms
# ObjectRef so different vocabularies coexist; bounded FIFO (4 entries —
# enough for concurrent multi-vocab pipelines) so repeated invocations on
# a long-lived cluster can't leak one matcher per ray.put per worker.
# Model NER (expensive state) keeps the actor-pool shape — see
# stages.model_ner.
_DICT_NER_CACHE: dict = {}


def _dict_ner_fn(terms_ref, keep_text: bool, keep_cols: tuple[str, ...]):
    key = (terms_ref.hex() if hasattr(terms_ref, "hex") else id(terms_ref),
           keep_text, keep_cols)

    def fn(batch: pa.Table) -> pa.Table:
        ner = _DICT_NER_CACHE.get(key)
        if ner is None:
            ner = DictNER(terms_ref, keep_text=keep_text, keep_cols=keep_cols)
            while len(_DICT_NER_CACHE) >= 4:
                _DICT_NER_CACHE.pop(next(iter(_DICT_NER_CACHE)))
            _DICT_NER_CACHE[key] = ner
        return ner(batch)

    return fn


def tag_mentions(sentences, terms, *, concurrency=(1, 8), batch_size: int = 1024,
                 num_cpus: float = 1, keep_text: bool = False,
                 keep_cols: tuple[str, ...] = (), backend: str = "tasks"):
    """sentences Dataset -> nested sentence-mentions Dataset via DictNER.
    ``terms`` may be list[(term, cls)] or an ObjectRef to one.
    ``keep_text`` carries the sentence text column through (the reference's
    search output keeps (text, entities, spans), ``search.py:30-53``);
    ``keep_cols`` carries arbitrary sentence columns (e.g. ``char_start``
    for span re-basing — attached at tag time so rebasing never needs a
    join or lookup).

    ``backend='tasks'`` (default) runs plain map_batches tasks with the
    matcher cached per worker process — no actor-creation latency, no
    pinned CPUs; ``backend='actors'`` keeps the pool shape (``concurrency``
    / ``num_cpus`` apply) for parity with expensive-state stages."""
    terms_ref = terms if isinstance(terms, ray.ObjectRef) else ray.put(list(terms))
    if backend == "tasks":
        return sentences.map_batches(
            _dict_ner_fn(terms_ref, keep_text, tuple(keep_cols)),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return sentences.map_batches(
        DictNER,
        fn_constructor_kwargs={"terms": terms_ref, "keep_text": keep_text,
                               "keep_cols": tuple(keep_cols)},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def explode_mentions_batch(batch: pa.Table) -> pa.Table:
    """Nested sentence-mentions -> flat mentions rows.

    Fully vectorized: ``list_flatten`` exposes the struct children
    directly and ``list_parent_indices`` + ``take`` replicate the sentence
    keys — no ``to_pylist`` (python-dict materialization of nested columns
    was the explode's entire cost)."""
    import pyarrow.compute as pc

    ments = batch.column("mentions").combine_chunks()
    flat = pc.list_flatten(ments)
    parent = pc.list_parent_indices(ments)
    out = pa.Table.from_arrays(
        [
            batch.column("conv_id").take(parent),
            batch.column("turn_idx").take(parent),
            batch.column("sent_idx").take(parent),
            flat.field("mention_idx"),
            flat.field("surface"),
            flat.field("norm"),
            flat.field("cls"),
            flat.field("start"),
            flat.field("end"),
        ],
        schema=schemas.MENTIONS,
    )
    # carried sentence columns (keep_cols at tag time) replicate per mention
    for c in batch.schema.names:
        if c not in schemas.SENTENCE_MENTIONS.names and c != "mentions":
            out = out.append_column(c, batch.column(c).take(parent))
    return out


def explode_mentions(sentence_mentions, batch_size: int = 4096):
    return sentence_mentions.map_batches(
        explode_mentions_batch, batch_format="pyarrow", batch_size=batch_size
    )
