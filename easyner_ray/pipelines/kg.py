"""Flagship pipeline: transcripts -> knowledge graph (north rule).

    read_parquet(transcripts)
      -> filter empty turns (vectorized predicate)
      -> sentence-split explode               [stateless map_batches]
      -> MultiNER actor pool                  [dict + model taggers, one pass]
      -> (row-local) triples | explode mentions
      -> two-phase nodes / edges aggregation  [the only shuffles]
      -> resumable partitioned Parquet sink   [lineage manifests]

Branch handling: the nested sentence-mentions dataset feeds several
consumers (mentions, triples, search). Ray Data re-executes the shared
lineage per consumer, so ``build_kg`` checkpoints it — in memory
(``materialize``, fine at bench scale) or as Parquet (the 100-TB shape:
write once, read per consumer, and the checkpoint doubles as the resume
point).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc

from easyner_ray.sources import vocab as _vocab
from easyner_ray.stages.canonicalize import (aggregate_edges, canonical_nodes,
                                             cls_of_norm_map, lineage_record)
from easyner_ray.stages.dict_ner import explode_mentions
from easyner_ray.stages.merge import tag_mentions_multi
from easyner_ray.stages.splitter import split_sentences
from easyner_ray.stages.triples import sentence_triples
from easyner_ray.state.sink import write_partitioned


def read_transcripts(path, columns=("conv_id", "turn_idx", "text")):
    """Prune at the read: the KG build needs only 3 of the 6 columns."""
    import ray.data as rd

    return rd.read_parquet(path, columns=list(columns))


def drop_empty_turns(transcripts):
    return transcripts.map_batches(
        lambda t: t.filter(pc.greater(pc.utf8_length(pc.coalesce(t.column("text"), "")), 0)),
        batch_format="pyarrow",
    )


def extract_sentence_mentions(
    transcripts,
    term_sets=None,
    *,
    resolve: bool = False,
    ner_concurrency=(1, 8),
    ner_batch_size: int = 1024,
):
    """transcripts -> nested sentence-mentions (the KG build's backbone)."""
    if term_sets is None:
        term_sets = [_vocab.vocabulary()]
    sentences = split_sentences(drop_empty_turns(transcripts))
    return tag_mentions_multi(
        sentences,
        term_sets,
        resolve=resolve,
        concurrency=ner_concurrency,
        batch_size=ner_batch_size,
    )


def build_kg(
    transcripts,
    term_sets=None,
    *,
    resolve: bool = False,
    out_dir: str | None = None,
    checkpoint: str = "memory",
    num_partitions: int = 32,
    ner_concurrency=(1, 8),
    source_desc: str = "",
):
    """Run the full KG build. Returns dict of Datasets (and sink summaries
    when ``out_dir`` is given).

    checkpoint: 'memory' (materialize the nested backbone) or 'parquet'
    (write/read-back under out_dir — requires out_dir; the scale shape).
    """
    sm = extract_sentence_mentions(
        transcripts, term_sets, resolve=resolve, ner_concurrency=ner_concurrency
    )

    if checkpoint == "parquet":
        if not out_dir:
            raise ValueError("checkpoint='parquet' needs out_dir")
        ckpt = os.path.join(out_dir, "sentence_mentions")
        write_partitioned(
            sm,
            ckpt,
            key_col="conv_id",
            num_partitions=num_partitions,
            lineage=lineage_record("sentence_mentions", [source_desc]),
        )
        from easyner_ray.state.sink import read_partitioned

        sm = read_partitioned(ckpt)
    elif checkpoint == "memory":
        sm = sm.materialize()

    if term_sets is None:
        term_sets = [_vocab.vocabulary()]
    mentions = explode_mentions(sm)
    triples = sentence_triples(sm)
    nodes = canonical_nodes(mentions)
    edges = aggregate_edges(triples, cls_of_norm=cls_of_norm_map(term_sets))

    out = {
        "sentence_mentions": sm,
        "mentions": mentions,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
    }
    if out_dir:
        out["nodes_sink"] = write_partitioned(
            nodes,
            os.path.join(out_dir, "nodes"),
            key_col="norm",
            num_partitions=num_partitions,
            lineage=lineage_record("nodes", [source_desc]),
        )
        out["edges_sink"] = write_partitioned(
            edges,
            os.path.join(out_dir, "edges"),
            key_col="subj",
            num_partitions=num_partitions,
            lineage=lineage_record("edges", [source_desc]),
        )
    return out


def write_clustered_edges(edges, out_dir: str, *,
                          num_partitions: int = 32) -> dict:
    """Serving layout for the edge table: Z-order range partitions over
    (subj, obj) — both endpoints on their order-preserving string-prefix
    image — with per-fragment min/max stats in the manifests
    (:mod:`easyner_ray.state.clustered`). A neighborhood read for ONE
    entity (or an alphabetical entity range) then touches only the
    fragments whose subj OR obj range intersects it, instead of the full
    table — the graph-serving analog of the events window prune. Use
    AFTER the build finishes (it is a compaction, all-or-nothing); keep
    ``write_partitioned`` for the resumable build-side checkpoint."""
    from easyner_ray.state.clustered import write_clustered

    return write_clustered(edges, os.path.join(out_dir, "edges_clustered"),
                           cols=["subj", "obj"],
                           num_partitions=num_partitions)


def read_edge_neighborhood(out_dir: str, lo: str, hi: str):
    """Stat-pruned read of every edge whose SUBJECT falls in [lo, hi]
    from a :func:`write_clustered_edges` layout. Returns
    (dataset | None, report) — report counts fragments planned vs read.
    Symmetric obj-side lookups pass {"obj": (lo, hi)} to
    :func:`easyner_ray.state.clustered.read_pruned` directly."""
    from easyner_ray.state.clustered import read_pruned

    return read_pruned(os.path.join(out_dir, "edges_clustered"),
                       {"subj": (lo, hi)})


# ------------------------------------------------------- single-pass build --

_COMBINED_FIELDS = [
    ("kind", "string"), ("subj", "string"), ("pred", "string"),
    ("obj", "string"), ("w", "int64"), ("norm", "string"),
    ("cls", "string"), ("n", "int64"),
]


def _build_term_maps(term_sets) -> dict:
    """Deterministic driver/worker-shared arrays for the int-keyed partial
    stream: term_id -> (norm, cls), dense norm index -> norm string, and
    norm -> cls for edge endpoint ids. Built from the SAME PhraseMatcher
    registration order everywhere, so worker-emitted indices and the
    driver-broadcast decode arrays always agree."""
    import ray as _r

    if isinstance(term_sets, _r.ObjectRef):
        term_sets = _r.get(term_sets)
    term_sets = [_r.get(t) if isinstance(t, _r.ObjectRef) else t for t in term_sets]
    from easyner_ray.functions.phrase_match import PhraseMatcher

    matcher = PhraseMatcher([t for ts in term_sets for t in ts])
    norm_idx: dict[str, int] = {}
    tid_norm = [norm_idx.setdefault(nm, len(norm_idx)) for nm in matcher.term_norm]
    cls_idx: dict[str, int] = {}
    tid_cls = [cls_idx.setdefault(c, len(cls_idx)) for c in matcher.term_cls]
    return {
        "matcher": matcher,
        "tid_norm": tid_norm,
        "tid_cls": tid_cls,
        "norm_strings": list(norm_idx),
        "cls_strings": list(cls_idx),
        "term_norm": matcher.term_norm,
        "term_cls": matcher.term_cls,
    }


class KGPartialsNER:
    """The single-pass fused stage: sentence batch -> matched term ids ->
    per-batch node/edge PARTIAL aggregates, all inside one call.

    The id fast path: the whole text column lowercases in one Arrow kernel,
    tokens come from a single ``findall`` (no match objects, no offsets),
    and the matcher returns integer term_ids whose norm/cls are
    precomputed — the per-sentence loop touches only ints and small dicts.
    Norms key off the DICTIONARY term (see PhraseMatcher.find_term_ids);
    identical to surface-normalization whenever sentence separators match
    the term's. Multiple term sets fuse into ONE matcher over their union
    (the multi-matcher merge is order-insensitive for counting).

    Output is the compact INT partial stream — ``kind``:int8 (0=edge,
    1=node), ``a``/``b``:int32 key indices, ``c``:int64 count — strings
    appear only in the final decode, so the materialized checkpoint and
    every combine touch ~4x fewer bytes than a string-keyed stream (this
    VM is memory-bandwidth-bound at full width; bytes ARE wall time).

    Node partials key on (norm_idx, cls_idx) — NOT term_id — so distinct
    vocabulary terms whose norm keys collide (e.g. 'µM' U+00B5 and 'μM'
    U+03BC both casefold to 'μm') merge into ONE node row, exactly like
    the staged build's group-by-(norm, cls) (canonicalize.canonical_nodes)
    and incremental.update_graph.
    """

    def __init__(self, term_sets):
        maps = _build_term_maps(term_sets)
        self.matcher = maps["matcher"]
        self.tid_norm = maps["tid_norm"]
        self.tid_cls = maps["tid_cls"]

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        from easyner_ray.functions.tokenize import TOKEN_RE

        findall = TOKEN_RE.findall
        find_ids = self.matcher.find_term_ids
        tid_norm = self.tid_norm
        tid_cls = self.tid_cls
        node_n: dict[tuple[int, int], int] = {}
        edge_w: dict[tuple[int, int], int] = {}
        for text in pc.utf8_lower(batch.column("text")).to_pylist():
            ids = find_ids(findall(text))
            if not ids:
                continue
            norms_here = set()
            for tid in ids:
                nk = (tid_norm[tid], tid_cls[tid])
                node_n[nk] = node_n.get(nk, 0) + 1
                norms_here.add(tid_norm[tid])
            if len(norms_here) >= 2:
                uniq = sorted(norms_here)
                for a in uniq:
                    for b in uniq:
                        if a != b:
                            k = (a, b)
                            edge_w[k] = edge_w.get(k, 0) + 1
        n_e, n_n = len(edge_w), len(node_n)
        e_keys = list(edge_w)
        n_keys = list(node_n)
        return pa.Table.from_arrays(
            [
                pa.array([0] * n_e + [1] * n_n, pa.int8()),
                pa.array([k[0] for k in e_keys] + [k[0] for k in n_keys], pa.int32()),
                pa.array([k[1] for k in e_keys] + [k[1] for k in n_keys], pa.int32()),
                pa.array([edge_w[k] for k in e_keys] + [node_n[k] for k in n_keys],
                         pa.int64()),
            ],
            names=["kind", "a", "b", "c"],
        )


def _collapse_ints(t):
    """Int partial stream -> same shape, one row per key: a single
    vectorized group_by over the 3 int key columns (kind separates edges
    from nodes, so no filtering/splitting is needed)."""
    g = t.group_by(["kind", "a", "b"]).aggregate([("c", "sum")])
    import pyarrow as pa

    return pa.Table.from_arrays(
        [g.column("kind"), g.column("a"), g.column("b"),
         g.column("c_sum").cast(pa.int64())],
        names=["kind", "a", "b", "c"],
    )


# Worker-process cache for task-pool NER state. The dictionary matcher
# builds in ~1ms, so it does NOT need a pinned actor pool (whose creation
# latency and CPU pinning dominate at bench scale and can starve the read
# at low CPU counts): plain map_batches TASKS reuse Ray's prestarted
# workers, and each worker process builds the matcher once, lazily, keyed
# by the broadcast term-set ObjectRef. Expensive model state (Transformers
# NER) keeps the actor-pool shape — this path is for cheap state only.
# Evict-on-insert (keep only the newest entry): each build_kg call does a
# fresh ray.put of the term sets, so an append-only dict would leak one
# vocabulary-sized matcher per invocation per worker on a long-lived
# cluster.
_PARTIALS_CACHE: dict = {}


def _kg_partials_fn(term_sets_ref):
    import ray as _ray

    key = term_sets_ref.hex() if hasattr(term_sets_ref, "hex") else str(id(term_sets_ref))

    def fn(batch):
        ner = _PARTIALS_CACHE.get(key)
        if ner is None:
            ts = (_ray.get(term_sets_ref)
                  if isinstance(term_sets_ref, _ray.ObjectRef) else term_sets_ref)
            ner = KGPartialsNER(ts)
            while len(_PARTIALS_CACHE) >= 4:  # bound the per-worker leak
                _PARTIALS_CACHE.pop(next(iter(_PARTIALS_CACHE)))
            _PARTIALS_CACHE[key] = ner
        return ner(batch)

    return fn


def int_partials_to_string_partials(combined, term_sets):
    """Decode the compact int partial stream to the string partial shape
    (``_COMBINED_FIELDS``) — for consumers that union partials with
    string-keyed tables (incremental graph updates). Vectorized take on
    broadcast decode arrays; the int->string decode happens once per
    partial row, not per corpus row."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray as _ray

    maps = _build_term_maps(term_sets)
    decode_ref = _ray.put({
        "norm_strings": maps["norm_strings"],
        "cls_strings": maps["cls_strings"],
    })

    def conv(t: pa.Table) -> pa.Table:
        from easyner_ray.stages.triples import PRED_SENTENCE

        d = _ray.get(decode_ref)
        e = t.filter(pc.equal(t.column("kind"), 0))
        n = t.filter(pc.equal(t.column("kind"), 1))
        norm_arr = pa.array(d["norm_strings"], pa.string())
        cls_arr = pa.array(d["cls_strings"], pa.string())
        ea, eb = e.column("a").combine_chunks(), e.column("b").combine_chunks()
        na = n.column("a").combine_chunks()
        nb = n.column("b").combine_chunks()
        n_e, n_n = len(e), len(n)
        return pa.Table.from_arrays(
            [
                pa.array(["e"] * n_e + ["n"] * n_n, pa.string()),
                pa.concat_arrays([norm_arr.take(ea), pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([pa.array([PRED_SENTENCE] * n_e, pa.string()),
                                  pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([norm_arr.take(eb), pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([e.column("c").cast(pa.int64()).combine_chunks(),
                                  pa.nulls(n_n, pa.int64())]),
                pa.concat_arrays([pa.nulls(n_e, pa.string()), norm_arr.take(na)]),
                pa.concat_arrays([pa.nulls(n_e, pa.string()), cls_arr.take(nb)]),
                pa.concat_arrays([pa.nulls(n_e, pa.int64()),
                                  n.column("c").cast(pa.int64()).combine_chunks()]),
            ],
            names=[f for f, _ in _COMBINED_FIELDS],
        )

    return combined.map_batches(conv, batch_format="pyarrow")


def build_kg_single_pass(
    transcripts,
    term_sets=None,
    *,
    ner_concurrency=(1, 8),
    ner_batch_size: int = 8192,
    combine: str = "tree",
):
    """The throughput shape of the KG build: read -> split+NER+partials in
    ONE fused task-pool pass (matcher cached per worker process) -> final
    combine -> materialize the finished graph (small) -> nodes/edges are
    cheap filters over it. ``ner_concurrency`` is accepted for API
    compatibility and ignored (tasks scale with free CPUs; no pinned pool
    to size).

    ``combine`` picks the final-aggregation strategy:

      * ``"tree"`` (default) — NO keyed shuffle: the partial stream
        materializes, a coalescing ``map_batches``
        collapses ~1M-row chunks to one row per key, and one tiny task
        finishes the graph. Correct whenever the final keyspace fits a
        task; with dictionary NER the keyspace is bounded by |vocab|^2
        pairs + |vocab| nodes — far below corpus size. The 100-TB shape
        for closed vocabularies.
      * ``"shuffle"`` — ONE bucket-shuffle final (hash of the kind-specific
        key, 64 buckets, per-bucket Arrow group_by). Use when the keyspace
        itself is corpus-scale (open-vocabulary model NER).

    vs :func:`build_kg`: NER runs once, nothing row-level materializes
    (the checkpoint is the collapsed partials — ~2 orders of magnitude
    smaller than the nested backbone), node aliases omitted.
    Returns {"nodes": Dataset, "edges": Dataset}.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray as _ray

    from easyner_ray import schemas
    from easyner_ray.sources import vocab as _vocab
    from easyner_ray.stages.canonicalize import node_id
    from easyner_ray.stages.splitter import split_sentences

    if term_sets is None:
        term_sets = [_vocab.vocabulary()]
    sentences = split_sentences(drop_empty_turns(transcripts))
    # task pool + per-worker cached matcher (see _kg_partials_fn): no actor
    # creation latency, no pinned CPUs; ner_concurrency is accepted for API
    # compatibility but tasks simply scale with free CPUs.
    combined = sentences.map_batches(
        _kg_partials_fn(_ray.put(term_sets)),
        batch_format="pyarrow",
        batch_size=ner_batch_size,
    )

    # decode arrays (same deterministic construction the workers use),
    # broadcast once; node/edge md5 ids precompute per DISTINCT key here —
    # never per corpus row
    maps = _build_term_maps(term_sets)
    cls_of = cls_of_norm_map(term_sets)
    norm_strings = maps["norm_strings"]
    decode_ref = _ray.put({
        "norm_strings": norm_strings,
        "norm_ids": [node_id(cls_of.get(nm, ""), nm) for nm in norm_strings],
        "cls_strings": maps["cls_strings"],
    })

    def final_decode(t: pa.Table) -> pa.Table:
        """Collapsed int partials -> the finished union-schema graph table
        (all string/id columns built by vectorized take on the broadcast
        decode arrays)."""
        from easyner_ray.stages.triples import PRED_SENTENCE

        d = _ray.get(decode_ref)
        t = _collapse_ints(t)
        e = t.filter(pc.equal(t.column("kind"), 0))
        n = t.filter(pc.equal(t.column("kind"), 1))
        norm_arr = pa.array(d["norm_strings"], pa.string())
        nid_arr = pa.array(d["norm_ids"], pa.string())
        cls_arr = pa.array(d["cls_strings"], pa.string())
        ea = e.column("a").combine_chunks()
        eb = e.column("b").combine_chunks()
        na = n.column("a").combine_chunks()
        nb = n.column("b").combine_chunks()
        n_e, n_n = len(e), len(n)
        # node ids hash the decoded (cls, norm) per DISTINCT key (the rows
        # here are already one-per-key, bounded by the vocabulary)
        node_norms = norm_arr.take(na)
        node_clss = cls_arr.take(nb)
        node_ids = pa.array(
            [node_id(c, nm) for c, nm in zip(node_clss.to_pylist(),
                                             node_norms.to_pylist())],
            pa.string(),
        )
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([
                    pa.array(["e"] * n_e, pa.string()),
                    pa.array(["n"] * n_n, pa.string()),
                ]),
                pa.concat_arrays([nid_arr.take(ea), pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([norm_arr.take(ea), pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([pa.array([PRED_SENTENCE] * n_e, pa.string()),
                                  pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([nid_arr.take(eb), pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([norm_arr.take(eb), pa.nulls(n_n, pa.string())]),
                pa.concat_arrays([e.column("c").cast(pa.int64()).combine_chunks(),
                                  pa.nulls(n_n, pa.int64())]),
                pa.concat_arrays([pa.nulls(n_e, pa.string()), node_ids]),
                pa.concat_arrays([pa.nulls(n_e, pa.string()), node_norms]),
                pa.concat_arrays([pa.nulls(n_e, pa.string()), node_clss]),
                pa.concat_arrays([pa.nulls(n_e, pa.int64()),
                                  n.column("c").cast(pa.int64()).combine_chunks()]),
            ],
            names=["kind", "subj_id", "subj", "pred", "obj_id", "obj", "weight",
                   "node_id", "norm", "cls", "n_mentions"],
        )

    if combine == "tree":
        # materialize the compact int partial stream (a fusion barrier so
        # the coalescing combine doesn't force the NER stage onto
        # million-row batches; at scale this is also the natural point to
        # persist partials — durable resume itself lives in the staged
        # build's parquet checkpoint and in incremental.update_graph's
        # snapshot-per-ingest folding), collapse
        # ~4M-row chunks in parallel, finish in one tiny decode task —
        # no keyed shuffle anywhere
        part = combined.materialize()
        lvl1 = part.map_batches(_collapse_ints, batch_format="pyarrow",
                                batch_size=4_000_000)
        graph = (
            lvl1.repartition(1)
            .map_batches(final_decode, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
    else:
        # bucket-shuffle variant for corpus-scale keyspaces: cheap int
        # bucket key, per-bucket collapse+decode
        def bucketed(t: pa.Table) -> pa.Table:
            h = pc.add(
                pc.multiply(pc.cast(t.column("a"), pa.int64()), 2654435761),
                pc.add(pc.multiply(pc.cast(t.column("b"), pa.int64()), 40503),
                       pc.cast(t.column("kind"), pa.int64())),
            )
            b = pc.cast(
                pc.subtract(h, pc.multiply(pc.divide(h, 64), 64)), pa.int32())
            return t.append_column("__bucket", b)

        graph = (
            combined.map_batches(bucketed, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda g: final_decode(g.drop(["__bucket"])),
                        batch_format="pyarrow")
            .materialize()
        )

    def as_nodes(t: pa.Table) -> pa.Table:
        n = t.filter(pc.equal(t.column("kind"), "n"))
        return pa.Table.from_arrays(
            [n.column("node_id"), n.column("norm"), n.column("cls"),
             n.column("n_mentions"),
             pa.array([[]] * len(n), pa.list_(pa.string()))],
            schema=schemas.NODES,
        )

    def as_edges(t: pa.Table) -> pa.Table:
        e = t.filter(pc.equal(t.column("kind"), "e"))
        return pa.Table.from_arrays(
            [e.column("subj_id"), e.column("subj"), e.column("pred"),
             e.column("obj_id"), e.column("obj"), e.column("weight")],
            schema=schemas.EDGES,
        )

    nodes = graph.map_batches(as_nodes, batch_format="pyarrow")
    edges = graph.map_batches(as_edges, batch_format="pyarrow")
    return {"nodes": nodes, "edges": edges}
