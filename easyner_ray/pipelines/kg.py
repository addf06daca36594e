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
from easyner_ray.stages.canonicalize import aggregate_edges, canonical_nodes, lineage_record
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

    mentions = explode_mentions(sm)
    triples = sentence_triples(sm)
    nodes = canonical_nodes(mentions)
    edges = aggregate_edges(triples)

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
