"""Config-driven pipeline runner — the engine's analog of the reference's
``config.json`` + ``main.py`` dispatch (reference ``main.py:275-395``,
module-ignore map ``config.json:5-17``).

    python -m easyner_ray.cli --config pipeline.json [--num-cpus N]

Config shape (all sections optional; every stage individually skippable
exactly like the reference's "ignore" map):

{
  "input":  {"transcripts": "/path/to/*.parquet"}     # or {"synthetic": {"sf": 0.01}}
  "output_dir": "/tmp/kg_out",
  "ignore": {"ner": false, "triples": false, "nodes": false, "edges": false,
             "window_triples": true, "analysis": true, "search": true,
             "linked": true},
  "ner":    {"resolve": false, "sep_merge": false,
             "concurrency": 8, "batch_size": 1024},
  "triples": {"window": 2},
  "search": {"watchlist": ["zetamycin"]},
  "sink":   {"num_partitions": 32, "checkpoint": "memory"},
  "timekeep": true                                     # per-module wall clock
}

The runner owns its Ray session (the only places allowed to: CLI, bench,
tests). Outputs land as resumable partitioned Parquet under output_dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray(num_cpus: int | None = None) -> None:
    """Session bootstrap shared by both CLI modes (the CLI is one of the
    few places allowed to own a Ray session)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False


def run(config: dict, num_cpus: int | None = None) -> dict:
    _init_ray(num_cpus)

    from easyner_ray.pipelines.kg import drop_empty_turns, read_transcripts
    from easyner_ray.sources import vocab as _vocab
    from easyner_ray.stages.canonicalize import (aggregate_edges, canonical_nodes,
                                                 cls_of_norm_map, lineage_record)
    from easyner_ray.stages.dict_ner import explode_mentions
    from easyner_ray.stages.merge import tag_mentions_multi
    from easyner_ray.stages.splitter import split_sentences
    from easyner_ray.stages.triples import sentence_triples, window_triples
    from easyner_ray.state.sink import write_partitioned

    ignore = dict(config.get("ignore", {}))
    out_dir = config.get("output_dir")
    sink_cfg = config.get("sink", {})
    nparts = int(sink_cfg.get("num_partitions", 32))
    timekeep: dict[str, float] = {}
    summary: dict = {"timekeep": timekeep}

    def timed(name: str):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                timekeep[name] = round(time.time() - self.t0, 3)

        return _T()

    # ---- input
    inp = config.get("input", {})
    if "transcripts" in inp:
        source = inp["transcripts"]
    elif "synthetic" in inp:
        from easyner_ray.sources.synthetic import ensure_corpus

        sf = float(inp["synthetic"].get("sf", 0.001))
        corpus = ensure_corpus(f"cli{sf}", sf, with_gold=False, use_ray=None)
        source = os.path.join(corpus, "transcripts.parquet")
    else:
        raise ValueError("config.input needs 'transcripts' (path) or 'synthetic' ({sf})")
    summary["input"] = source

    transcripts = read_transcripts(source)

    # ---- engine selection: "staged" (default; checkpointable, aliases,
    # all optional stages) or "single_pass" (fused task-pool KGPartialsNER
    # with worker-cached matcher — the throughput shape; nodes/edges only)
    ner_cfg = config.get("ner", {})
    engine = config.get("engine", "staged")
    if engine not in ("staged", "single_pass"):
        raise ValueError(f"unknown engine {engine!r}: use 'staged' or 'single_pass'")
    if engine == "single_pass":
        from easyner_ray.pipelines.kg import build_kg_single_pass

        with timed("single_pass"):
            out = build_kg_single_pass(
                transcripts,
                ner_batch_size=int(ner_cfg.get("batch_size", 8192)),
                combine=config.get("combine", "tree"),
            )
            if out_dir:
                summary["nodes_sink"] = write_partitioned(
                    out["nodes"], os.path.join(out_dir, "nodes"), key_col="norm",
                    num_partitions=nparts, lineage=lineage_record("nodes", [source]),
                )
                summary["edges_sink"] = write_partitioned(
                    out["edges"], os.path.join(out_dir, "edges"), key_col="subj",
                    num_partitions=nparts, lineage=lineage_record("edges", [source]),
                )
            else:
                summary["nodes"] = out["nodes"].count()
                summary["edges"] = out["edges"].count()
        _finish(summary, config)
        return summary

    with timed("split+ner"):
        sentences = split_sentences(drop_empty_turns(transcripts))
        if not ignore.get("ner", False):
            conc = int(ner_cfg.get("concurrency", 8))
            sm = tag_mentions_multi(
                sentences,
                [_vocab.vocabulary()],
                resolve=bool(ner_cfg.get("resolve", False)),
                sep_merge=bool(ner_cfg.get("sep_merge", False)),
                concurrency=(1, conc),
                batch_size=int(ner_cfg.get("batch_size", 1024)),
            ).materialize()
        else:
            sm = None
            summary["sentences"] = sentences.count()

    if sm is None:
        _finish(summary, config)
        return summary

    mentions = explode_mentions(sm)
    summary["mentions"] = mentions.count()

    # ---- triples / graph
    if not ignore.get("triples", False):
        with timed("triples"):
            triples = sentence_triples(sm)
            if not ignore.get("window_triples", True):
                triples = triples.union(
                    window_triples(mentions, window=int(config.get("triples", {}).get("window", 2)))
                )
            triples = triples.materialize()
            summary["triples"] = triples.count()
    else:
        triples = None

    if not ignore.get("nodes", False):
        with timed("nodes"):
            nodes = canonical_nodes(mentions)
            if out_dir:
                summary["nodes_sink"] = write_partitioned(
                    nodes, os.path.join(out_dir, "nodes"), key_col="norm",
                    num_partitions=nparts, lineage=lineage_record("nodes", [source]),
                )
            else:
                summary["nodes"] = nodes.count()

    if triples is not None and not ignore.get("edges", False):
        with timed("edges"):
            edges = aggregate_edges(
                triples, cls_of_norm=cls_of_norm_map([_vocab.vocabulary()]))
            if out_dir:
                summary["edges_sink"] = write_partitioned(
                    edges, os.path.join(out_dir, "edges"), key_col="subj",
                    num_partitions=nparts, lineage=lineage_record("edges", [source]),
                )
            else:
                summary["edges"] = edges.count()

    # ---- optional analysis / search
    if not ignore.get("analysis", True):
        from easyner_ray.stages.analysis import export_top_entities, top_entities

        with timed("analysis"):
            if out_dir:
                summary["analysis_artifacts"] = export_top_entities(
                    mentions, out_dir, n=int(config.get("analysis", {}).get("top_n", 50))
                )
            else:
                summary["top_entities"] = top_entities(mentions, n=25).to_pandas().to_dict("records")

    if not ignore.get("search", True):
        from easyner_ray.stages.search import search_sentences

        watch = config.get("search", {}).get("watchlist", [])
        with timed("search"):
            summary["search_hits"] = search_sentences(sm, watch).count()

    if not ignore.get("pubtator", True) and out_dir:
        from easyner_ray.sources.pubtator_export import write_pubtator
        from easyner_ray.stages.rebase import (mentions_with_char_start,
                                               rebase_mentions)
        from easyner_ray.stages.splitter import reassemble_turns

        with timed("pubtator_export"):
            rebased = rebase_mentions(mentions_with_char_start(sentences, mentions))
            summary["pubtator"] = write_pubtator(
                reassemble_turns(sentences), rebased,
                os.path.join(out_dir, "pubtator"),
            )

    if not ignore.get("linked", True):
        from easyner_ray.stages.disambiguate import disambiguate_mentions

        alias_path = config.get("nel", {}).get("alias_parquet")
        if alias_path:
            import pyarrow.parquet as pq

            al = pq.read_table(alias_path)
            pairs = list(zip(al.column("term").to_pylist(), al.column("id").to_pylist()))
            with timed("linked"):
                summary["linked"] = disambiguate_mentions(sm, pairs).count()

    _finish(summary, config)
    return summary


def _finish(summary: dict, config: dict) -> None:
    if config.get("timekeep", True):
        out_dir = config.get("output_dir")
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "timekeep.json"), "w") as fh:
                json.dump(summary["timekeep"], fh, indent=2, sort_keys=True)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="easyner_ray.cli", description=__doc__.split("\n")[0])
    ap.add_argument("--config", help="KG pipeline config JSON path")
    ap.add_argument("--curate", help="curation pipeline config JSON path "
                    "(easyner_ray.pipelines.curate step chain)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if bool(args.config) == bool(args.curate):
        ap.error("exactly one of --config / --curate is required")
    if args.curate:
        import ray

        _init_ray(args.num_cpus)
        from easyner_ray.pipelines.curate import run_curation

        with open(args.curate) as fh:
            summary = run_curation(json.load(fh))
        print(json.dumps(summary, default=str))
        ray.shutdown()
        return 0
    with open(args.config) as fh:
        config = json.load(fh)
    summary = run(config, num_cpus=args.num_cpus)
    print(json.dumps(summary, default=str))
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
