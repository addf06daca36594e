"""Config-driven training-data CURATION pipelines — the documents-table
analog of the KG runner in :mod:`easyner_ray.cli` (reference shape:
``config.json`` section toggles + ``main.py`` dispatch, reference
``main.py:275-395``; here the stages are the engine's own training-data
operators instead of the NER chain).

Config::

    {
      "input":  {"documents": "/path/documents.parquet"},   # or {"sf_dir": ...}
      "output_dir": "/tmp/curated",                          # optional
      "steps": [
        {"op": "token_filter", "min_tokens": 5},
        {"op": "quality_filter", "max_punct_ratio": 0.3},
        {"op": "repetition_filter", "max_dup_5gram_char_frac": 0.3},
        {"op": "gopher_filter", "min_words": 50},              # Gopher A1
        {"op": "lang_filter", "keep": ["en"]},
        {"op": "dedup_exact"},
        {"op": "dedup_incremental", "index": "/idx/digests"},   # vs kept corpus
        {"op": "near_dup_filter", "threshold": 0.8, "k": 3},   # or "method": "minhash"
        {"op": "near_dup_incremental", "index": "/idx/minhash", "threshold": 0.8},
        {"op": "dup_span_removal", "window": 25},              # substring dedup
        {"op": "dup_line_removal", "min_count": 2},            # boilerplate lines
        {"op": "redact", "pattern": "\\\\d+", "replacement": "<NUM>"},
        {"op": "pii_redact", "kinds": ["email", "phone"]},  # PII scrub
        {"op": "hash_sample", "rate": 0.5},
        {"op": "decontam", "benchmark": "/path/eval.parquet", "n": 5},
        {"op": "logprob_filter", "low": 0.05, "high": 0.95},
        {"op": "ppl_bucket", "keep": ["head", "middle"]},       # CCNet bands
        {"op": "dedup_keep_best", "score_col": "n_chars"},      # argmax copy
        {"op": "token_budget", "budget": 1000000},              # per-source cut
        {"op": "weighted_sample", "k": 1000, "weight": "n_chars"},
        {"op": "split_keep", "fractions": [["train", 0.9], ["heldout", 0.1]],
         "keep": "train"},                                      # eval holdout
        {"op": "mixture_sample", "rates": {"web": 0.5, "code": 1.0}},
        {"op": "rebalance", "targets": {"web": 0.5, "code": 0.3, "books": 0.2}},
        {"op": "chunk", "size": 2048, "overlap": 128},          # training windows
        {"op": "pack", "budget": 2048, "by": ["source"]}        # sequence packs
      ],
      "sink": {"num_partitions": 32}
    }

Every step is Dataset -> Dataset, so the whole chain stays a lazy
streaming plan until the sink (or the caller) consumes it; dedup steps
introduce the only shuffles. The sink is the resumable hash-partitioned
Parquet writer (``state.sink.write_partitioned``), so a crashed curation
run skips finished partitions on retry.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------- steps ---


def _step_token_filter(ds, min_tokens: int = 1, max_tokens: int | None = None,
                       text_col: str = "text", **_):
    """Keep docs whose whitespace token count lies in [min, max]."""
    from easyner_ray.ops.textstats import WS_TOKEN_RE

    def f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            t.column(text_col).combine_chunks(), WS_TOKEN_RE)
        keep = pc.greater_equal(n, min_tokens)
        if max_tokens is not None:
            keep = pc.and_(keep, pc.less_equal(n, max_tokens))
        return t.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


def _step_readability_filter(ds, max_words_per_sentence: float = 60.0,
                             min_sentences: int = 1,
                             text_col: str = "text", **_):
    """Readability gate: drop docs with no sentence structure
    (< ``min_sentences`` terminator runs) or run-on text (mean words
    per sentence above ``max_words_per_sentence``) — the wall-of-text /
    no-punctuation spam filter, built on the same ASCII run counts as
    ``ops.textstats.readability``."""
    def f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).combine_chunks()
        words = pc.count_substring_regex(txt, "[A-Za-z0-9]+")
        sents = pc.count_substring_regex(txt, "[.!?]+")
        keep = pc.greater_equal(sents, min_sentences)
        wps_ok = pc.less_equal(
            pc.cast(words, pa.float64()),
            pc.multiply(pc.cast(pc.max_element_wise(sents, 1),
                                pa.float64()),
                        float(max_words_per_sentence)))
        return t.filter(pc.and_(keep, wps_ok))

    return ds.map_batches(f, batch_format="pyarrow")


def _step_quality_filter(ds, min_chars: int = 1,
                         max_punct_ratio: float | None = None,
                         min_stopword_ratio: float | None = None,
                         text_col: str = "text", **_):
    """Filter on the quality-score kernels inline (no separate score
    table materialized — the metrics are recomputed per batch and
    dropped, which is cheaper than a join at every scale)."""
    from easyner_ray.ops.textstats import quality_score_batch

    def f(t: pa.Table) -> pa.Table:
        m = quality_score_batch(t, text_col=text_col)
        keep = pc.greater_equal(m.column("n_chars"), min_chars)
        if max_punct_ratio is not None:
            keep = pc.and_(keep, pc.less_equal(m.column("punct_ratio"),
                                               max_punct_ratio))
        if min_stopword_ratio is not None:
            keep = pc.and_(keep, pc.greater_equal(m.column("stopword_ratio"),
                                                  min_stopword_ratio))
        return t.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


def _step_repetition_filter(ds, max_dup_line_frac: float | None = None,
                            max_dup_line_char_frac: float | None = None,
                            max_top_2gram_char_frac: float | None = None,
                            max_top_3gram_char_frac: float | None = None,
                            max_dup_5gram_char_frac: float | None = None,
                            text_col: str = "text", **_):
    """Gopher-style repetition gate (Rae et al. 2021 Table A1): drop docs
    whose duplicate-line / top-n-gram / duplicated-5-gram char fractions
    exceed the given caps. Signals recomputed inline per batch
    (map-only, no join, no shuffle) — ops.textstats.repetition_stats_batch."""
    from easyner_ray.ops.textstats import repetition_stats_batch

    caps = [("dup_line_frac", max_dup_line_frac),
            ("dup_line_char_frac", max_dup_line_char_frac),
            ("top_2gram_char_frac", max_top_2gram_char_frac),
            ("top_3gram_char_frac", max_top_3gram_char_frac),
            ("dup_5gram_char_frac", max_dup_5gram_char_frac)]

    def f(t: pa.Table) -> pa.Table:
        m = repetition_stats_batch(t, text_col=text_col)
        keep = pa.array(np.ones(len(t), dtype=bool))
        for col, cap in caps:
            if cap is not None:
                keep = pc.and_(keep, pc.less_equal(m.column(col), cap))
        return t.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


def _step_quality_percentile(ds, metric: str = "stopword_ratio",
                             percentile: float = 0.25, keep: str = "above",
                             text_col: str = "text", **_):
    """Percentile-based quality gate: drop the worst ``percentile`` tail
    of a quality metric measured over THIS corpus (the common real-world
    form — "cut the bottom quartile" — where the threshold is a property
    of the data, not a config constant).

    Two passes by construction: the exact-quantile threshold (histogram
    refinement, no sort — ``ops.sketch.exact_quantiles``) then a map-only
    filter. The scored stream is materialized once because both passes
    consume it; the threshold itself is one scalar on the driver.
    ``keep="above"`` keeps metric >= P(percentile) (quality metrics where
    higher is better); ``"below"`` keeps metric <= it (e.g. punct_ratio).
    """
    from easyner_ray.ops.sketch import exact_quantiles
    from easyner_ray.ops.textstats import quality_score_batch

    def score(t: pa.Table) -> pa.Table:
        m = quality_score_batch(t, text_col=text_col)
        return t.append_column("__m", m.column(metric))

    scored = ds.map_batches(score, batch_format="pyarrow").materialize()
    thr = exact_quantiles(scored.select_columns(["__m"]), "__m",
                          [percentile])[percentile]

    def f(t: pa.Table) -> pa.Table:
        cmp = pc.greater_equal if keep == "above" else pc.less_equal
        return t.filter(cmp(t.column("__m"), thr)).drop(["__m"])

    return scored.map_batches(f, batch_format="pyarrow")


def _step_gopher_filter(ds, min_words: int = 50, max_words: int = 100_000,
                        min_mean_word_len: float = 3.0,
                        max_mean_word_len: float = 10.0,
                        max_symbol_word_ratio: float = 0.1,
                        max_bullet_line_frac: float = 0.9,
                        max_ellipsis_line_frac: float = 0.3,
                        min_alpha_word_frac: float = 0.8,
                        min_stop_hits: int = 2,
                        text_col: str = "text", **_):
    """The canonical Gopher rule set (Rae et al. 2021 Table A1
    defaults) over :func:`ops.textstats.gopher_signals_batch` —
    map-only: signals and gate run inside ONE batch kernel, nothing
    joins back. Repetition thresholds live in ``repetition_filter``;
    chain both for the full Gopher pass."""
    import numpy as np

    from easyner_ray.ops.textstats import gopher_signals_batch

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        s = gopher_signals_batch(t, text_col)
        nw = np.asarray(s.column("n_words"))
        mwl = np.asarray(s.column("mean_word_len"))
        keep = ((nw >= min_words) & (nw <= max_words)
                & (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
                & (np.asarray(s.column("symbol_word_ratio"))
                   <= max_symbol_word_ratio)
                & (np.asarray(s.column("bullet_line_frac"))
                   <= max_bullet_line_frac)
                & (np.asarray(s.column("ellipsis_line_frac"))
                   <= max_ellipsis_line_frac)
                & (np.asarray(s.column("alpha_word_frac"))
                   >= min_alpha_word_frac)
                & (np.asarray(s.column("n_stop_hits")) >= min_stop_hits))
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def _step_lang_filter(ds, keep: list[str], text_col: str = "text", **_):
    """Keep docs whose trigram language guess is in ``keep`` — profiles
    cached once per worker process (same pattern as ops.textstats.lang_id);
    the whole batch is classified in one vectorized LangID.predict pass."""
    import numpy as np

    from easyner_ray.ops.similarity import _cached_state
    from easyner_ray.ops.textstats import LangID

    keep_arr = list(keep)

    def f(t: pa.Table) -> pa.Table:
        li = _cached_state(("langid_filter",), LangID)
        preds, _ = li.predict(t.column(text_col))
        return t.filter(pa.array(np.isin(preds, keep_arr)))

    return ds.map_batches(f, batch_format="pyarrow")


def _step_dedup_exact(ds, text_col: str = "text", **_):
    """Keep ONE representative (min id) per distinct text — the exact
    dedup pass every corpus gets first. Representative ids come from the
    digest-bucketed two-phase collapse; docs re-join them with Ray's
    hash-shuffle left_semi (the rep set is corpus-scale, never a
    broadcast)."""
    from easyner_ray.ops.dedup import exact_dedup
    from easyner_ray.ops.relational import adaptive_semi_join

    # checkpoint: ds feeds TWO consumers (the digest pass and the join
    # left side) and Ray Data duplicates a shared subplan per consumer —
    # unmaterialized, the whole upstream chain (read + filters) would
    # execute twice. The checkpoint lives in the object store and spills;
    # at 100 TB it holds the already-filtered corpus, not the raw read.
    ds = ds.materialize()
    # the dedup ops key on the documents schema's doc_id column; the rep
    # set is corpus-scale at 100 TB (hash-join path), broadcast under the
    # byte gate (size_bytes() is metadata-cheap on the checkpoint)
    reps = exact_dedup(ds, text_col=text_col).select_columns(["doc_id"])
    return adaptive_semi_join(ds, reps, on="doc_id",
                              approx_bytes=ds.size_bytes())


def _step_dedup_keep_best(ds, score_col: str = "n_chars",
                          descending: bool = True,
                          text_col: str = "text", **_):
    """Exact dedup keeping the BEST copy per distinct text by
    ``score_col`` (ties: min doc_id) instead of the min-id default —
    quality-aware canonicalization (keep the longest / highest-quality
    variant of a boilerplate page). Same materialize + semi-join shape
    as :func:`_step_dedup_exact`."""
    from easyner_ray.ops.dedup import dedup_keep_best
    from easyner_ray.ops.relational import adaptive_semi_join

    ds = ds.materialize()  # two consumers — digest pass + join left side
    reps = dedup_keep_best(ds, score_col, text_col=text_col,
                           descending=descending) \
        .select_columns(["doc_id"])
    return adaptive_semi_join(ds, reps, on="doc_id",
                              approx_bytes=ds.size_bytes())


def _step_dedup_incremental(ds, index: str, id_col: str = "doc_id",
                            text_col: str = "text", **_):
    """Incremental exact dedup: collapse THIS shard to per-text
    representatives AND drop every text the persisted digest snapshot
    (``ops.dedup.build_digest_index``) has already kept — the per-crawl
    pass of a continuously-ingesting corpus. Work ~ |new shard| +
    |snapshot|; the kept corpus itself is never reread."""
    from easyner_ray.ops.dedup import exact_dedup_incremental
    from easyner_ray.ops.relational import adaptive_semi_join

    ds = ds.materialize()  # two consumers — same checkpoint rationale as
    # _step_dedup_exact (digest pass + join left side)
    fresh = exact_dedup_incremental(ds, index, text_col=text_col) \
        .select_columns([id_col])
    return adaptive_semi_join(ds, fresh, on=id_col,
                              approx_bytes=ds.size_bytes())


def _step_near_dup_incremental(ds, index: str, threshold: float = 0.8,
                               id_col: str = "doc_id",
                               text_col: str = "text", **_):
    """Drop docs that near-duplicate the KEPT corpus: probe this shard
    against a persisted :func:`ops.dedup.build_minhash_index` snapshot
    and anti-join the flagged doc ids away. Only the shard is signed and
    shuffled; each probe task reads just its own bucket partition."""
    from easyner_ray.ops.dedup import minhash_lsh_incremental
    from easyner_ray.ops.relational import adaptive_semi_join

    ds = ds.materialize()  # two consumers — probe side + join left side
    hits = minhash_lsh_incremental(ds, index, threshold=threshold,
                                   text_col=text_col) \
        .select_columns(["doc_new"])

    def rename(t: pa.Table, col=id_col) -> pa.Table:
        return t.rename_columns([col])

    hits = hits.map_batches(rename, batch_format="pyarrow")
    return adaptive_semi_join(ds, hits, on=id_col, anti=True,
                              approx_bytes=ds.size_bytes())


def _step_dup_span_removal(ds, window: int = 25, id_col: str = "doc_id",
                           text_col: str = "text", min_tokens: int = 1, **_):
    """Substring-level exact dedup (Lee et al. 2021): rewrite every doc
    with its duplicated ``window``-token spans cut out, then drop docs
    left with fewer than ``min_tokens`` tokens. The rewritten text
    replaces ``text_col`` via a hash join on the id (both sides are
    corpus-scale)."""
    from easyner_ray.ops.dedup import dup_span_removal
    from easyner_ray.ops.relational import adaptive_join

    ds = ds.materialize()  # two consumers — rewrite source + join left
    cleaned = dup_span_removal(ds, window, id_col=id_col, text_col=text_col)

    def strip(t: pa.Table) -> pa.Table:
        kept = pc.greater_equal(pc.count_substring_regex(
            t.column("text_clean"), r"\S+"), min_tokens)
        t = t.filter(kept).drop_columns(["n_removed"])
        return t.rename_columns([id_col, text_col])

    cleaned = cleaned.map_batches(strip, batch_format="pyarrow")
    return adaptive_join(ds.drop_columns([text_col]), cleaned, on=id_col)


def _step_dup_line_removal(ds, min_count: int = 2, id_col: str = "doc_id",
                           text_col: str = "text", min_tokens: int = 1, **_):
    """Corpus-level boilerplate-line removal (Dolma paragraph dedup):
    cut every non-blank line occurring >= ``min_count`` times across the
    corpus, then drop docs left under ``min_tokens``. Same rewrite-and-
    rejoin shape as :func:`_step_dup_span_removal`."""
    from easyner_ray.ops.dedup import dup_line_removal
    from easyner_ray.ops.relational import adaptive_join

    ds = ds.materialize()  # two consumers — rewrite source + join left
    cleaned = dup_line_removal(ds, min_count=min_count, text_col=text_col)

    def strip(t: pa.Table) -> pa.Table:
        kept = pc.greater_equal(pc.count_substring_regex(
            t.column("text_clean"), r"\S+"), min_tokens)
        t = t.filter(kept).drop_columns(["n_removed"])
        return t.rename_columns([id_col, text_col])

    cleaned = cleaned.map_batches(strip, batch_format="pyarrow")
    return adaptive_join(ds.drop_columns([text_col]), cleaned, on=id_col)


def _step_dup_line_keep_first(ds, min_count: int = 2,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              min_tokens: int = 1, **_):
    """CCNet-style keep-first line dedup as a chain step: a duplicated
    line survives only in its min-id document; docs left under
    ``min_tokens`` drop. Same rewrite-and-rejoin shape as
    :func:`_step_dup_line_removal`."""
    from easyner_ray.ops.dedup import dup_line_keep_first
    from easyner_ray.ops.relational import adaptive_join

    ds = ds.materialize()  # two consumers — rewrite source + join left
    cleaned = dup_line_keep_first(ds, min_count=min_count,
                                  text_col=text_col)

    def strip(t: pa.Table) -> pa.Table:
        kept = pc.greater_equal(pc.count_substring_regex(
            t.column("text_clean"), r"\S+"), min_tokens)
        t = t.filter(kept).drop_columns(["n_removed"])
        return t.rename_columns([id_col, text_col])

    cleaned = cleaned.map_batches(strip, batch_format="pyarrow")
    return adaptive_join(ds.drop_columns([text_col]), cleaned, on=id_col)


def _step_c4_filter(ds, min_words_per_line: int = 5, min_lines: int = 3,
                    id_col: str = "doc_id", text_col: str = "text", **_):
    """C4 cleaning rewrite as a chain step: line keep rules + doc kill
    rules (``textstats.c4_line_filter``), cleaned text back under the
    chain's text column, other columns rejoined."""
    from easyner_ray.ops.relational import adaptive_join
    from easyner_ray.ops.textstats import c4_line_filter

    ds = ds.materialize()  # two consumers — rewrite source + join left
    cleaned = c4_line_filter(ds, id_col=id_col, text_col=text_col,
                             min_words_per_line=min_words_per_line,
                             min_lines=min_lines)

    def strip(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column(id_col), t.column("text_clean")],
            names=[id_col, text_col])

    cleaned = cleaned.map_batches(strip, batch_format="pyarrow")
    return adaptive_join(ds.drop_columns([text_col]), cleaned, on=id_col)


def _step_cross_dup_filter(ds, max_dup_frac: float = 0.5, n: int = 3,
                           id_col: str = "doc_id", text_col: str = "text",
                           **_):
    """RefinedWeb-style cross-document duplicate-share gate: drop docs
    whose distinct word n-gram shingles overlap other documents beyond
    ``max_dup_frac`` (``textstats.cross_doc_dup_ngrams``); docs with no
    shingles pass (nothing to judge)."""
    from easyner_ray.ops.relational import adaptive_semi_join
    from easyner_ray.ops.textstats import cross_doc_dup_ngrams

    ds = ds.materialize()  # scored pass + semi-join left
    scores = cross_doc_dup_ngrams(ds, n=n, id_col=id_col,
                                  text_col=text_col)
    drop = scores.map_batches(
        lambda t: t.filter(pc.greater(t.column("dup_frac"),
                                      max_dup_frac)).select([id_col]),
        batch_format="pyarrow")
    return adaptive_semi_join(ds, drop, on=id_col, anti=True)


def _step_near_dup_filter(ds, threshold: float = 0.8, k: int = 3,
                          text_col: str = "text", method: str = "jaccard",
                          **_):
    """Drop near-duplicates: candidate pairs (exact n-gram Jaccard by
    default; ``method="minhash"`` for banded MinHash-LSH, the cheaper
    estimate at corpus scale) -> connected components -> every doc whose
    cluster representative (min id) is NOT itself is removed via a
    left_anti join against the loser set."""
    from easyner_ray.ops.dedup import (dup_groups, minhash_lsh_pairs,
                                       ngram_jaccard_pairs)
    from easyner_ray.ops.relational import adaptive_semi_join

    ds = ds.materialize()  # two consumers — same checkpoint rationale as
    # _step_dedup_exact (pairs pass + join left side)
    if method == "minhash":
        pairs = minhash_lsh_pairs(ds, threshold=threshold, k=k,
                                  text_col=text_col)
    elif method == "jaccard":
        pairs = ngram_jaccard_pairs(ds, threshold=threshold, k=k,
                                    text_col=text_col)  # pairs key on doc_id
    else:
        raise ValueError(f"near_dup_filter method {method!r}: "
                         "expected 'jaccard' or 'minhash'")
    groups = dup_groups(pairs)
    losers = groups.filter(expr="doc_id != group_id") \
        .select_columns(["doc_id"])
    return adaptive_semi_join(ds, losers, on="doc_id", anti=True,
                              approx_bytes=ds.size_bytes())


def _step_hash_sample(ds, rate: float, key: str = "doc_id", **_):
    from easyner_ray.ops.relational import hash_sample

    return hash_sample(ds, key, rate)


def _step_mixture_sample(ds, rates: dict[str, float],
                         group_col: str = "source",
                         key: str = "doc_id", default_rate: float = 0.0, **_):
    """Per-source Bernoulli mixture (explicit rates per group)."""
    from easyner_ray.ops.relational import mixture_sample

    return mixture_sample(ds, key, rates, group_col=group_col,
                          default_rate=default_rate)


def _step_rebalance(ds, targets: dict[str, float],
                    group_col: str = "source", key: str = "doc_id", **_):
    """Rebalance to a TARGET mixture distribution (shares scaled to the
    bottleneck source — ops.relational.rebalance_sources)."""
    from easyner_ray.ops.relational import rebalance_sources

    return rebalance_sources(ds, targets, key=key, group_col=group_col)


def _step_split_keep(ds, fractions: list, keep: str = "train",
                     key: str = "doc_id", **_):
    """Assign the deterministic hash split and keep ONE side — the
    eval-holdout gate of a curation chain (e.g. fractions
    [["train", 0.9], ["heldout", 0.1]], keep "train"). The split column
    itself is dropped so downstream steps see the input schema."""
    from easyner_ray.ops.relational import split_assign

    fr = [(str(lab), float(f)) for lab, f in fractions]
    out = split_assign(ds, key, fr, out_col="__split")
    return out.filter(expr=f"__split == '{keep}'").drop_columns(["__split"])


def _step_decontam(ds, benchmark: str | None = None, n: int = 5,
                   max_hits: int = 0, benchmark_index: str | None = None,
                   id_col: str = "doc_id", text_col: str = "text", **_):
    """Drop documents contaminated against a benchmark/eval corpus: any
    doc sharing more than ``max_hits`` distinct token n-grams with it is
    removed — the train/eval decontamination gate (see ``ops.decontam``).
    ``benchmark`` = path to a documents-shaped parquet (fingerprinted
    inline), or ``benchmark_index`` = a persisted ``build_fp_index``
    parquet (fingerprint the eval set once, probe every run)."""
    import ray.data as rd

    from easyner_ray.ops.decontam import contamination
    from easyner_ray.ops.relational import adaptive_semi_join

    # two consumers (fingerprint pass + final filter) -> checkpoint once
    ds = ds.materialize()
    flagged = contamination(
        ds, rd.read_parquet(benchmark) if benchmark else None, n=n,
        id_col=id_col, text_col=text_col, benchmark_index=benchmark_index)
    bad = flagged.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_hits"), max_hits))
                   .select([id_col]),
        batch_format="pyarrow")
    return adaptive_semi_join(ds, bad, on=id_col, anti=True)


def _step_logprob_filter(ds, low: float = 0.05, high: float = 0.95,
                         id_col: str = "doc_id", text_col: str = "text",
                         **_):
    """CCNet-style LM band filter: score every doc with the corpus-as-LM
    unigram log-probability (``textstats.unigram_logprob``) and keep only
    the [low, high] quantile band — gibberish falls below, boilerplate /
    degenerate repetition rises above. Two extra passes (score + exact
    quantiles of the doc-keyspace score table); the final filter is an
    adaptive semi join on ids."""
    from easyner_ray.ops.relational import adaptive_semi_join
    from easyner_ray.ops.sketch import exact_quantiles
    from easyner_ray.ops.textstats import unigram_logprob

    ds = ds.materialize()  # consumed by the scorer and the final filter
    scores = unigram_logprob(ds, id_col=id_col, text_col=text_col,
                             round_digits=None).materialize()
    thr = exact_quantiles(scores, "logprob", [low, high])
    lo, hi = thr[low], thr[high]
    if lo is None:  # empty corpus
        return ds

    keep = scores.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("logprob"), lo),
            pc.less_equal(t.column("logprob"), hi))).select([id_col]),
        batch_format="pyarrow")
    return adaptive_semi_join(ds, keep, on=id_col)


def _step_ppl_bucket(ds, keep: list[str] | None = None,
                     id_col: str = "doc_id", text_col: str = "text", **_):
    """CCNet band gate: label every doc head/middle/tail by corpus
    logprob terciles (ops.textstats.logprob_buckets) and keep only the
    requested bands (default: drop the tail). The label table is
    id+bucket-sized; docs re-join it with an adaptive semi join."""
    from easyner_ray.ops.relational import adaptive_semi_join
    from easyner_ray.ops.textstats import logprob_buckets

    wanted = keep or ["head", "middle"]
    ds = ds.materialize()  # two consumers — score pass + join left side
    lab = logprob_buckets(ds, id_col=id_col, text_col=text_col)
    ids = lab.map_batches(
        lambda t: t.filter(pc.is_in(t.column("bucket"),
                                    value_set=pa.array(wanted))),
        batch_format="pyarrow").select_columns([id_col])
    return adaptive_semi_join(ds, ids, on=id_col,
                              approx_bytes=ds.size_bytes())


def _step_token_budget(ds, budget: int, group_col: str = "source",
                       id_col: str = "doc_id", text_col: str = "text", **_):
    """Per-source token-budget cut (ops.textstats.token_budget_subset):
    keep each source's first ``budget`` tokens along the deterministic
    export-shuffle order — the mixture-assembly step that follows
    quality filtering. Survivor ids re-join the full rows adaptively."""
    from easyner_ray.ops.relational import adaptive_semi_join
    from easyner_ray.ops.textstats import token_budget_subset

    ds = ds.materialize()  # two consumers — budget probe + join left side
    ids = token_budget_subset(ds, budget, group_col=group_col,
                              id_col=id_col, text_col=text_col) \
        .select_columns([id_col])
    return adaptive_semi_join(ds, ids, on=id_col,
                              approx_bytes=ds.size_bytes())


def _step_weighted_sample(ds, k: int, group_by: list[str] | None = None,
                          weight: str = "n_chars", id_col: str = "doc_id",
                          **_):
    """Deterministic weighted data mixing: keep ``k`` docs per group
    (default: per ``source``), inclusion probability proportional to
    ``weight`` (see ``relational.weighted_sample``); docs with
    non-positive weight drop. The helper columns are stripped so the
    chain's schema is unchanged."""
    from easyner_ray.ops.relational import weighted_sample

    out = weighted_sample(ds, list(group_by or ["source"]), weight, k,
                          id_col=id_col)
    return out.map_batches(
        lambda t: t.drop(["wkey", "sample_rank"]), batch_format="pyarrow")


def _step_redact(ds, pattern: str, replacement: str,
                 text_col: str = "text", **_):
    """Regex scrub of the text column (RE2, whole-column kernel)."""

    def f(t: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(
            t.column(text_col).combine_chunks(), pattern, replacement)
        return t.set_column(t.schema.get_field_index(text_col),
                            text_col, red)

    return ds.map_batches(f, batch_format="pyarrow")


# Dolma/BigScience-style PII presets (RE2-safe: no lookaround). Order
# matters: emails before phones so an address's digits aren't half-eaten.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d[\d\-\(\) ]{7,}\d", "<PHONE>"),
]


def _step_pii_redact(ds, kinds: list[str] | None = None,
                     text_col: str = "text", **_):
    """Built-in PII scrub — the standard pre-training privacy pass
    (emails, IPv4s, SSNs, phone-like digit runs -> typed placeholders),
    each a whole-column RE2 replace in ONE map (patterns chain inside
    the kernel, the corpus streams once). ``kinds`` selects a subset."""
    wanted = set(kinds) if kinds else {k for k, _, _ in PII_PATTERNS}

    def f(t: pa.Table) -> pa.Table:
        col = t.column(text_col).combine_chunks()
        for name, pat, repl in PII_PATTERNS:
            if name in wanted:
                col = pc.replace_substring_regex(col, pat, repl)
        return t.set_column(t.schema.get_field_index(text_col),
                            text_col, col)

    return ds.map_batches(f, batch_format="pyarrow")


def _step_normalize(ds, text_col: str = "text", **_):
    """NFC + whitespace/control canonicalization in place — the chain's
    schema is unchanged (the op's n_chars/changed audit columns are for
    the standalone query; a chain step keeps documents-shaped rows)."""
    from easyner_ray.ops.textstats import normalize_text_batch

    def f(t: pa.Table) -> pa.Table:
        return normalize_text_batch(t, text_col).select(t.schema.names)

    return ds.map_batches(f, batch_format="pyarrow")


def _step_truncate(ds, max_tokens: int = 2048, text_col: str = "text", **_):
    """Cut every document to its first ``max_tokens`` whitespace tokens
    (context-window cap), schema unchanged."""
    from easyner_ray.ops.textstats import truncate_tokens_batch

    def f(t: pa.Table) -> pa.Table:
        return truncate_tokens_batch(t, max_tokens, text_col) \
            .select(t.schema.names)

    return ds.map_batches(f, batch_format="pyarrow")


def _step_dsir_select(ds, target_source: str, min_weight: float = 0.0,
                      vocab_size: int = 256, source_col: str = "source",
                      id_col: str = "doc_id", text_col: str = "text", **_):
    """Keep documents whose DSIR importance weight (log p_target - log
    p_raw, target = the ``target_source`` slice of the INCOMING stream)
    reaches ``min_weight`` — the importance-resampling mixture shift as a
    chain step. materialize() at entry: the stream fans out three ways
    (raw counts, scoring pass, semi-join left side)."""
    from easyner_ray.ops.relational import adaptive_semi_join
    from easyner_ray.ops.textstats import dsir_weights

    ds = ds.materialize()

    def tgt(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column(source_col), target_source))

    w = dsir_weights(ds, ds.map_batches(tgt, batch_format="pyarrow"),
                     vocab_size=vocab_size, id_col=id_col,
                     text_col=text_col)

    def above(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("dsir_weight"),
                                         min_weight))

    keep = w.map_batches(above, batch_format="pyarrow") \
        .select_columns([id_col])
    return adaptive_semi_join(ds, keep, on=id_col)


def _step_chunk(ds, size: int, overlap: int = 0, text_col: str = "text",
                id_col: str = "doc_id", **_):
    """Explode documents into fixed-size overlapping character windows —
    the training-ready final shape. Output keeps ``doc_id`` (sink
    partition key) plus ``chunk_idx``, with the window text under the
    SAME text column so later steps (redact, sample) still apply."""
    from easyner_ray.ops.textstats import chunk_documents

    out = chunk_documents(ds, size=size, overlap=overlap,
                          id_col=id_col, text_col=text_col)
    return out.map_batches(
        lambda t: t.rename_columns([id_col, "chunk_idx", text_col]),
        batch_format="pyarrow")


def _step_entropy_filter(ds, min_entropy: float = 0.0,
                         max_entropy: float | None = None,
                         min_types: int = 0, text_col: str = "text",
                         id_col: str = "doc_id", **_):
    """Lexical-diversity gate: drop docs whose unigram Shannon entropy
    (and optionally distinct-type count) falls outside the band — the
    repetitive/templated-text filter. Map-only: the per-doc histogram
    completes inside its batch (ops.textstats.lexical_diversity kernel
    recomputed inline and dropped, no join-back); zero-token docs drop
    (entropy undefined, same reading as the SQL no-group)."""
    from easyner_ray.ops.textstats import _tf_partial

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        import numpy as np

        # inline recompute (mirrors lexical_diversity's batch kernel)
        pairs = _tf_partial(t, id_col, text_col)
        if len(pairs) == 0:
            return t.slice(0, 0)
        ids = pairs.column(id_col).combine_chunks()
        enc = ids.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        tf = np.asarray(pairs.column("tf"), dtype=np.float64)
        n_tok = np.bincount(codes, weights=tf)
        n_typ = np.bincount(codes)
        p = tf / n_tok[codes]
        ent = np.bincount(codes, weights=-p * np.log(p))
        ok = (ent >= min_entropy) & (n_typ >= min_types)
        if max_entropy is not None:
            ok &= ent <= max_entropy
        keep_ids = enc.dictionary.filter(pa.array(ok))
        return t.filter(pc.is_in(t.column(id_col), value_set=keep_ids))

    return ds.map_batches(f, batch_format="pyarrow")


def _step_compression_filter(ds, min_ratio: float = 0.0,
                             max_ratio: float | None = None,
                             level: int = 6, text_col: str = "text", **_):
    """Compressibility gate: drop docs whose zlib ratio (DEFLATE bytes /
    raw UTF-8 bytes) falls outside the band — low ratio = templated or
    repeated text that compresses too well, very high ratio = binary
    noise. Map-only; the per-row loop is deliberate (zlib.compress IS
    the work and it is C). Empty docs drop (ratio undefined)."""
    import zlib

    def f(t: pa.Table, lv=level) -> pa.Table:
        if len(t) == 0:
            return t
        keep = []
        for x in t.column(text_col).to_pylist():
            b = (x or "").encode("utf-8")
            if not b:
                keep.append(False)
                continue
            r = len(zlib.compress(b, lv)) / len(b)
            keep.append(r >= min_ratio
                        and (max_ratio is None or r <= max_ratio))
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def _step_pack(ds, budget: int = 2048, by: list[str] | None = None,
               n_buckets: int = 64, id_col: str = "doc_id",
               text_col: str = "text", **_):
    """Assign every surviving doc a shard-local pack id (composite
    ``(*by, bucket, pack_id)`` — ops.textstats.pack_documents), the
    final layout step before writing training sequences. Pack columns
    join back onto the FULL doc rows (adaptive broadcast/hash by
    measured bytes), so downstream steps and the sink still see the
    text."""
    from easyner_ray.ops.relational import adaptive_join
    from easyner_ray.ops.textstats import pack_documents

    ds = ds.materialize()  # two consumers: the packer and the join left
    packs = pack_documents(ds, budget, by=by, id_col=id_col,
                           text_col=text_col, n_buckets=n_buckets)
    keep = [id_col, "bucket", "pack_id", "n_tokens"]
    packs = packs.map_batches(lambda t, k=keep: t.select(k),
                              batch_format="pyarrow")
    return adaptive_join(ds, packs, on=id_col)


STEPS = {
    "token_filter": _step_token_filter,
    "pack": _step_pack,
    "quality_filter": _step_quality_filter,
    "repetition_filter": _step_repetition_filter,
    "quality_percentile": _step_quality_percentile,
    "lang_filter": _step_lang_filter,
    "dedup_exact": _step_dedup_exact,
    "dedup_keep_best": _step_dedup_keep_best,
    "dedup_incremental": _step_dedup_incremental,
    "near_dup_filter": _step_near_dup_filter,
    "near_dup_incremental": _step_near_dup_incremental,
    "dup_span_removal": _step_dup_span_removal,
    "dup_line_removal": _step_dup_line_removal,
    "dup_line_keep_first": _step_dup_line_keep_first,
    "c4_filter": _step_c4_filter,
    "cross_dup_filter": _step_cross_dup_filter,
    "hash_sample": _step_hash_sample,
    "mixture_sample": _step_mixture_sample,
    "rebalance": _step_rebalance,
    "split_keep": _step_split_keep,
    "decontam": _step_decontam,
    "logprob_filter": _step_logprob_filter,
    "gopher_filter": _step_gopher_filter,
    "ppl_bucket": _step_ppl_bucket,
    "token_budget": _step_token_budget,
    "weighted_sample": _step_weighted_sample,
    "redact": _step_redact,
    "pii_redact": _step_pii_redact,
    "chunk": _step_chunk,
    "normalize": _step_normalize,
    "truncate": _step_truncate,
    "dsir_select": _step_dsir_select,
    "entropy_filter": _step_entropy_filter,
    "compression_filter": _step_compression_filter,
    "readability_filter": _step_readability_filter,
}


# ------------------------------------------------------------ runner ---


def build_curation(config: dict):
    """Config -> lazy curated Dataset (no execution, no Ray session
    ownership — caller consumes)."""
    import os

    import ray.data as rd

    inp = config.get("input", {})
    if "documents" in inp:
        ds = rd.read_parquet(inp["documents"])
    elif "sf_dir" in inp:
        ds = rd.read_parquet(os.path.join(inp["sf_dir"], "documents.parquet"))
    else:
        raise ValueError("input needs 'documents' (parquet path) or 'sf_dir'")

    for step in config.get("steps", []):
        op = step.get("op")
        if op not in STEPS:
            raise ValueError(f"unknown curation op {op!r}; have {sorted(STEPS)}")
        ds = STEPS[op](ds, **{k: v for k, v in step.items() if k != "op"})
    return ds


def run_curation(config: dict) -> dict:
    """Build + consume: write the curated set (resumable partitioned
    Parquet when ``output_dir`` is set) and return a summary.

    ``sink.mode``:
      * ``"partitioned"`` (default) — :func:`state.sink.write_partitioned`
        hash partitions with manifests + resume (the checkpointable
        intermediate layout);
      * ``"training_shards"`` — :func:`state.sink.write_training_shards`:
        deterministic global shuffle cut into exactly ONE sorted file
        per shard (the layout a tokenizer/loader consumes; final
        export of a curation chain);
      * ``"clustered"`` — :func:`state.clustered.write_clustered`:
        Z-order range partitions over ``sink.cols`` with per-fragment
        min/max stats for stat-pruned downstream reads.
    """
    ds = build_curation(config)
    out_dir = config.get("output_dir")
    if not out_dir:
        return {"rows": ds.count()}
    sink_cfg = config.get("sink", {})
    mode = sink_cfg.get("mode", "partitioned")
    lineage = "curate:" + ",".join(s["op"] for s in config.get("steps", []))
    if mode == "training_shards":
        from easyner_ray.state.sink import write_training_shards

        summary = write_training_shards(
            ds, out_dir, key=sink_cfg.get("key_col", "doc_id"),
            n_shards=sink_cfg.get("n_shards", 32))
        return {"output_dir": out_dir, **summary}
    if mode == "clustered":
        from easyner_ray.state.clustered import write_clustered

        summary = write_clustered(
            ds, out_dir, cols=sink_cfg.get("cols", ["doc_id"]),
            num_partitions=sink_cfg.get("num_partitions", 32),
            lineage=lineage)
        return {"output_dir": out_dir, **summary}
    from easyner_ray.state.sink import write_partitioned

    summary = write_partitioned(
        ds, out_dir, key_col=sink_cfg.get("key_col", "doc_id"),
        num_partitions=sink_cfg.get("num_partitions", 32),
        lineage=lineage,
    )
    return {"output_dir": out_dir, **summary}
