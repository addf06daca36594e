"""Round-5 session-13 hardening: a systematic empty-corpus sweep over
EVERY curation step.

Motivation: the session opened on a real regression — ``dup_groups``
crashed when a dup-free corpus produced a pairs dataset whose
``schema()`` is None (Ray reports no schema when every block is
filtered empty and the layout loses type info; timing-dependent, so it
slipped past five sessions of green runs). The structural risk is
generic: any step whose intermediate collapses to zero rows can hit an
unguarded ``pa.concat_tables([])`` / ``schema().base_schema`` /
quantile-of-nothing path. At 100 TB, "a shard where the filter dropped
everything" is a WHEN, not an IF — an engine that crashes on it loses
the whole run.

The sweep drives all 36 ``pipelines.curate.STEPS`` with (a) a typed
EMPTY documents table and (b) a 3-row degenerate corpus with nothing to
dedup/flag, asserting no crash, output readable, and (b) preserves rows
for the pure-filter steps that should keep clean docs.
"""

import pyarrow as pa
import pytest
import ray.data as rd

from easyner_ray.pipelines.curate import STEPS

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])

# stopword-heavy so the trigram LangID seed profiles agree these are
# "en" (terse technical prose can legitimately score closer to another
# profile — that's the heuristic's contract, not a bug to assert against)
TEXTS = [
    "The quick brown fox jumps over the lazy dog near the river bank. "
    "It was a calm and quiet morning in the small town.",
    "She said that they would have been there by now if the weather "
    "had not turned so bad during the long drive home.",
    "There is a good chance that the show will be better this year "
    "than it was the last time we went to see it together.",
]


def _empty():
    return rd.from_arrow(DOC_SCHEMA.empty_table())


def _tiny():
    t = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["en", "en", "en"], pa.string()),
        "source": pa.array(["web", "web", "news"], pa.string()),
        "n_chars": pa.array([len(s) for s in TEXTS], pa.int64()),
    })
    return rd.from_arrow(t)


# kwargs each step needs beyond the dataset; steps absent here run on
# defaults. Incremental/decontam steps need persisted state -> built in
# the test body from the tiny corpus.
STEP_KWARGS = {
    "lang_filter": {"keep": ["en"]},
    "hash_sample": {"rate": 1.0},
    "mixture_sample": {"rates": {"web": 1.0, "news": 1.0}},
    "rebalance": {"targets": {"web": 0.5, "news": 0.5}},
    "split_keep": {"fractions": [["train", 0.8], ["heldout", 0.2]],
                   "keep": "train"},
    "token_budget": {"budget": 10_000},
    "weighted_sample": {"k": 3},
    "redact": {"pattern": r"\d+", "replacement": "#"},
    "dsir_select": {"target_source": "web"},
    "chunk": {"size": 50},
    "pack": {"budget": 4096},
    # permissive gates so the clean tiny corpus passes through
    # (c4_filter's doc kill rule drops docs with < min_lines surviving
    # lines — the tiny docs are single-line, which default min_lines=3
    # would correctly kill)
    "c4_filter": {"min_lines": 1},
    "gopher_filter": {"min_words": 1, "max_words": 10_000},
    "entropy_filter": {"min_entropy": 0.0},
    "compression_filter": {"min_ratio": 0.0},
    "quality_percentile": {"metric": "stopword_ratio", "low": 0.0,
                           "high": 1.0},
    "logprob_filter": {"low": 0.0, "high": 1.0},
}

STATEFUL = {"dedup_incremental", "near_dup_incremental", "decontam"}

# steps that re-shape rows rather than filter them (row count may
# legitimately change on the tiny corpus)
RESHAPING = {"pack", "chunk", "split_keep", "ppl_bucket", "hash_sample",
             "mixture_sample", "rebalance", "weighted_sample",
             "token_budget", "dsir_select", "quality_percentile",
             "logprob_filter"}


@pytest.mark.parametrize("name", sorted(set(STEPS) - STATEFUL))
def test_step_on_empty_corpus(ray_session, name):
    """Every stateless step must accept a typed 0-row corpus and return
    a readable (possibly empty) dataset — no ArrowInvalid, no
    NoneType.schema crash, no quantile-of-nothing error."""
    out = STEPS[name](_empty(), **STEP_KWARGS.get(name, {}))
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")],
        promote_options="permissive") if out.count() else None
    assert out.count() == 0 or tbl is not None


@pytest.mark.parametrize("name", sorted(set(STEPS) - STATEFUL))
def test_step_on_clean_tiny_corpus(ray_session, name):
    """Every stateless step runs on a 3-row clean corpus; pure filters
    must keep all 3 rows (nothing to flag), reshaping steps must just
    produce a readable result."""
    out = STEPS[name](_tiny(), **STEP_KWARGS.get(name, {}))
    n = out.count()
    if name not in RESHAPING:
        assert n == 3, f"{name} dropped clean docs: {n}/3 kept"
    else:
        out.take(5)  # materializes the first block: readable


def test_stateful_steps_empty_shard(ray_session, tmp_path):
    """Incremental dedup + decontam probe an EMPTY new shard against
    indexes built from the tiny corpus — the 'this crawl brought
    nothing new' case."""
    from easyner_ray.ops.dedup import build_digest_index, build_minhash_index

    digest = str(tmp_path / "digest_idx")
    minhash = str(tmp_path / "minhash_idx")
    bench = str(tmp_path / "bench.parquet")
    build_digest_index(_tiny(), digest)
    build_minhash_index(_tiny(), minhash)
    _tiny().write_parquet(bench)

    assert STEPS["dedup_incremental"](_empty(), index=digest).count() == 0
    assert STEPS["near_dup_incremental"](_empty(), index=minhash).count() == 0
    assert STEPS["decontam"](_empty(), benchmark=bench).count() == 0


def test_stateful_steps_clean_shard(ray_session, tmp_path):
    """A DISJOINT clean shard probed against tiny-corpus state keeps all
    its rows (nothing matches the index / benchmark)."""
    from easyner_ray.ops.dedup import build_digest_index, build_minhash_index

    digest = str(tmp_path / "digest_idx")
    minhash = str(tmp_path / "minhash_idx")
    bench = str(tmp_path / "bench.parquet")
    build_digest_index(_tiny(), digest)
    build_minhash_index(_tiny(), minhash)
    _tiny().write_parquet(bench)

    fresh = rd.from_arrow(pa.table({
        "doc_id": pa.array([99], pa.int64()),
        "text": pa.array(["completely unrelated sentence about sailing "
                          "boats across the wide open northern sea"],
                         pa.string()),
        "lang": pa.array(["en"], pa.string()),
        "source": pa.array(["web"], pa.string()),
        "n_chars": pa.array([88], pa.int64()),
    }))
    assert STEPS["dedup_incremental"](fresh, index=digest).count() == 1
    assert STEPS["near_dup_incremental"](fresh, index=minhash).count() == 1
    assert STEPS["decontam"](fresh, benchmark=bench, n=5).count() == 1
