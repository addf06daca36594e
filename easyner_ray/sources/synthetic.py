"""Deterministic synthetic transcript corpus + gold oracle tables.

Produces the driver-mandated input shape (BASELINE.json ``input_hint``):

    transcripts(conv_id:string, turn_idx:int32, role:string, text:string,
                tool:string, ts:timestamp[us])

plus *analytically derived* gold tables (sentences, mentions, triples,
alias lookup) that act as the independent oracle for the NER / triple
P/R >= 0.95 gate: turn text is BUILT from known sentences and planted
vocabulary terms, so the gold spans are exact by construction, not by
running the engine (FIXTURES.md F1-F5).

Construction invariants (these make the gold exact):
  * every sentence starts with a capitalized filler word and ends with '.';
  * filler words share no token with any vocabulary term, and consecutive
    planted entities always have >=1 filler between them — so the complete
    set of phrase matches in a sentence is exactly the planted terms plus
    their vocabulary token-subterms (``vocab.subterm_table``);
  * sentences are joined with a single space — so the reference's
    ``" ".join`` reassembly rule reproduces the turn text exactly
    (per-turn text equality gate);
  * everything is seeded per (seed, conv_idx): content is independent of
    how conversations are partitioned across generator tasks.

Scale: ``n_convs = max(8, int(sf * 250000))``, ~8 turns/conv, 1-3
sentences/turn. One conversation (~conv index 1) is ~50x longer than the
median (long-conversation skew); one hot entity appears in a large fraction
of sentences (hot-key skew) — see SURVEY.md §4.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from easyner_ray.functions.tokenize import norm_key
from easyner_ray.sources import vocab as _vocab

FILLERS = [
    "the", "signal", "pattern", "observed", "during", "analysis", "shows",
    "that", "results", "were", "consistent", "across", "multiple", "trials",
    "under", "standard", "conditions", "while", "sample", "values",
    "remained", "stable", "between", "runs", "and", "reported", "levels",
    "indicated", "notable", "shifts", "within", "each", "cohort", "after",
    "repeated", "measurement", "cycles", "which", "suggests", "further",
    "review", "was", "needed", "before", "final", "summary", "draft",
    "could", "proceed", "toward", "approval", "stage", "pending", "input",
]

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "calculator", "browser", "interpreter")

_BASE_TS = _dt.datetime(2026, 1, 1)

LONG_CONV_IDX = 1
LONG_CONV_TURNS = 400


def _check_fillers() -> None:
    bad = set(FILLERS) & set(_vocab.vocab_token_set())
    assert not bad, f"filler words collide with vocabulary tokens: {bad}"
    from easyner_ray.functions.sentencize import ABBREVIATIONS

    assert not set(FILLERS) & set(ABBREVIATIONS)


_check_fillers()


def n_convs_for_sf(sf: float) -> int:
    return max(8, int(round(sf * 250_000)))


def conv_id_str(conv_idx: int) -> str:
    return f"conv{conv_idx:08d}"


def generate_conversation(seed: int, conv_idx: int, with_gold: bool = True):
    """Return (turn_rows, gold_sentence_rows, gold_mention_rows).

    turn_rows: (conv_id, turn_idx, role, text, tool, ts)
    gold_sentence_rows: (conv_id, turn_idx, sent_idx, text, char_start)
    gold_mention_rows: (conv_id, turn_idx, sent_idx, mention_idx, surface,
                        norm, cls, start, end)   [end-exclusive, sentence-local]
    """
    rng = random.Random((seed << 24) ^ (conv_idx * 0x9E3779B1 & 0xFFFFFFFF))
    cid = conv_id_str(conv_idx)
    voc = _vocab.vocabulary()
    subterms = _vocab.subterm_table()

    n_turns = LONG_CONV_TURNS if conv_idx == LONG_CONV_IDX else 4 + rng.randrange(9)
    turns, gold_sents, gold_mentions = [], [], []

    for turn_idx in range(n_turns):
        role = ROLES[turn_idx % 3] if rng.random() < 0.85 else rng.choice(ROLES)
        tool = rng.choice(TOOLS) if role == "tool" else None
        ts = _BASE_TS + _dt.timedelta(seconds=conv_idx * 3600 + turn_idx * 7)

        if rng.random() < 0.01:  # empty-turn edge case
            turns.append((cid, turn_idx, role, "", tool, ts))
            continue

        n_sents = 1 + rng.randrange(3)
        sent_texts: list[str] = []
        char_cursor = 0
        for sent_idx in range(n_sents):
            chunks: list[str] = []
            ent_at: list[tuple[int, str]] = []  # (sentence-local char start, term)
            pos = 0

            def _push(chunk: str) -> None:
                nonlocal pos
                chunks.append(chunk)
                pos += len(chunk) + 1  # single-space join

            first = rng.choice(FILLERS)
            _push(first[0].upper() + first[1:])
            for _ in range(rng.randrange(3)):
                _push(rng.choice(FILLERS))

            r = rng.random()
            n_ent = 0 if r < 0.35 else 1 if r < 0.65 else 2 if r < 0.90 else 3
            for e in range(n_ent):
                if e == 0 and rng.random() < 0.18:
                    term, _cls = _vocab.HOT_ENTITY
                else:
                    term, _cls = voc[rng.randrange(len(voc))]
                ent_at.append((pos, term))
                _push(term)
                for _ in range(1 + rng.randrange(2)):
                    _push(rng.choice(FILLERS))

            sent = " ".join(chunks) + "."
            if with_gold:
                gold_sents.append((cid, turn_idx, sent_idx, sent, char_cursor))
                hits = []
                for start0, term in ent_at:
                    for s0, e0, sub_surface, sub_cls in subterms[term]:
                        hits.append((start0 + s0, start0 + e0, sub_surface, sub_cls))
                hits = sorted(set(hits))
                for midx, (s, e, surf, cls) in enumerate(hits):
                    gold_mentions.append(
                        (cid, turn_idx, sent_idx, midx, surf, norm_key(surf), cls, s, e)
                    )
            sent_texts.append(sent)
            char_cursor += len(sent) + 1

        turns.append((cid, turn_idx, role, " ".join(sent_texts), tool, ts))
    return turns, gold_sents, gold_mentions


TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

GOLD_SENTENCE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("text", pa.string()),
        ("char_start", pa.int32()),
    ]
)

GOLD_MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("mention_idx", pa.int32()),
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("cls", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)


def _rows_to_table(rows: list[tuple], schema: pa.Schema) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    return pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)], schema=schema
    )


def default_root() -> str:
    return os.environ.get("EASYNER_SYNTH_ROOT", "/tmp/easyner_synth")


def corpus_dir(tag: str) -> str:
    return os.path.join(default_root(), tag)


def ensure_corpus(
    tag: str,
    sf: float,
    seed: int = 7,
    with_gold: bool = True,
    use_ray: bool | None = None,
) -> str:
    """Idempotently materialize the corpus for scale factor ``sf`` under
    ``/tmp/easyner_synth/<tag>/``. Returns the directory.

    Serial pyarrow writes for small corpora (single-file tables — easy for
    the DuckDB oracle); a Ray ``range -> map_batches`` fan-out for bench
    scale (content identical per conversation either way).
    """
    out = corpus_dir(tag)
    marker = os.path.join(out, "_COMPLETE.json")
    params = {"sf": sf, "seed": seed, "with_gold": with_gold, "v": 3}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == params:
                return out
    os.makedirs(out, exist_ok=True)
    n = n_convs_for_sf(sf)
    if use_ray is None:
        use_ray = n > 4000

    if use_ray:
        _generate_ray(out, n, seed, with_gold)
    else:
        _generate_serial(out, n, seed, with_gold)

    _write_alias_table(out)
    with open(marker, "w") as f:
        json.dump(params, f)
    return out


def _generate_serial(out: str, n_convs: int, seed: int, with_gold: bool) -> None:
    turns, sents, ments = [], [], []
    for ci in range(n_convs):
        t, s, m = generate_conversation(seed, ci, with_gold)
        turns += t
        sents += s
        ments += m
    pq.write_table(_rows_to_table(turns, TRANSCRIPT_SCHEMA), os.path.join(out, "transcripts.parquet"))
    if with_gold:
        pq.write_table(_rows_to_table(sents, GOLD_SENTENCE_SCHEMA), os.path.join(out, "gold_sentences.parquet"))
        pq.write_table(_rows_to_table(ments, GOLD_MENTION_SCHEMA), os.path.join(out, "gold_mentions.parquet"))


def _generate_ray(out: str, n_convs: int, seed: int, with_gold: bool) -> None:
    import ray.data as rd

    def gen_batch(batch):
        turns = []
        for ci in batch["id"].tolist():
            t, _, _ = generate_conversation(seed, int(ci), with_gold=False)
            turns += t
        return _rows_to_table(turns, TRANSCRIPT_SCHEMA)

    ds = rd.range(n_convs).map_batches(gen_batch, batch_format="numpy", batch_size=256)
    ds.write_parquet(os.path.join(out, "transcripts.parquet"))
    if with_gold:  # gold at bench scale is not needed; keep the contract explicit
        raise ValueError("gold generation is serial-only; call with with_gold=False at bench scale")


def _write_alias_table(out: str) -> None:
    rows = _vocab.alias_table()
    tbl = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.string()),
        ],
        names=["term", "id"],
    )
    pq.write_table(tbl, os.path.join(out, "alias.parquet"))


def sf_from_dir(sf_dir: str) -> float:
    """Parse the scale factor from a testdata dir name like
    '/root/testdata/sf0.01'; defaults to 0.01 when unparseable."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01


def ensure_for_sf_dir(sf_dir: str) -> str:
    """Corpus keyed by the testdata dir the driver passes (sf0.001/0.01/0.1)."""
    sf = sf_from_dir(sf_dir)
    base = os.path.basename(os.path.normpath(sf_dir))
    return ensure_corpus(base, sf, with_gold=sf <= 0.02)
