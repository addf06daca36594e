"""Text analysis over a documents table: token counting, quality scoring,
language-ID, document fingerprinting.

All hot paths are vectorized (`pyarrow.compute` regex kernels over the whole
batch column); nothing here iterates Python rows except the language-ID
scorer, whose per-doc work is a handful of dict lookups over a precomputed
trigram profile (and runs in an actor pool so profiles build once).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# GPT-2-style pretokenizer (re2-compatible: no backtracking constructs).
BPE_ISH_RE = r"'(?:[sdmt]|ll|ve|re)| ?[\pL]+| ?[\pN]+| ?[^\s\pL\pN]+|\s+"
WS_TOKEN_RE = r"[^\s]+"

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "that",
    "it", "for", "on", "with", "as", "was", "at", "by", "be", "this",
)
_STOPWORD_RE = r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"


# the BPE-ish pretokenizer WITHOUT the whitespace branch: counts the
# pieces a GPT-2-style tokenizer would split off (whitespace runs are
# separators, not tokens)
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?[\pL]+| ?[\pN]+| ?[^\s\pL\pN]+"


def doc_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized per-doc stats: char count, whitespace-token and BPE-ish
    piece counts, alpha count, md5 fingerprint."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = pc.count_substring_regex(text, WS_TOKEN_RE).cast(pa.int64())
    n_bpe = pc.count_substring_regex(text, BPE_TOKEN_RE).cast(pa.int64())
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]").cast(pa.int64())
    fp = pa.array(
        [hashlib.md5(t.encode()).hexdigest() if t is not None else None
         for t in text.to_pylist()],
        pa.string(),
    )
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n_chars, n_tokens, n_bpe, n_alpha, fp],
        names=["doc_id", "n_chars", "n_tokens", "n_bpe_tokens", "n_alpha", "fingerprint"],
    )


def doc_stats(docs, batch_size: int = 4096):
    return docs.map_batches(doc_stats_batch, batch_format="pyarrow", batch_size=batch_size)


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean token length, all-caps-token share. Everything is a
    whole-column regex/count kernel."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.float64())
    n_tokens = pc.count_substring_regex(text, WS_TOKEN_RE).cast(pa.float64())
    n_punct = pc.count_substring_regex(text, r"[^\w\s]").cast(pa.float64())
    n_stop = pc.count_substring_regex(text, _STOPWORD_RE).cast(pa.float64())
    n_caps_tok = pc.count_substring_regex(text, r"\b[A-Z]{2,}\b").cast(pa.float64())
    safe_tok = pc.max_element_wise(n_tokens, pa.scalar(1.0))
    safe_chr = pc.max_element_wise(n_chars, pa.scalar(1.0))
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            n_chars.cast(pa.int64()),
            pc.divide(n_punct, safe_chr),
            pc.divide(n_stop, safe_tok),
            pc.divide(n_chars, safe_tok),
            pc.divide(n_caps_tok, safe_tok),
        ],
        names=["doc_id", "n_chars", "punct_ratio", "stopword_ratio",
               "chars_per_token", "caps_token_ratio"],
    )


def quality_scores(docs, batch_size: int = 4096):
    return docs.map_batches(quality_score_batch, batch_format="pyarrow", batch_size=batch_size)


# --- language ID: character-trigram cosine against per-language profiles ---

# Compact seed profiles: the most characteristic frequent words per language
# (public-knowledge stopword lists). The classifier scores by trigram overlap
# with profiles built from these seeds — a standard n-gram LI heuristic.
_LANG_SEEDS = {
    "en": "the and of to in is that it for on with as was at by this have from are be not",
    "de": "der die und das ist nicht von mit den auf für ein eine zu im sich des auch werden",
    "fr": "le la les des et de un une est pas que pour dans qui sur avec au plus par",
    "es": "el la los las de que y en un una es no por con para su al lo como más",
    "it": "il la di che e un una per non sono con del alla nel più come anche dalla",
}


def _trigrams(s: str) -> dict[str, float]:
    s = f"  {s.lower()}  "
    out: dict[str, float] = {}
    for i in range(len(s) - 2):
        g = s[i : i + 3]
        out[g] = out.get(g, 0.0) + 1.0
    norm = sum(v * v for v in out.values()) ** 0.5 or 1.0
    return {k: v / norm for k, v in out.items()}


class LangID:
    """Actor-pool language identifier; profiles built once in __init__."""

    def __init__(self, min_margin: float = 0.0):
        self.profiles = {lang: _trigrams(seed) for lang, seed in _LANG_SEEDS.items()}
        self.min_margin = min_margin

    def classify(self, text: str) -> tuple[str, float]:
        if not text:
            return "und", 0.0
        tg = _trigrams(text[:2000])
        best_lang, best, second = "und", 0.0, 0.0
        for lang, prof in self.profiles.items():
            score = sum(w * prof.get(g, 0.0) for g, w in tg.items())
            if score > best:
                best_lang, second, best = lang, best, score
            elif score > second:
                second = score
        if best - second < self.min_margin:
            return "und", best
        return best_lang, best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for t in batch.column("text").to_pylist():
            lang, score = self.classify(t or "")
            preds.append(lang)
            scores.append(score)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(preds, pa.string()),
                pa.array(scores, pa.float64()),
            ],
            names=["doc_id", "lang_pred", "lang_score"],
        )


def lang_id(docs, *, concurrency=None, batch_size: int = 4096,
            min_margin: float = 0.0):
    """Task pool with per-worker cached profiles (they build in ~1ms from
    module constants — an actor pool's creation latency alone would cost
    more than the whole classification pass at bench scale). ``concurrency``
    is accepted for API compatibility and ignored: tasks autoscale."""
    from easyner_ray.ops.similarity import _cached_state

    key = ("langid", min_margin)

    def li_fn(batch: pa.Table) -> pa.Table:
        return _cached_state(key, lambda: LangID(min_margin=min_margin))(batch)

    return docs.map_batches(li_fn, batch_format="pyarrow", batch_size=batch_size)


# --- rolling-hash shingle fingerprint (content-defined document signature) --

_ROLL_BASE = 1099511628211
_U64_MASK = (1 << 64) - 1


def rolling_fingerprint(tokens: list[str]) -> int:
    """64-bit polynomial rolling hash over the token sequence (order
    sensitive — distinguishes permuted bags, unlike the md5-of-text only
    when whitespace differs). Python ints masked to 64 bits: the wraparound
    is intended, and unlike np.uint64 arithmetic it raises no
    RuntimeWarning on overflow."""
    h = 14695981039346656037
    for tok in tokens:
        h = ((h * _ROLL_BASE) & _U64_MASK) ^ zlib.crc32(tok.encode())
    return h


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = []
    for t in batch.column(text_col).to_pylist():
        fps.append(f"{rolling_fingerprint((t or '').split()):016x}")
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(fps, pa.string())],
        names=["doc_id", "roll_fp"],
    )


def rolling_fingerprints(docs, batch_size: int = 4096):
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow", batch_size=batch_size)
