"""Error diff tool (reference A6, ``error_detection.py:8-96``): align
predicted vs true IOB2 sequences and report only the mismatching entity
segments per sentence — plus a mention-table variant for the engine's
exploded shape.
"""

from __future__ import annotations

import pandas as pd


def iob_mismatches(pred: list[str], true: list[str], tokens: list[str] | None = None) -> list[dict]:
    """Return mismatching segments of one sentence: contiguous runs where
    predicted label != true label, with the token slice when provided."""
    out: list[dict] = []
    i, n = 0, min(len(pred), len(true))
    while i < n:
        if pred[i] == true[i]:
            i += 1
            continue
        j = i
        while j < n and pred[j] != true[j]:
            j += 1
        seg = {"start": i, "end": j, "pred": pred[i:j], "true": true[i:j]}
        if tokens is not None:
            seg["tokens"] = tokens[i:j]
        out.append(seg)
        i = j
    return out


def mention_diff(pred_mentions, gold_mentions) -> pd.DataFrame:
    """Set-diff of two mention tables on the full identity key; returns
    rows tagged ``only_in`` = 'pred' | 'gold' (the engine-shape analog of
    the reference's mismatching-segments report)."""
    p = pred_mentions.to_pandas() if hasattr(pred_mentions, "to_pandas") else pred_mentions
    g = gold_mentions.to_pandas() if hasattr(gold_mentions, "to_pandas") else gold_mentions
    key = ["conv_id", "turn_idx", "sent_idx", "cls", "start", "end"]
    pk = p[key + ["surface"]].copy()
    gk = g[key + ["surface"]].copy()
    merged = pk.merge(gk, on=key, how="outer", indicator=True, suffixes=("_pred", "_gold"))
    diff = merged[merged["_merge"] != "both"].copy()
    diff["only_in"] = diff["_merge"].map({"left_only": "pred", "right_only": "gold"})
    return diff.drop(columns=["_merge"]).reset_index(drop=True)
