"""Evaluation metrics (reference A4/A5): entity-level P/R/F1 with span
tolerance, and triple-set P/R — the BASELINE.md correctness gates.

Reference semantics (``evaluate_ner_pubtatorformat.py``):
  * a predicted span is a TP if some gold span of the same (doc, class)
    lies within ±``offset_stride`` chars on both ends (``:234-246``);
  * per-class P/R/F1 plus micro/macro averages (``:301-498``).

Engine realization: an equi-join on the grouping key (here the sentence
key + class) with the tolerance window applied inside the joined group —
expressed as a coarse-bucketed grouped combine like every other
high-cardinality exchange in this engine. Exact-match fast path when
``offset_stride == 0``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _key_frame(df: pd.DataFrame, cols) -> pd.DataFrame:
    return df[list(cols)].copy()


def mention_prf(pred_mentions, gold_mentions, offset_stride: int = 0) -> dict:
    """Entity-level precision/recall/F1 of ``pred`` vs ``gold`` mention
    Datasets (schemas.MENTIONS-shaped), per class + micro.

    Fixture-scale driver-side compare when both sides fit (the reference's
    eval is file-at-a-time too); the distributed variant is the same
    bucketed join with per-bucket matching.
    """
    p = pred_mentions.to_pandas() if hasattr(pred_mentions, "to_pandas") else pred_mentions
    g = gold_mentions.to_pandas() if hasattr(gold_mentions, "to_pandas") else gold_mentions

    keycols = ["conv_id", "turn_idx", "sent_idx", "cls", "start", "end"]
    out: dict = {"per_class": {}, "micro": {}}
    classes = sorted(set(p["cls"]) | set(g["cls"]))
    tot_tp = tot_fp = tot_fn = 0
    for cls in classes:
        pc_ = p[p["cls"] == cls]
        gc_ = g[g["cls"] == cls]
        if offset_stride == 0:
            pk = set(map(tuple, pc_[keycols].values))
            gk = set(map(tuple, gc_[keycols].values))
            tp = len(pk & gk)
            fp = len(pk - gk)
            fn = len(gk - pk)
        else:
            gold_by_sent: dict = {}
            for row in gc_.itertuples(index=False):
                gold_by_sent.setdefault((row.conv_id, row.turn_idx, row.sent_idx), []).append(
                    (row.start, row.end)
                )
            tp = fp = 0
            matched: set = set()
            for row in pc_.itertuples(index=False):
                spans = gold_by_sent.get((row.conv_id, row.turn_idx, row.sent_idx), [])
                # a boundary matches on a delta of exactly 0 or +/-stride —
                # NOT any |delta| <= stride — mirroring the reference's
                # get_offsets expansion (evaluate_ner_pubtatorformat.py);
                # identical at the reference default stride=1
                ok = (0, offset_stride, -offset_stride)
                hit = None
                for j, (gs, ge) in enumerate(spans):
                    if (row.start - gs) in ok and (row.end - ge) in ok:
                        hit = (row.conv_id, row.turn_idx, row.sent_idx, j)
                        break
                if hit is not None:
                    tp += 1
                    matched.add(hit)
                else:
                    fp += 1
            fn = len(gc_) - len(matched)
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out["per_class"][cls] = {"tp": tp, "fp": fp, "fn": fn,
                                 "precision": prec, "recall": rec, "f1": f1}
        tot_tp += tp
        tot_fp += fp
        tot_fn += fn
    prec = tot_tp / (tot_tp + tot_fp) if tot_tp + tot_fp else 0.0
    rec = tot_tp / (tot_tp + tot_fn) if tot_tp + tot_fn else 0.0
    out["micro"] = {
        "tp": tot_tp, "fp": tot_fp, "fn": tot_fn,
        "precision": prec, "recall": rec,
        "f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
    }
    return out


def triple_prf(pred_triples, gold_triples) -> dict:
    """Triple-set precision/recall/F1 (the north-rule P/R >= 0.95 gate).

    Identity = (subj, pred, obj, conv_id, turn_idx, sent_idx). Distributed
    counting: both sides collapse to distinct keys per batch, tagged with a
    side marker, then one bucketed combine counts matches — no driver-side
    set materialization at scale. Here keys are compared via their counts.
    """
    import pyarrow.compute as pc_

    from easyner_ray.ops.relational import bucketed_final

    keys = ["subj", "pred", "obj", "conv_id", "turn_idx", "sent_idx"]

    # normalize both sides to (keys, p, g) indicator rows
    def indicator(ds, is_pred: bool):
        def f(t: pa.Table) -> pa.Table:
            g = t.group_by(keys).aggregate([("subj", "count")])
            out = pa.Table.from_arrays([g.column(k) for k in keys], names=keys)
            n = len(out)
            out = out.append_column("p", pa.array([1 if is_pred else 0] * n, pa.int64()))
            return out.append_column("g", pa.array([0 if is_pred else 1] * n, pa.int64()))
        return ds.map_batches(f, batch_format="pyarrow")

    both = indicator(pred_triples, True).union(indicator(gold_triples, False))
    merged = bucketed_final(both, keys, pa_aggs=[("p", "max"), ("g", "max")],
                            out_names=["p", "g"])

    def count_partial(t: pa.Table) -> pa.Table:
        p = t.column("p")
        g = t.column("g")
        tp = pc_.sum(pc_.and_(pc_.equal(p, 1), pc_.equal(g, 1))).as_py() or 0
        fp = pc_.sum(pc_.and_(pc_.equal(p, 1), pc_.equal(g, 0))).as_py() or 0
        fn = pc_.sum(pc_.and_(pc_.equal(p, 0), pc_.equal(g, 1))).as_py() or 0
        return pa.Table.from_arrays(
            [pa.array([tp], pa.int64()), pa.array([fp], pa.int64()), pa.array([fn], pa.int64())],
            names=["tp", "fp", "fn"],
        )

    parts = merged.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    tp, fp, fn = int(parts["tp"].sum()), int(parts["fp"].sum()), int(parts["fn"].sum())
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec,
        "f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
    }


def _bio_spans(seq: list[str]):
    """(start, end, class) spans of one IOB2 sequence (seqeval-style)."""
    out, start, cls = [], None, None
    for i, lab in enumerate(seq + ["O"]):
        if lab.startswith("B-") or lab == "O" or (
            lab.startswith("I-") and cls != lab[2:]
        ):
            if start is not None:
                out.append((start, i, cls))
                start, cls = None, None
            if lab.startswith("B-"):
                start, cls = i, lab[2:]
        # continuing I- of same class: nothing to do
    return out


def iob_token_metrics(pred_labels: list[list[str]], true_labels: list[list[str]]) -> dict:
    """A4: token-level entity metrics over IOB2 sequences (seqeval-style
    span extraction + per-class P/R/F1). Driver-side fixture tool, mirrors
    reference ``metrics.py:10-35``."""
    spans = _bio_spans

    tp: dict = {}
    fp: dict = {}
    fn: dict = {}
    for pseq, tseq in zip(pred_labels, true_labels):
        ps, ts = set(spans(pseq)), set(spans(tseq))
        for _, _, c in ps & ts:
            tp[c] = tp.get(c, 0) + 1
        for _, _, c in ps - ts:
            fp[c] = fp.get(c, 0) + 1
        for _, _, c in ts - ps:
            fn[c] = fn.get(c, 0) + 1
    out = {"per_class": {}}
    classes = sorted(set(tp) | set(fp) | set(fn))
    t_tp = t_fp = t_fn = 0
    for c in classes:
        a, b, d = tp.get(c, 0), fp.get(c, 0), fn.get(c, 0)
        prec = a / (a + b) if a + b else 0.0
        rec = a / (a + d) if a + d else 0.0
        out["per_class"][c] = {
            "precision": prec, "recall": rec,
            "f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
            "support": a + d,
        }
        t_tp += a
        t_fp += b
        t_fn += d
    prec = t_tp / (t_tp + t_fp) if t_tp + t_fp else 0.0
    rec = t_tp / (t_tp + t_fn) if t_tp + t_fn else 0.0
    out["micro"] = {"precision": prec, "recall": rec,
                    "f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0}
    return out


# ---------------------------------------------------- flair-style report ---


def flair_style_report(gold_seqs: list[list[str]],
                       pred_seqs: list[list[str]]) -> dict:
    """Entity-level evaluation report in the shape of Flair's
    ``detailed_results`` table (reference
    ``supplementary/experiment_scripts/Flair_prediction_evaluation.py``:
    per-class precision/recall/F1/support plus micro / macro / weighted
    averages). Span extraction is the same seqeval-style BIO decode as
    :func:`iob_token_metrics`; the model itself stays behind the
    injectable-tagger seam in :func:`evaluate_column_corpus` (flair is
    not installed in this container)."""
    tp: dict = {}
    fp: dict = {}
    fn: dict = {}
    for gseq, pseq in zip(gold_seqs, pred_seqs):
        gs, ps = set(_bio_spans(gseq)), set(_bio_spans(pseq))
        for _, _, c in ps & gs:
            tp[c] = tp.get(c, 0) + 1
        for _, _, c in ps - gs:
            fp[c] = fp.get(c, 0) + 1
        for _, _, c in gs - ps:
            fn[c] = fn.get(c, 0) + 1

    def prf(a: int, b: int, d: int) -> tuple[float, float, float]:
        p = a / (a + b) if a + b else 0.0
        r = a / (a + d) if a + d else 0.0
        return p, r, (2 * p * r / (p + r) if p + r else 0.0)

    classes = sorted(set(tp) | set(fp) | set(fn))
    per_class = {}
    t_tp = t_fp = t_fn = t_support = 0
    for c in classes:
        a, b, d = tp.get(c, 0), fp.get(c, 0), fn.get(c, 0)
        p, r, f1 = prf(a, b, d)
        per_class[c] = {"precision": p, "recall": r, "f1": f1,
                        "support": a + d}
        t_tp, t_fp, t_fn, t_support = t_tp + a, t_fp + b, t_fn + d, \
            t_support + a + d
    mp, mr, mf = prf(t_tp, t_fp, t_fn)
    n_cls = len(classes) or 1
    macro = {k: sum(per_class[c][k] for c in classes) / n_cls
             for k in ("precision", "recall", "f1")}
    weighted = {k: (sum(per_class[c][k] * per_class[c]["support"]
                        for c in classes) / t_support if t_support else 0.0)
                for k in ("precision", "recall", "f1")}
    return {"per_class": per_class,
            "micro_avg": {"precision": mp, "recall": mr, "f1": mf,
                          "support": t_support},
            "macro_avg": {**macro, "support": t_support},
            "weighted_avg": {**weighted, "support": t_support}}


def evaluate_column_corpus(path: str, tagger=None, out_path: str | None = None) -> dict:
    """The reference's Flair prediction-evaluation harness
    (``Flair_prediction_evaluation.py``) over a ColumnCorpus IOB file:
    column 0 = token, column 1 = gold label, column 2 = predicted label
    (already present, or produced by the injectable ``tagger``).

    ``tagger``: callable(list of token sequences) -> list of predicted
    label sequences — the seam where a SequenceTagger plugs in; loading a
    real Flair model needs the (uninstalled) flair package, so the
    default requires predictions in the file. ``out_path`` writes the
    three-column ``token gold pred`` file the reference emits."""
    from easyner_ray.sources.loaders import load_column_corpus

    sentences = load_column_corpus(path)
    tokens = [[t[0] for t in s] for s in sentences]
    gold = [[t[1] for t in s] for s in sentences]
    if tagger is not None:
        pred = tagger(tokens)
    else:
        if not all(len(t) >= 3 for s in sentences for t in s):
            raise ValueError(
                "no predicted-label column in the corpus and no tagger "
                "given — pass tagger=callable (the flair SequenceTagger "
                "seam; flair itself is not installed in this container)")
        pred = [[t[2] for t in s] for s in sentences]
    if out_path is not None:
        with open(out_path, "w", encoding="utf8") as f:
            for toks, gseq, pseq in zip(tokens, gold, pred):
                for tok, g, p in zip(toks, gseq, pseq):
                    f.write(f"{tok} {g} {p}\n")
                f.write("\n")
    return flair_style_report(gold, pred)
