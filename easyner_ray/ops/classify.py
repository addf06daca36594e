"""Distributed multinomial Naive Bayes text classification — the
fastText-style "quality classifier" shape of LLM-corpus curation (CCNet /
GPT-3 / PaLM pipelines train a small linear classifier on a trusted
corpus and score the crawl with it; arXiv:1911.00359 §4.3,
arXiv:2005.14165 Appendix A). Multinomial NB over explicit vocabulary
counts IS a linear model over log-count features, and unlike SGD
training it has a closed-form, order-independent fit — so the
distributed fit is exact and oracle-checkable, not a seed-dependent
approximation.

Training is two aggregation passes over the corpus, both collapsing to
vocab-bounded keyspaces (never a corpus-sized shuffle):

1. term totals -> global top-``vocab_size`` vocabulary (count desc /
   term asc tie order — the engine's shared cross-engine rank rule);
2. per-batch ``(term, class, tf)`` partials FILTERED to the broadcast
   vocab -> one grouped sum on the (V x C) keyspace -> the driver builds
   the dense log-probability matrix ``ln((c + 1) / (tot_c + V))``
   (add-one smoothing) plus log priors from per-class document counts.

Scoring is map-only: the (V x C) model broadcasts once via ``ray.put``;
each batch dictionary-encodes its term column, maps distinct terms to
vocab rows with ``pc.index_in``, and accumulates per-document per-class
scores with one ``np.add.at`` over the (pairs x C) contribution matrix.
Out-of-vocabulary terms contribute 0 (the explicit-V-bucket hashed
feature model, same convention as :func:`ops.textstats.dsir_weights`).

Determinism device: each class score is rounded to ``round_digits``
BEFORE the argmax, and ties break on the lexicographically smallest
class — the DuckDB oracle mirrors both (``ORDER BY round(s, 4) DESC,
class``), so the prediction is bit-stable across engines and block
layouts. ``ln`` is evaluated once per (term, class) with ``math.log``
on exactly-representable integer ratios (libm, matching DuckDB ``ln`` —
the dsir_weights precedent).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def naive_bayes_predict(docs, *, label_col: str = "source",
                        id_col: str = "doc_id", text_col: str = "text",
                        vocab_size: int = 512, batch_size: int = 4096,
                        round_digits: int = 4):
    """Fit multinomial NB on ``docs`` (features: top-``vocab_size``
    terms; classes: ``label_col``) and score every document with the
    fitted model -> ``(id_col, label_col, pred_<label_col>, score)``
    where ``score`` is the winning class's rounded log posterior
    (up to the shared evidence constant). Self-scoring the training
    corpus is the label-recovery census curation runs use to decide
    whether a metadata column is even predictable from text; to score a
    DIFFERENT corpus, fit here and reuse the broadcast model.

    100 TB shape: two vocab-keyspace aggregates + one map-only scoring
    pass; the model is (V x C) doubles broadcast once — no join, no
    corpus shuffle. A document's tf completes inside its batch (one doc
    per row), so scoring needs no cross-batch combine.
    """
    import ray

    from easyner_ray.ops.relational import grouped_agg
    from easyner_ray.ops.textstats import _tf_partial

    docs = docs.materialize()  # feeds three consumers (plans are trees)

    # ---- pass 1: global term totals -> top-V vocabulary (broadcast)
    totals = grouped_agg(
        docs.map_batches(
            lambda t: _tf_partial(t, id_col, text_col),
            batch_format="pyarrow", batch_size=batch_size)
        .select_columns(["term", "tf"]),
        ["term"], [("tf", "sum", "cnt")])
    top = totals.sort(["cnt", "term"], descending=[True, False]) \
        .limit(vocab_size).take_all()
    vocab = pa.array([r["term"] for r in top], pa.string())
    v = len(vocab)
    vocab_ref = ray.put(vocab)

    # ---- class priors: per-class document counts (tiny keyspace)
    prior_rows = grouped_agg(
        docs.select_columns([label_col]),
        [label_col], [(label_col, "count", "nd")]).take_all()
    classes = sorted(r[label_col] for r in prior_rows)
    cls_idx = {c: i for i, c in enumerate(classes)}
    n_docs = sum(r["nd"] for r in prior_rows)
    log_prior = np.zeros(len(classes))
    for r in prior_rows:
        log_prior[cls_idx[r[label_col]]] = math.log(r["nd"] / n_docs)

    # ---- pass 2: (vocab term, class) counts -> dense (V x C) log-probs
    def class_tf(t: pa.Table) -> pa.Table:
        pairs = _tf_partial(t, id_col, text_col)
        vi = pc.index_in(pairs.column("term"), value_set=ray.get(vocab_ref))
        pairs = pa.Table.from_arrays(
            [vi, pairs.column(id_col), pairs.column("tf")],
            names=["vi", id_col, "tf"]).filter(pc.is_valid(vi))
        # label per pair: one vectorized row lookup into the batch's ids
        row_of = pc.index_in(pairs.column(id_col),
                             value_set=t.column(id_col).combine_chunks())
        cls = t.column(label_col).combine_chunks().take(row_of)
        return pa.Table.from_arrays(
            [pairs.column("vi").cast(pa.int64()), cls, pairs.column("tf")],
            names=["vi", "cls", "tf"])

    ct_rows = pa.concat_tables([ray.get(r) for r in grouped_agg(
        docs.map_batches(class_tf, batch_format="pyarrow",
                         batch_size=batch_size),
        ["vi", "cls"], [("tf", "sum", "c")]).to_arrow_refs()])

    counts = np.zeros((v, len(classes)), dtype=np.int64)
    if len(ct_rows):
        vi_a = ct_rows.column("vi").combine_chunks().to_numpy(
            zero_copy_only=False)
        ci_a = np.array([cls_idx[c]
                         for c in ct_rows.column("cls").to_pylist()])
        counts[vi_a, ci_a] = ct_rows.column("c").combine_chunks().to_numpy(
            zero_copy_only=False)
    tot_c = counts.sum(axis=0)
    logp = np.empty((v, len(classes)))
    for ci in range(len(classes)):
        denom = int(tot_c[ci]) + v
        for ti in range(v):       # V x C scalar libm calls, once at fit
            logp[ti, ci] = math.log((int(counts[ti, ci]) + 1) / denom)
    model_ref = ray.put((vocab, logp, log_prior, classes))

    # ---- map-only scoring pass
    def score(t: pa.Table) -> pa.Table:
        vocab_b, logp_b, prior_b, classes_b = ray.get(model_ref)
        id_type = t.schema.field(id_col).type
        out_schema = pa.schema(
            [pa.field(id_col, id_type),
             pa.field(label_col, t.schema.field(label_col).type),
             pa.field(f"pred_{label_col}", pa.string()),
             pa.field("score", pa.float64())])
        if len(t) == 0:
            return out_schema.empty_table()
        pairs = _tf_partial(t, id_col, text_col)
        scores = np.tile(prior_b, (len(t), 1))
        ids = t.column(id_col).combine_chunks()
        if len(pairs):
            row_of = pc.index_in(pairs.column(id_col), value_set=ids)
            vi = pc.index_in(pairs.column("term"), value_set=vocab_b)
            keep = pc.is_valid(vi)
            rows = np.asarray(row_of.filter(keep).cast(pa.int64()))
            vis = np.asarray(vi.filter(keep).cast(pa.int64()))
            tfs = np.asarray(pairs.column("tf").filter(keep)
                             .combine_chunks(), dtype=np.float64)
            np.add.at(scores, rows, tfs[:, None] * logp_b[vis])
        scores = np.round(scores, round_digits)
        # argmax with lexicographic class tie-break: classes are sorted
        # ascending, so the FIRST max index is the smallest class name
        best = scores.argmax(axis=1)
        pred = pa.array([classes_b[i] for i in best], pa.string())
        return pa.Table.from_arrays(
            [ids, t.column(label_col), pred,
             pa.array(scores[np.arange(len(t)), best], pa.float64())],
            names=[id_col, label_col, f"pred_{label_col}", "score"])

    return docs.map_batches(score, batch_format="pyarrow",
                            batch_size=batch_size)
