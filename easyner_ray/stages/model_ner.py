"""Transformer (BioBERT-style) NER actor-pool stage.

Reference semantics (reference ``ner_biobert.py:7-17``, ``ner_main.py:94-116,
193-199``): HF token-classification pipeline, ``aggregation_strategy="max"``,
``model_max_length=192``, spans end-EXCLUSIVE, surfaces from the (uncased)
tokenizer — i.e. lowercased — while spans index the cased sentence; a
per-sentence inference error yields an EMPTY prediction, not a failed task
(``ner_main.py:104-108``).

Improvements over the reference, by design: the model loads ONCE per actor
(the reference reloads it per batch file, ``ner_main.py:94``), and sentences
are fed to the pipeline as an intra-batch LIST so the model batches on
device (the reference calls it sentence-at-a-time).

``transformers``/``torch`` are not in this container, so:
  * :class:`TransformersNER` is the real stage, gated behind an import-try —
    the Ray-side plumbing (actor signature, batch shapes, error policy) is
    identical either way;
  * :class:`StubModelNER` is the deterministic CI stand-in (SURVEY.md §7
    hard part (d)): a phrase matcher restricted to a "model vocabulary"
    that reproduces the *model path's* observable conventions — lowercase
    surfaces, end-exclusive spans, per-row empty-on-error.

Output shape matches DictNER: nested schemas.SENTENCE_MENTIONS.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from easyner_ray.functions.phrase_match import PhraseMatcher
from easyner_ray.functions.tokenize import norm_key
from easyner_ray.stages.dict_ner import mentions_to_structs, sentence_mentions_table_flat

try:  # pragma: no cover - not installed in the sandbox
    import transformers  # noqa: F401

    HAVE_TRANSFORMERS = True
except ImportError:
    HAVE_TRANSFORMERS = False


class StubModelNER:
    """Deterministic stand-in for the transformer pipeline (CI / sandbox)."""

    def __init__(self, terms, cls_name: str | None = None):
        if isinstance(terms, ray.ObjectRef):
            terms = ray.get(terms)
        self.matcher = PhraseMatcher(terms)
        self.cls_name = cls_name

    def _predict(self, text: str):
        # HF 'max' aggregation emits the uncased tokenizer's surface
        # (lowercased); spans index the cased sentence text.
        return [
            (s, e, surf.lower(), self.cls_name or cls)
            for s, e, surf, cls in self.matcher.find(text)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for text in batch.column("text").to_pylist():
            try:
                rows.append(self._predict(text))
            except Exception:
                rows.append([])  # reference error policy: empty per-row prediction
        return sentence_mentions_table_flat(batch, rows)


class TransformersNER:  # pragma: no cover - exercised only where HF is installed
    """Real HF pipeline stage; same schema contract as StubModelNER."""

    def __init__(self, model_id: str, cls_name: str, device: int = -1, max_length: int = 192):
        if not HAVE_TRANSFORMERS:
            raise NotImplementedError(
                "transformers is not installed in this environment; "
                "use StubModelNER for deterministic CI runs"
            )
        from transformers import (AutoModelForTokenClassification, AutoTokenizer, pipeline)

        tok = AutoTokenizer.from_pretrained(model_id, model_max_length=max_length)
        model = AutoModelForTokenClassification.from_pretrained(model_id)
        self.pipe = pipeline(
            "ner", model=model, tokenizer=tok, aggregation_strategy="max", device=device
        )
        self.cls_name = cls_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        try:
            all_preds = self.pipe(texts)  # list-in: the pipeline batches on device
        except Exception:
            all_preds = None
        rows = []
        for i, text in enumerate(texts):
            if all_preds is not None:
                preds = all_preds[i]
            else:
                try:  # per-row fallback so one bad row keeps its neighbours
                    preds = self.pipe(text)
                except Exception:
                    preds = []
            rows.append(
                [(int(p["start"]), int(p["end"]), p["word"], self.cls_name) for p in preds]
            )
        return sentence_mentions_table_flat(batch, rows)


def tag_mentions_model(
    sentences,
    *,
    model: str = "stub",
    terms=None,
    model_id: str | None = None,
    cls_name: str | None = None,
    concurrency=(1, 8),
    batch_size: int = 256,
    num_cpus: float = 1,
    num_gpus: float = 0,
):
    """sentences -> nested sentence-mentions via the model-path actor pool.

    ``model='stub'`` (deterministic) or ``'transformers'`` (requires HF).
    GPU sizing: ``num_gpus=1/k`` with ``concurrency=k`` per node.
    """
    if model == "stub":
        fn, kwargs = StubModelNER, {"terms": terms, "cls_name": cls_name}
    elif model == "transformers":
        fn, kwargs = TransformersNER, {"model_id": model_id, "cls_name": cls_name or "entity"}
    else:
        raise ValueError(f"unknown model backend {model!r}")
    return sentences.map_batches(
        fn,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        num_gpus=num_gpus,
    )


class OnnxNER:  # pragma: no cover - onnxruntime model path, env-gated
    """Legacy ONNX token-classification path (reference N2,
    ``ner_inference.py:10-80``): BertTokenizer + onnxruntime session,
    max_length 128 pad-to-max, (token, label) pairs decoded through the
    WordPiece detok (M10) + BIO walk (M11). Same actor/schema contract as
    the other NER stages; requires onnxruntime + a model file, neither of
    which ship in this container — construction raises with a clear gate.
    """

    def __init__(self, model_path: str, vocab_path: str, labels: list[str],
                 cls_name: str = "entity", max_length: int = 128):
        try:
            import onnxruntime  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "onnxruntime is not installed in this environment; the "
                "biobert/stub paths cover NER — this class documents the "
                "reference's legacy ONNX contract"
            ) from e
        raise NotImplementedError(
            "ONNX session loading requires model weights not present in "
            "this container; see TransformersNER for the active model path"
        )
