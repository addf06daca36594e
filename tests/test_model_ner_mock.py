"""Mocked-HF coverage for the REAL TransformersNER path (VERDICT #9):
batched pipeline call, per-row error fallback, and the nested output
contract — without transformers installed."""

from __future__ import annotations

import sys
import types

import pyarrow as pa
import pytest


POISON = "segfault sentence"


class _FakePipe:
    """Mimics a HF token-classification pipeline: list-in -> list of
    per-text prediction lists; raises on the poison text (and on any
    batch containing it, to exercise the batch->per-row fallback)."""

    def __init__(self):
        self.calls = []

    def __call__(self, texts):
        if isinstance(texts, list):
            self.calls.append(("batch", len(texts)))
            if any(POISON in t for t in texts):
                raise RuntimeError("batch inference failed")
            return [self._one(t) for t in texts]
        self.calls.append(("single", 1))
        if POISON in texts:
            raise RuntimeError("row inference failed")
        return self._one(texts)

    @staticmethod
    def _one(text):
        preds = []
        low = text.lower()
        idx = low.find("tsc1")
        if idx >= 0:
            preds.append({"start": idx, "end": idx + 4, "word": "tsc1",
                          "score": 0.99, "entity_group": "GENE"})
        return preds


@pytest.fixture()
def mocked_transformers(monkeypatch):
    fake_pipe = _FakePipe()
    fake = types.ModuleType("transformers")
    fake.AutoTokenizer = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: object())
    fake.AutoModelForTokenClassification = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: object())
    fake.pipeline = lambda *a, **k: fake_pipe
    monkeypatch.setitem(sys.modules, "transformers", fake)

    import easyner_ray.stages.model_ner as mn

    monkeypatch.setattr(mn, "HAVE_TRANSFORMERS", True)
    return mn, fake_pipe


def _batch(texts):
    n = len(texts)
    return pa.Table.from_arrays(
        [pa.array([f"c{i}" for i in range(n)], pa.string()),
         pa.array([0] * n, pa.int32()),
         pa.array(list(range(n)), pa.int32()),
         pa.array(texts, pa.string())],
        names=["conv_id", "turn_idx", "sent_idx", "text"],
    )


def test_transformers_ner_batched_happy_path(mocked_transformers):
    mn, pipe = mocked_transformers
    actor = mn.TransformersNER("any/model", cls_name="gene")
    out = actor(_batch(["TSC1 drives growth.", "no entities here."]))
    ments = out.column("mentions").to_pylist()
    assert len(ments) == 2
    assert ments[0][0]["surface"] == "tsc1"        # uncased tokenizer surface
    assert ments[0][0]["cls"] == "gene"
    assert (ments[0][0]["start"], ments[0][0]["end"]) == (0, 4)  # end-exclusive
    assert ments[1] == []
    assert pipe.calls == [("batch", 2)]            # ONE device-batched call


def test_transformers_ner_per_row_error_fallback(mocked_transformers):
    """A failing batch falls back to per-row; only the bad row is empty
    (reference error policy, ner_main.py:104-108)."""
    mn, pipe = mocked_transformers
    actor = mn.TransformersNER("any/model", cls_name="gene")
    out = actor(_batch(["TSC1 here.", POISON, "TSC1 again."]))
    ments = out.column("mentions").to_pylist()
    assert [len(m) for m in ments] == [1, 0, 1]
    kinds = [k for k, _ in pipe.calls]
    assert kinds == ["batch", "single", "single", "single"]


def test_transformers_ner_output_schema(mocked_transformers):
    from easyner_ray import schemas

    mn, _ = mocked_transformers
    actor = mn.TransformersNER("any/model", cls_name="gene")
    out = actor(_batch(["TSC1 x."]))
    assert out.schema.equals(schemas.SENTENCE_MENTIONS)


class _FakeOnnxSession:
    """Maps each input id to a label id by a fixed table — stands in for
    the onnxruntime session (same .run contract, reference feed names)."""

    def __init__(self, vocab, labelmap):
        import numpy as np

        self.np = np
        self.id_label = {vocab[t]: l for t, l in labelmap.items()}
        self.calls = []

    def run(self, outputs, feeds):
        np = self.np
        ids = feeds["input_ids_1:0"][0]
        self.calls.append(list(feeds))
        lab = np.array([[self.id_label.get(int(i), 3) for i in ids]])  # default O
        return None, lab, None


def test_onnx_ner_injectable_session():
    """N2 end-to-end with an injected session: WordPiece encode, the
    reference feed names, label decode through detok + BIO walk, entity
    strings + co-occurrence out."""
    from easyner_ray.stages.model_ner import ONNX_LABELS, OnnxNER

    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "tsc", "##1", "binds", "mtor", "."])}
    # label ids index ONNX_LABELS: B=1 I=2 O=3 X=4
    labelmap = {"[CLS]": 5, "[SEP]": 6, "tsc": 1, "##1": 4, "binds": 3,
                "mtor": 1, ".": 3, "[PAD]": 0}
    sess = _FakeOnnxSession(vocab, labelmap)
    ner = OnnxNER(vocab, ONNX_LABELS, session=sess)

    pairs = ner.predict("TSC1 binds mTOR.")
    assert ("tsc", "B") in pairs and ("##1", "X") in pairs

    batch = _batch(["TSC1 binds mTOR.", "nothing here."])
    out = ner(batch)
    ents = out.column("entities").to_pylist()
    assert ents[0] == ["tsc1", "mtor"]          # X continuation merged
    assert ents[1] == []
    assert out.column("has_co_occurrence").to_pylist() == [True, False]
    assert set(sess.calls[0]) == {"segment_ids_1:0", "input_mask_1_raw_output___9:0",
                                  "input_ids_1:0", "label_ids_1:0"}


def test_onnx_ner_gate_without_session():
    import pytest

    from easyner_ray.stages.model_ner import OnnxNER

    with pytest.raises((NotImplementedError, ValueError)):
        OnnxNER({}, model_path=None)
