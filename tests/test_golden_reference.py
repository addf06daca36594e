"""Golden conformance vs the reference's shipped sample output — the only
real-text correctness signal available offline (VERDICT round-1 item #4).

Inputs (read-only, never copied): the reference repo's
``results/sample_output/ner_huner_gene-1.json`` (999 PubMed abstracts,
9,191 spaCy-split sentences, 18,258 BioBERT mention spans) and the source
articles ``data/Lund-Autophagy-1_articles.json``.

What is asserted:
  * the model path's span convention — end-EXCLUSIVE offsets into the
    cased sentence whose slice equals the (detokenized) entity string —
    matches the engine's convention (stages/model_ner.py docstring);
  * the engine sentencizer reproduces the reference's spaCy boundaries on
    real prose: it never oversplits (boundary precision 1.0) and finds
    >= 97% of spaCy's boundaries; and its spans always tile the source
    text exactly (the reassembly invariant that keeps doc-offset
    re-basing exact on ANY input);
  * the golden JSON round-trips through the engine's loader.
"""

from __future__ import annotations

import json
import os
import re

import pytest

REF = "/root/reference"
GOLD = os.path.join(REF, "results/sample_output/ner_huner_gene-1.json")
ARTS = os.path.join(REF, "data/Lund-Autophagy-1_articles.json")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLD) and os.path.exists(ARTS)),
    reason="reference sample not available",
)


def _load():
    with open(GOLD, encoding="utf8") as f:
        ner = json.load(f)
    with open(ARTS, encoding="utf8") as f:
        arts = json.load(f)
    return ner, arts


def _detok_norm(x: str) -> str:
    """Collapse spaces around separators — the WordPiece-detok artifact in
    the reference entity strings ('gsk - 3' vs sentence 'GSK-3'; reference
    entity_parser.py:36 applies the same fix for '-' and ',')."""
    return re.sub(r"\s*([^\w\s])\s*", r"\1", x.lower())


def test_golden_span_convention_end_exclusive():
    ner, _ = _load()
    n = bad = 0
    for doc in ner.values():
        for s in doc["sentences"]:
            for ent, (st, en) in zip(s["entities"], s["entity_spans"]):
                n += 1
                if _detok_norm(s["text"][st:en]) != _detok_norm(ent):
                    bad += 1
    assert n == 18258
    # the only mismatches are NBSP / accent-folding artifacts of the
    # reference tokenizer (e.g. 'PI3\xa0K' -> 'pi3 k', 'Müllerian' ->
    # 'mullerian') — not span-convention differences
    assert bad <= 6, f"{bad}/{n} spans break the end-exclusive convention"


def test_sentencizer_agreement_with_spacy_gold():
    from easyner_ray.functions.sentencize import sentencize

    ner, arts = _load()
    docs = eng_bounds = ref_bounds = common = identical = 0
    for k, d in ner.items():
        abstract = arts[k].get("abstract") or ""
        ref_sents = [s["text"] for s in d["sentences"]]
        if " ".join(ref_sents) != abstract:
            continue  # gold doesn't tile this abstract (whitespace edits)
        docs += 1
        offs, cur = [], 0
        for s in ref_sents:
            offs.append(cur)
            cur += len(s) + 1
        eng_offs = [o for o, _ in sentencize(abstract)]
        sr, se = set(offs), set(eng_offs)
        ref_bounds += len(sr)
        eng_bounds += len(se)
        common += len(sr & se)
        if sr == se:
            identical += 1
    assert docs >= 800
    precision = common / eng_bounds
    recall = common / ref_bounds
    # measured on this corpus (round 3, after the any-next-char boundary
    # rule + the embedded-token initial fix): precision 0.9993, recall
    # 0.9982, 98.0% of docs split identically — gates set just under the
    # measured values so a regression in either direction fails
    assert precision >= 0.999, f"engine oversplits vs spaCy: precision {precision:.4f}"
    assert recall >= 0.99, f"boundary recall {recall:.4f}"
    assert identical / docs >= 0.95


def test_sentencizer_tiles_real_text():
    """Reassembling engine sentences must reproduce every abstract exactly
    — the invariant doc-offset re-basing (M8) relies on, on REAL text.
    Newlines are normalized first, exactly as the pipeline does (M7 /
    reference strip_multi_newline): re-basing is only defined over the
    normalized text the splitter actually saw."""
    from easyner_ray.functions.sentencize import reassemble, sentencize

    _, arts = _load()
    checked = 0
    for k, a in arts.items():
        abstract = re.sub(r"\n+", " ", a.get("abstract") or "")
        if not abstract:
            continue
        parts = sentencize(abstract)
        rebuilt = reassemble([t for _, t in parts], [o for o, _ in parts],
                             total_len=len(abstract))
        assert rebuilt == abstract, k
        checked += 1
    assert checked >= 990


def test_golden_json_roundtrip_through_loader():
    from easyner_ray.sources.loaders import from_easyner_json

    ner, _ = _load()
    tbl = from_easyner_json(ner)
    assert tbl.num_rows == 18258
    assert set(tbl.column_names) >= {"conv_id", "sent_idx", "surface", "start", "end"}
    # spans are end-exclusive ints with start < end
    starts = tbl.column("start").to_pylist()
    ends = tbl.column("end").to_pylist()
    assert all(s < e for s, e in zip(starts, ends))


def test_entity_frequency_batches_on_golden_mentions(ray_session):
    """A1 analysis over the reference's REAL NER output (18,258 gene
    mentions in 999 abstracts): totals tie out, the batch dimension
    reflects the single source file, and the dominant genes match the
    corpus (autophagy literature -> mtor/tsc1 at the top)."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.functions.tokenize import norm_key
    from easyner_ray.stages.analysis import entity_frequency_batches

    with open(GOLD, encoding="utf8") as f:
        ner = json.load(f)
    convs, norms = [], []
    for doc_id, doc in ner.items():
        for s in doc["sentences"]:
            for ent in s["entities"]:
                convs.append(doc_id)
                norms.append(norm_key(ent))
    tbl = pa.table({
        "conv_id": pa.array(convs, pa.string()),
        "norm": pa.array(norms, pa.string()),
        "part_id": pa.array([1] * len(convs), pa.int32()),  # one source file
    })
    out = entity_frequency_batches(rd.from_arrow(tbl)).to_pandas()

    assert out.total_count.sum() == 18258
    assert (out.batches_spanned == 1).all()
    assert (out.freq_per_batch == out.total_count).all()
    assert out.convs_spanned.max() <= 999
    top = out.sort_values(["total_count", "entity"],
                          ascending=[False, True]).head(5)
    assert {"mtor", "tsc1"} <= set(top.entity)
    # articles_set materializes exactly convs_spanned distinct ids
    row = top.iloc[0]
    assert len(row.articles_set.split(",")) == row.convs_spanned


def test_transformers_replay_end_to_end(ray_session, tmp_path):
    """VERDICT r2 #5: drive the REAL TransformersNER.__call__ (list-in
    batching, span/word extraction, nested schema) with a pipeline that
    replays the reference's 18,258 golden predictions, then run the output
    through rebase -> PubTator export (with its write-time offset
    validation) -> parse-back, all on the real abstracts. Everything but
    the matmul is the production code path."""
    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.sources.pubtator_export import (_surface_norm,
                                                     load_pubtator_mentions,
                                                     write_pubtator)
    from easyner_ray.stages.dict_ner import explode_mentions
    from easyner_ray.stages.model_ner import TransformersNER
    from easyner_ray.stages.rebase import rebase_mentions

    class _ReplayPipe:
        """HF-pipeline stand-in that REPLAYS the reference's recorded
        golden predictions: text -> the exact prediction dicts the real
        BioBERT run produced (list-in/list-out contract included).
        Defined INSIDE the test so cloudpickle ships it by value — Ray
        workers cannot import the test module."""

        def __init__(self, table: dict):
            self._t = table

        def __call__(self, texts):
            if isinstance(texts, list):
                return [self._t.get(t, []) for t in texts]
            return self._t.get(texts, [])

    ner, _ = _load()
    replay: dict = {}
    s_conv, s_turn, s_sent, s_text, s_cs = [], [], [], [], []
    t_conv, t_turn, t_text = [], [], []
    total = dropped = 0
    for k, d in ner.items():
        sents = [s["text"] for s in d["sentences"]]
        # the document text is the reference converter's own reassembly
        # (running len(sent)+1 cursor == " ".join)
        t_conv.append(k)
        t_turn.append(0)
        t_text.append(" ".join(sents))
        cur = 0
        for i, s in enumerate(d["sentences"]):
            preds = []
            for ent, (st, en) in zip(s["entities"], s["entity_spans"]):
                total += 1
                # a handful of golden words carry NBSP/accent-folding
                # artifacts of the reference tokenizer where even the
                # normalized slice differs — those can't round-trip by
                # construction and are dropped up front
                if _surface_norm(s["text"][st:en]) != _surface_norm(ent):
                    dropped += 1
                    continue
                preds.append({"start": st, "end": en, "word": ent, "score": 1.0,
                              "entity_group": "GENE"})
            replay[s["text"]] = preds
            s_conv.append(k)
            s_turn.append(0)
            s_sent.append(i)
            s_text.append(s["text"])
            s_cs.append(cur)
            cur += len(s["text"]) + 1
    assert total == 18258
    assert dropped <= 10, f"unexpectedly many non-round-trippable words: {dropped}"

    sentences = rd.from_arrow(pa.table({
        "conv_id": pa.array(s_conv, pa.string()),
        "turn_idx": pa.array(s_turn, pa.int32()),
        "sent_idx": pa.array(s_sent, pa.int32()),
        "text": pa.array(s_text, pa.string()),
        "char_start": pa.array(s_cs, pa.int32()),
    }))
    sm = sentences.map_batches(
        TransformersNER,
        fn_constructor_kwargs={"cls_name": "gene", "pipe": _ReplayPipe(replay),
                               "keep_cols": ("char_start",)},
        batch_format="pyarrow", batch_size=512, concurrency=2,
    )
    rebased = rebase_mentions(explode_mentions(sm)).materialize()
    n_mentions = rebased.count()
    assert n_mentions == total - dropped

    turns = rd.from_arrow(pa.table({
        "conv_id": pa.array(t_conv, pa.string()),
        "turn_idx": pa.array(t_turn, pa.int32()),
        "text": pa.array(t_text, pa.string()),
    }))
    out_dir = str(tmp_path / "pubtator_replay")
    res = write_pubtator(turns, rebased, out_dir)
    assert res["n_docs"] == len(t_conv)

    parsed = load_pubtator_mentions(out_dir).to_pandas()
    got = rebased.select_columns(
        ["conv_id", "turn_idx", "doc_start", "doc_end", "surface", "cls", "norm"]
    ).to_pandas()
    key = ["conv_id", "turn_idx", "doc_start", "doc_end", "surface", "cls", "norm"]
    a = parsed[key].sort_values(key).reset_index(drop=True)
    b = got[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b), "write -> load is not lossless on the golden corpus"

    # sanity on content: the autophagy corpus' dominant genes surface
    top = got["norm"].value_counts()
    assert top.index[0] == "mtor"
