"""Loader (S3-S6), span-rebase (M7/M8) and metrics (A4/A5) tests."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def test_load_text_dir(ray_session, tmp_path):
    from easyner_ray.sources.loaders import load_text_dir

    (tmp_path / "b.txt").write_text("second file\nline two")
    (tmp_path / "a.txt").write_text("first file")
    out = load_text_dir(str(tmp_path)).to_pandas().sort_values("title").reset_index(drop=True)
    assert out["title"].tolist() == ["a", "b"]
    assert out["abstract"].tolist() == ["first file", "second file line two"]
    assert out["doc_id"].str.startswith("doc_").all()


def test_load_articles_csv_precedence_and_filter(ray_session, tmp_path):
    from easyner_ray.sources.loaders import load_articles_csv

    csv = tmp_path / "meta.csv"
    csv.write_text(
        "cord_uid,doi,title,abstract\n"
        "u1,d1,Title One,Abstract one\n"
        ",d2,Title Two,Abstract two\n"
        ",,Title Three,Abstract three\n"
        "u4,d4,,Abstract four\n"          # empty title -> dropped
        "u5,d5,Title Five,\n"             # empty abstract -> dropped
    )
    out = load_articles_csv(str(csv)).to_pandas().sort_values("title").reset_index(drop=True)
    assert len(out) == 3
    ids = dict(zip(out["title"], out["doc_id"]))
    assert ids["Title One"] == "u1"          # cord_uid wins
    assert ids["Title Two"] == "d2"          # falls back to doi
    assert len(ids["Title Three"]) == 64     # sha256 fallback

    sub = load_articles_csv(str(csv), id_subset={"u1"}).to_pandas()
    assert sub["doc_id"].tolist() == ["u1"]


def test_load_pubtator(ray_session, tmp_path):
    from easyner_ray.sources.loaders import load_pubtator

    p = tmp_path / "corpus.txt"
    p.write_text(
        "101|t|First title\n"
        "101|a|First abstract text\n"
        "102|t|Second title\n"
        "102|a|Second abstract\n"
        "\n"
    )
    out = load_pubtator(str(p)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == ["101", "102"]
    assert out["abstract"].tolist() == ["First abstract text", "Second abstract"]


def test_easyner_json_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from easyner_ray.sources.loaders import from_easyner_json, to_easyner_json, write_batched_json
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import tag_mentions

    sents = rd.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 0, 0], pa.int32()),
        "sent_idx": pa.array([0, 1, 0], pa.int32()),
        "text": ["The zetamycin level rose.", "No entities here.", "ABT1 and KRAV2 interact."],
        "char_start": pa.array([0, 26, 0], pa.int32()),
    }))
    sm = tag_mentions(sents, vocabulary())
    import ray as _r

    tbl = pa.concat_tables([_r.get(r) for r in sm.to_arrow_refs()])
    blob = to_easyner_json(tbl)
    assert blob["c1"]["sentences"][0]["entities"] == ["zetamycin"]
    back = from_easyner_json(blob)
    assert back.num_rows == sum(len(s["entities"]) for d in blob.values() for s in d["sentences"])

    paths = write_batched_json(tbl, str(tmp_path / "ner"), docs_per_batch=1)
    assert [os.path.basename(p) for p in paths] == ["ner-1.json", "ner-2.json"]


def test_rebase_spans_match_turn_text(ray_session, tiny_corpus):
    """doc_start/doc_end index into the original TURN text exactly."""
    import ray.data as rd

    from easyner_ray.pipelines.kg import drop_empty_turns, read_transcripts
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import explode_mentions, tag_mentions
    from easyner_ray.stages.rebase import mentions_with_char_start, rebase_mentions
    from easyner_ray.stages.splitter import split_sentences

    ts = read_transcripts(os.path.join(tiny_corpus, "transcripts.parquet"))
    sents = split_sentences(drop_empty_turns(ts))
    # primary path: char_start carried through tag time (no join anywhere)
    sm = tag_mentions(sents, vocabulary(), keep_cols=("char_start",))
    rebased = rebase_mentions(explode_mentions(sm)).to_pandas()

    # fallback path: distributed bucketed join, must agree exactly
    mentions = explode_mentions(tag_mentions(sents, vocabulary()))
    joined = rebase_mentions(mentions_with_char_start(sents, mentions)).to_pandas()
    key = ["conv_id", "turn_idx", "sent_idx", "mention_idx"]
    a = rebased.sort_values(key).reset_index(drop=True)
    b = joined.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["doc_start"].values == b["doc_start"].values).all()
    assert (a["doc_end"].values == b["doc_end"].values).all()

    turn_text = {
        (r.conv_id, r.turn_idx): r.text
        for r in rd.read_parquet(os.path.join(tiny_corpus, "transcripts.parquet"))
        .to_pandas().itertuples()
    }
    sample = rebased.sample(n=min(300, len(rebased)), random_state=1)
    for r in sample.itertuples():
        assert turn_text[(r.conv_id, r.turn_idx)][r.doc_start:r.doc_end] == r.surface


def test_mention_prf_exact_and_tolerant():
    import pandas as pd

    from easyner_ray.stages.metrics import mention_prf

    gold = pd.DataFrame({
        "conv_id": ["c"] * 2, "turn_idx": [0, 0], "sent_idx": [0, 0],
        "cls": ["gene", "chemical"], "start": [0, 10], "end": [4, 18],
    })
    pred = pd.DataFrame({
        "conv_id": ["c"] * 2, "turn_idx": [0, 0], "sent_idx": [0, 0],
        "cls": ["gene", "chemical"], "start": [0, 11], "end": [4, 19],  # chem off by 1
    })
    exact = mention_prf(pred, gold, offset_stride=0)
    assert exact["micro"]["tp"] == 1 and exact["micro"]["fp"] == 1
    tol = mention_prf(pred, gold, offset_stride=1)
    assert tol["micro"] == {"tp": 2, "fp": 0, "fn": 0, "precision": 1.0, "recall": 1.0, "f1": 1.0}


def test_triple_prf_gate(ray_session, tiny_corpus):
    """North-rule gate on the tiny corpus: engine vs gold triples P/R = 1."""
    import os

    os.environ.setdefault("EASYNER_SYNTH_ROOT", os.path.dirname(tiny_corpus))
    import ray.data as rd

    from easyner_ray.pipelines.kg import drop_empty_turns, read_transcripts
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import tag_mentions
    from easyner_ray.stages.metrics import triple_prf
    from easyner_ray.stages.splitter import split_sentences
    from easyner_ray.stages.triples import sentence_triples

    ts = read_transcripts(os.path.join(tiny_corpus, "transcripts.parquet"))
    pred = sentence_triples(tag_mentions(split_sentences(drop_empty_turns(ts)), vocabulary()))

    gm = rd.read_parquet(os.path.join(tiny_corpus, "gold_mentions.parquet")).to_pandas()
    rows = []
    for key, grp in gm.groupby(["conv_id", "turn_idx", "sent_idx"]):
        u = sorted(set(grp["norm"]))
        for a in u:
            for b in u:
                if a != b:
                    rows.append((a, "co_occurs_with", b, *key))
    import pandas as pd

    gold = pd.DataFrame(rows, columns=["subj", "pred", "obj", "conv_id", "turn_idx", "sent_idx"])
    gold["turn_idx"] = gold["turn_idx"].astype("int32")
    gold["sent_idx"] = gold["sent_idx"].astype("int32")
    res = triple_prf(pred, rd.from_pandas(gold))
    assert res["precision"] == 1.0 and res["recall"] == 1.0, res


def test_iob_token_metrics():
    from easyner_ray.stages.metrics import iob_token_metrics

    pred = [["B-gene", "I-gene", "O", "B-chem"]]
    true = [["B-gene", "I-gene", "O", "O"]]
    m = iob_token_metrics(pred, true)
    assert m["per_class"]["gene"]["f1"] == 1.0
    assert m["per_class"]["chem"]["precision"] == 0.0
    assert m["micro"]["recall"] == 1.0  # the one true span was found


def test_normalize_newlines(ray_session):
    import ray.data as rd

    from easyner_ray.stages.rebase import normalize_newlines

    ds = rd.from_arrow(pa.table({"text": ["a\nb\n\nc", "no newlines"]}))
    out = normalize_newlines(ds).to_pandas()
    assert out["text"].tolist() == ["a b c", "no newlines"]


def test_class_remap_and_class_map(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.functions.tokenize import remap_class
    from easyner_ray.stages.merge import remap_mention_classes, to_class_map

    assert remap_class("Protein") == "gene"
    assert remap_class("CELLLINE") == "cell"
    assert remap_class("weirdlabel") == "weirdlabel"

    m = rd.from_arrow(pa.table({
        "conv_id": ["c"] * 3, "turn_idx": pa.array([0] * 3, pa.int32()),
        "sent_idx": pa.array([0] * 3, pa.int32()),
        "mention_idx": pa.array([0, 1, 2], pa.int32()),
        "surface": ["A", "B", "C"], "norm": ["a", "b", "c"],
        "cls": ["Protein", "molecule", "organism"],
        "start": pa.array([0, 2, 4], pa.int32()),
        "end": pa.array([1, 3, 5], pa.int32()),
    }))
    out = remap_mention_classes(m).to_pandas()
    assert out["cls"].tolist() == ["gene", "chemical", "species"]
    assert to_class_map([{"cls": "gene", "surface": "A"}, {"cls": "gene", "surface": "B"}]) \
        == {"gene": ["A", "B"]}


def test_pubtator_write_load_roundtrip(ray_session, tiny_corpus, tmp_path):
    """PubTator writer (reference convert_easyner_output_json_to_pubtator)
    -> annotation loader reproduces the doc-span mentions exactly, and the
    text lines parse through the S5 loader."""
    import pandas as pd

    from easyner_ray.pipelines.kg import drop_empty_turns, read_transcripts
    from easyner_ray.sources.loaders import load_pubtator
    from easyner_ray.sources.pubtator_export import (load_pubtator_mentions,
                                                     write_pubtator)
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import explode_mentions, tag_mentions
    from easyner_ray.stages.rebase import rebase_mentions
    from easyner_ray.stages.splitter import reassemble_turns, split_sentences

    ts = read_transcripts(os.path.join(tiny_corpus, "transcripts.parquet"))
    sents = split_sentences(drop_empty_turns(ts))
    sm = tag_mentions(sents, vocabulary(), keep_cols=("char_start",))
    rebased = rebase_mentions(explode_mentions(sm))
    turns = reassemble_turns(split_sentences(drop_empty_turns(
        read_transcripts(os.path.join(tiny_corpus, "transcripts.parquet")))))

    out = str(tmp_path / "pubtator")
    summary = write_pubtator(turns, rebased, out, n_buckets=4)
    assert summary["n_docs"] == turns.count()

    back = load_pubtator_mentions(out).to_pandas()
    orig = rebased.to_pandas()
    key = ["conv_id", "turn_idx", "doc_start", "doc_end", "surface", "cls", "norm"]
    a = back[key].sort_values(key).reset_index(drop=True)
    b = orig[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # the text lines parse as documents via the S5 loader (doc text == turn)
    docs = load_pubtator(out).to_pandas()
    assert len(docs) == summary["n_docs"]
    tdf = turns.to_pandas()
    tdf["doc_id"] = tdf.conv_id + ":" + tdf.turn_idx.astype(str)
    m = docs.merge(tdf, on="doc_id")
    assert (m.title == m.text).all()


def test_pubtator_variant_converters(ray_session, tmp_path):
    """Per-corpus converter variants (reference
    convert_hunflair2_pubtator_to_json.py): bioid line-per-doc, medmentions
    title+'.' join, tmvar3 plain join; plus the preprocessors' dummy-id +
    class-remap pass."""
    from easyner_ray.sources.loaders import (load_pubtator_variant,
                                             preprocess_pubtator_lines)

    src = tmp_path / "corpus.txt"
    src.write_text(
        "101|t|Title one\n"
        "101|a|Abstract one.\n"
        "101\t0\t5\tTSC1\tGene\n"
        "\n"
        "102|t|Title two\n"
        "102|a|Abstract two.\n"
        "102\t3\t9\tmTOR\tProtein\tMESH:1\n"
        "\n"
    )

    med = load_pubtator_variant(str(src), "medmentions").to_pandas().set_index("doc_id")
    assert med.loc["101", "title"] == "Title one."
    assert med.loc["101", "abstract"] == "Title one. Abstract one."

    tm = load_pubtator_variant(str(src), "tmvar3").to_pandas().set_index("doc_id")
    assert tm.loc["102", "abstract"] == "Title two Abstract two."
    br = load_pubtator_variant(str(src), "biored").to_pandas().set_index("doc_id")
    assert br.loc["102", "abstract"] == "Title two Abstract two."
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown pubtator corpus"):
        load_pubtator_variant(str(src), "nope")

    bio = load_pubtator_variant(str(src), "bioid").to_pandas()
    assert len(bio) == 4  # every id|x| line is its own doc
    assert (bio.title.str.endswith("|")).all()

    fixed = preprocess_pubtator_lines(
        str(src), {"Gene": "gene", "Protein": "gene"}
    ).to_pandas()["text"].tolist()
    ann = [l for l in fixed if "\t" in l]
    assert ann[0].split("\t") == ["101", "0", "5", "TSC1", "gene", "-1"]
    assert ann[1].split("\t") == ["102", "3", "9", "mTOR", "gene", "MESH:1"]


_MEDLINE_XML = """<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle><MedlineCitation>
    <PMID>111</PMID>
    <Article>
      <ArticleTitle>TSC1 study</ArticleTitle>
      <Journal><JournalIssue><PubDate><Year>2021</Year><Month>May</Month></PubDate></JournalIssue></Journal>
      <Abstract><AbstractText>Background part.</AbstractText><AbstractText>Result part.</AbstractText></Abstract>
    </Article>
    <MeshHeadingList><MeshHeading><DescriptorName>Autophagy</DescriptorName></MeshHeading></MeshHeadingList>
    <ChemicalList><Chemical><NameOfSubstance>rapamycin</NameOfSubstance></Chemical></ChemicalList>
  </MedlineCitation></PubmedArticle>
  <PubmedArticle><MedlineCitation>
    <PMID>222</PMID>
    <Article><ArticleTitle>No abstract here</ArticleTitle></Article>
  </MedlineCitation></PubmedArticle>
</PubmedArticleSet>
"""


def test_pubmed_downloader_injectable_transport(ray_session):
    """S1: batching (one eFetch URL per batch), URL spec, parse, and the
    no-network gate."""
    import pytest

    from easyner_ray.sources.pubmed import download_pmids, efetch_url

    url = efetch_url(["1", "2"])
    assert url.startswith("https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi")
    assert "db=pubmed&id=1,2&retmode=xml&rettype=abstract" in url

    def fake_fetch(u):
        return _MEDLINE_XML

    arts = download_pmids(["111", "222", "333"], fetch_fn=fake_fetch,
                          batch_size=2).to_pandas()
    # ceil(3/2) = 2 batches -> 2 fetches -> the 2-article XML parsed twice
    assert len(arts) == 4
    row = arts[arts.pmid == "111"].iloc[0]
    assert row.title == "TSC1 study"
    assert row.abstract == "Background part. Result part."
    assert row.mesh_terms == "Autophagy"
    assert row.chemical_list == "rapamycin"
    assert row.pubdate == "2021-May"

    with pytest.raises(Exception, match="no network"):
        download_pmids(["1"]).to_pandas()


def test_pubmed_bulk_loader_files(ray_session, tmp_path):
    """S2: gz + plain files parse, empty-abstract filter, per-file counts,
    and the baseline/update URL builders."""
    import gzip as _gzip

    from easyner_ray.sources.pubmed import (bulk_file_urls, load_medline_files,
                                            per_file_counts)

    p1 = tmp_path / "pubmed23n0001.xml"
    p1.write_text(_MEDLINE_XML)
    p2 = tmp_path / "pubmed23n0002.xml.gz"
    p2.write_bytes(_gzip.compress(_MEDLINE_XML.encode()))

    arts = load_medline_files([str(p1), str(p2)]).to_pandas()
    assert len(arts) == 2                      # pmid 222 dropped (no abstract)
    assert set(arts.pmid) == {"111"}
    counts = per_file_counts(load_medline_files([str(p1), str(p2)])).to_pandas()
    assert sorted(counts.n_articles) == [1, 1]

    urls = bulk_file_urls(3, 5, baseline=23)
    assert urls[0].endswith("/baseline/pubmed23n0003.xml.gz") and len(urls) == 3
    assert bulk_file_urls(1, 1, update=True)[0].count("updatefiles") == 1


# ------------------------------------------------- round-4 parity closers ---


def test_craft_pubannotation_to_iob(ray_session, tmp_path):
    """CRAFT IOB2 prep (reference CRAFT_preprocessing_spacy.py): span
    expansion to token boundaries, _FRAGMENT drop, overlap-pointer skip."""
    import json as _json

    from easyner_ray.sources.craft import (load_pubannotation_dir,
                                           pubannotation_to_iob)

    # tokens: Alpha(0,5) beta(6,10) -(10,11) gamma(11,16) delta(17,22) .(22,23)
    doc = {
        "sourceid": "d1",
        "text": "Alpha beta-gamma delta.",
        "denotations": [
            {"span": {"begin": 0, "end": 3}, "obj": "_FRAGMENT"},  # dropped
            {"span": {"begin": 7, "end": 14}, "obj": "CHEBI:1"},   # expands 6..16
            {"span": {"begin": 11, "end": 16}, "obj": "CHEBI:2"},  # overlap: skipped
            {"span": {"begin": 17, "end": 22}, "obj": "CHEBI:3"},
        ],
    }
    (tmp_path / "d1.json").write_text(_json.dumps(doc))
    out = (pubannotation_to_iob(load_pubannotation_dir(str(tmp_path)))
           .to_pandas().sort_values("token_idx"))
    assert out.token.tolist() == ["Alpha", "beta", "-", "gamma", "delta", "."]
    assert out.iob.tolist() == ["O", "B", "I", "I", "B", "O"]


def test_raw_articles_to_pubtator(ray_session, tmp_path):
    """Raw-JSON converter (reference convert_easyner_raw_json_to_pubtator.py):
    pmid|t|title / pmid|a|abstract blocks, title stripped, newline runs in
    the abstract collapsed to one space."""
    import ray.data as rd

    from easyner_ray.sources.loaders import load_pubtator
    from easyner_ray.sources.pubtator_export import raw_articles_to_pubtator

    arts = rd.from_items([
        {"doc_id": "9", "title": " T one ",
         "abstract": "line one\n\nline two\nline three"},
        {"doc_id": "10", "title": "T two", "abstract": "plain"},
    ])
    out_file = tmp_path / "raw.txt"
    blocks = raw_articles_to_pubtator(arts, out_path=str(out_file)).to_pandas()
    assert set(blocks.doc_id) == {"9", "10"}
    assert (out_file.read_text() ==
            "10|t|T two\n10|a|plain\n\n"
            "9|t|T one\n9|a|line one line two line three\n\n")
    # the emitted file is itself loadable by the PubTator reader (roundtrip)
    back = load_pubtator(str(out_file)).to_pandas().sort_values("doc_id")
    assert back.abstract.tolist() == ["plain", "line one line two line three"]


_COLUMN_CORPUS = """\
cholesterol B-Chemical B-Chemical
clefts O O

the O O
ATG5 B-Gene O
gene O O
"""


def test_flair_eval_harness(tmp_path):
    """Flair eval harness (reference Flair_prediction_evaluation.py):
    ColumnCorpus load, per-class/micro/macro/weighted report, out_path
    three-column file, injectable-tagger seam, no-pred error."""
    import pytest as _pytest

    from easyner_ray.sources.loaders import load_column_corpus
    from easyner_ray.stages.metrics import (evaluate_column_corpus,
                                            flair_style_report)

    p = tmp_path / "test.tsv"
    p.write_text(_COLUMN_CORPUS)
    sents = load_column_corpus(str(p))
    assert [len(s) for s in sents] == [2, 3]
    assert sents[1][1] == ("ATG5", "B-Gene", "O")

    rep = evaluate_column_corpus(str(p), out_path=str(tmp_path / "pred.txt"))
    assert rep["per_class"]["Chemical"] == {
        "precision": 1.0, "recall": 1.0, "f1": 1.0, "support": 1}
    assert rep["per_class"]["Gene"]["recall"] == 0.0
    micro = rep["micro_avg"]
    assert micro["precision"] == 1.0 and micro["recall"] == 0.5
    assert abs(micro["f1"] - 2 / 3) < 1e-12 and micro["support"] == 2
    assert rep["macro_avg"]["f1"] == 0.5 and rep["weighted_avg"]["f1"] == 0.5
    # out_path writes token gold pred; loadable as a 3-column corpus
    again = load_column_corpus(str(tmp_path / "pred.txt"))
    assert again == sents

    # injectable tagger overrides column 2 (perfect tagger -> P/R 1.0)
    perfect = evaluate_column_corpus(
        str(p), tagger=lambda toks: [["B-Chemical", "O"],
                                     ["O", "B-Gene", "O"]])
    assert perfect["micro_avg"]["f1"] == 1.0

    # 2-column corpus with no tagger is a hard error (flair seam)
    p2 = tmp_path / "two_col.tsv"
    p2.write_text("tok B-Gene\n\n")
    with _pytest.raises(ValueError, match="tagger"):
        evaluate_column_corpus(str(p2))

    # report math agrees with iob_token_metrics micro on the same input
    from easyner_ray.stages.metrics import iob_token_metrics
    gold = [["B-Chemical", "O"], ["O", "B-Gene", "O"]]
    pred = [["B-Chemical", "O"], ["O", "O", "O"]]
    assert (flair_style_report(gold, pred)["micro_avg"]["f1"]
            == iob_token_metrics(pred, gold)["micro"]["f1"])


def test_craft_to_flair_eval_chain(ray_session, tmp_path):
    """The reference's experiment workflow end-to-end: CRAFT
    PubAnnotation -> IOB2 (CRAFT_preprocessing_spacy.py) -> ColumnCorpus
    file -> Flair-style evaluation (Flair_prediction_evaluation.py) with
    an injectable tagger — the engine analog of prepping a gold corpus
    and scoring a model against it."""
    import json as _json

    from easyner_ray.sources.craft import (load_pubannotation_dir,
                                           pubannotation_to_iob)
    from easyner_ray.stages.metrics import evaluate_column_corpus

    docs = {
        "d1": ("Rapamycin inhibits mTOR signaling",
               [{"span": {"begin": 0, "end": 9}, "obj": "CHEBI:9168"}]),
        "d2": ("Autophagy requires ATG5 here",
               [{"span": {"begin": 19, "end": 23}, "obj": "PR:000004534"}]),
    }
    for did, (text, dens) in docs.items():
        (tmp_path / f"{did}.json").write_text(_json.dumps(
            {"sourceid": did, "text": text, "denotations": dens}))

    iob = (pubannotation_to_iob(load_pubannotation_dir(str(tmp_path)))
           .to_pandas().sort_values(["doc_id", "token_idx"]))

    # CRAFT emits class-less B/I/O (reference writes t.ent_iob_); attach
    # the class for the eval harness, one doc = one sentence, tab columns
    corpus = tmp_path / "test.tsv"
    with open(corpus, "w", encoding="utf8") as f:
        for did, g in iob.groupby("doc_id"):
            for _, r in g.iterrows():
                lab = "O" if r.iob == "O" else f"{r.iob}-Entity"
                f.write(f"{r.token}\t{lab}\n")
            f.write("\n")

    # tagger that knows rapamycin but misses ATG5 -> P=1, R=0.5
    def tagger(sents):
        return [["B-Entity" if tok.lower() == "rapamycin" else "O"
                 for tok in s] for s in sents]

    rep = evaluate_column_corpus(str(corpus), tagger=tagger,
                                 out_path=str(tmp_path / "pred.txt"))
    assert rep["micro_avg"] == {"precision": 1.0, "recall": 0.5,
                                "f1": 2 / 3, "support": 2}
    # the three-column artifact is itself a loadable ColumnCorpus
    again = evaluate_column_corpus(str(tmp_path / "pred.txt"))
    assert again["micro_avg"] == rep["micro_avg"]
