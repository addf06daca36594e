"""Corpus loaders (SURVEY.md §2.1 S3-S6 re-expressed for Ray Data).

Every loader lands the reference's implicit ``{doc_id: {title, abstract}}``
JSON shape as an explicit Arrow table ``docs(doc_id:string, title:string,
abstract:string)``, from which the transcript-shaped pipeline (or the
documents-table ops) proceeds.

  * :func:`load_text_dir` — reference ``text_loader.py:6-38`` (S4): one
    ``*.txt`` file per doc, ids ``prefix_<i>`` in sorted-path order.
  * :func:`load_articles_csv` — reference ``cord_loader.py:14-103`` (S3):
    CSV metadata with an id-precedence chain, empty-title/abstract filter
    and optional id-subset semi-join.
  * :func:`load_pubtator` — reference
    ``convert_hunflair2_pubtator_to_json.py:47-66`` (S5): ``id|t|`` /
    ``id|a|`` line format.
  * :func:`to_easyner_json` / :func:`from_easyner_json` — the reference's
    batched-JSON artifact shape (S6), used only for golden-artifact tests;
    Parquet is the engine's real interchange.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("title", pa.string()), ("abstract", pa.string())]
)

ID_PRECEDENCE = ("cord_uid", "doi", "pmcid", "pubmed_id", "mag_id",
                 "who_covidence_id", "arxiv_id")


def load_text_dir(path: str, prefix: str = "doc"):
    """Each ``*.txt`` file -> one row (title=filename stem, abstract=joined
    lines); ids ``<prefix>_<i>`` by sorted file order (S4 semantics)."""
    import ray.data as rd

    ds = rd.read_binary_files(path, include_paths=True, file_extensions=["txt"])

    def to_docs(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        rows = sorted(zip(paths, blobs))
        return pa.Table.from_arrays(
            [
                pa.array([p for p, _ in rows], pa.string()),
                pa.array([os.path.splitext(os.path.basename(p))[0] for p, _ in rows], pa.string()),
                pa.array([" ".join(b.decode("utf-8", "replace").splitlines()) for _, b in rows], pa.string()),
            ],
            names=["__path", "title", "abstract"],
        )

    with_paths = ds.map_batches(to_docs, batch_format="pyarrow")
    # deterministic ids by global sorted-path order (the reference sorts the
    # file listing); sort is cheap — one row per file
    ordered = with_paths.sort("__path")

    def add_ids(batch: pa.Table, prefix=prefix) -> pa.Table:
        # NOTE: ids are per-sorted-order; Ray gives no global row index in
        # map_batches, so derive the id from the path hash instead — stable
        # across partitionings (documented divergence: reference uses a
        # running integer; engine uses content-addressed ids).
        ids = [f"{prefix}_{hashlib.md5(p.encode()).hexdigest()[:12]}"
               for p in batch.column("__path").to_pylist()]
        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()), batch.column("title"), batch.column("abstract")],
            schema=DOCS_SCHEMA,
        )

    return ordered.map_batches(add_ids, batch_format="pyarrow")


def first_nonempty_id(batch: pa.Table, sha_fallback_col: str = "title") -> pa.Array:
    """Vectorized id-precedence chain (reference ``cord_loader.py:53-83``):
    first non-empty of ID_PRECEDENCE columns, else sha256 of the title."""
    present = [c for c in ID_PRECEDENCE if c in batch.schema.names]
    n = len(batch)
    chosen = pa.nulls(n, pa.string())
    for c in reversed(present):  # build coalesce right-to-left
        # an all-empty CSV column is inferred as null type — cast first
        col = batch.column(c).cast(pa.string())
        valid = pc.and_(pc.is_valid(col), pc.not_equal(pc.coalesce(col, ""), ""))
        chosen = pc.if_else(valid, col, chosen)
    fallback = pa.array(
        [hashlib.sha256((t or "").encode()).hexdigest()
         for t in batch.column(sha_fallback_col).to_pylist()],
        pa.string(),
    )
    return pc.coalesce(chosen, fallback)


def load_articles_csv(path: str, id_subset: set[str] | None = None):
    """CSV -> docs with precedence ids, dropping rows with empty
    title/abstract; optional id-subset semi-join (S3 semantics)."""
    import ray.data as rd

    ds = rd.read_csv(path)

    def project(batch: pa.Table) -> pa.Table:
        ids = first_nonempty_id(batch)
        out = pa.Table.from_arrays(
            [ids, batch.column("title"), batch.column("abstract")],
            schema=DOCS_SCHEMA,
        )
        keep = pc.and_(
            pc.greater(pc.utf8_length(pc.coalesce(out.column("title"), "")), 0),
            pc.greater(pc.utf8_length(pc.coalesce(out.column("abstract"), "")), 0),
        )
        out = out.filter(keep)
        if id_subset is not None:
            out = out.filter(
                pc.is_in(out.column("doc_id"), value_set=pa.array(sorted(id_subset), pa.string()))
            )
        return out

    return ds.map_batches(project, batch_format="pyarrow")


def load_pubtator(path: str):
    """PubTator ``id|t|title`` / ``id|a|abstract`` text -> docs (S5).

    Title/abstract lines of one doc are adjacent in the file; the assemble
    is a grouped combine keyed by doc id (coarse-bucketed like every other
    high-cardinality groupby in the engine)."""
    import pandas as pd
    import ray.data as rd

    from easyner_ray.ops.relational import add_hash_bucket

    lines = rd.read_text(path)

    def parse(batch: pa.Table) -> pa.Table:
        ids, kinds, texts = [], [], []
        for line in batch.column("text").to_pylist():
            parts = line.split("|", 2)
            if len(parts) == 3 and parts[1] in ("t", "a"):
                ids.append(parts[0])
                kinds.append(parts[1])
                texts.append(parts[2])
        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(kinds, pa.string()),
             pa.array(texts, pa.string())],
            names=["doc_id", "kind", "text"],
        )

    parsed = lines.map_batches(parse, batch_format="pyarrow")
    bucketed = parsed.map_batches(
        lambda t: add_hash_bucket(t, ["doc_id"], 64), batch_format="pyarrow"
    )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="doc_id", columns="kind", values="text",
                             aggfunc="first").reset_index()
        for c in ("t", "a"):
            if c not in piv:
                piv[c] = ""
        return pd.DataFrame({
            "doc_id": piv["doc_id"],
            "title": piv["t"].fillna(""),
            "abstract": piv["a"].fillna(""),
        })

    return bucketed.groupby("__bucket").map_groups(assemble, batch_format="pandas")


# ------------------------------------------------ golden JSON round-trip ---


def to_easyner_json(sentence_mentions_table: pa.Table) -> dict:
    """Materialize the reference's nested JSON artifact shape
    ``{doc_id: {title, sentences: [{text?, entities, entity_spans}]}}``
    from a nested sentence-mentions Arrow table — test/golden surface only
    (reference ``splitter.py:51-67``, ``ner_main.py:85-86``)."""
    out: dict = {}
    t = sentence_mentions_table
    has_text = "text" in t.schema.names
    for i in range(len(t)):
        cid = t.column("conv_id")[i].as_py()
        doc = out.setdefault(cid, {"title": cid, "sentences": []})
        ments = t.column("mentions")[i].as_py() or []
        sent: dict = {
            "entities": [m["surface"] for m in ments],
            "entity_spans": [[m["start"], m["end"]] for m in ments],
        }
        if has_text:
            sent["text"] = t.column("text")[i].as_py()
        doc["sentences"].append(sent)
    return out


def from_easyner_json(blob: dict) -> pa.Table:
    """Inverse of :func:`to_easyner_json` (flat mentions rows; spans kept
    as stored — caller knows the per-operator span convention)."""
    rows = {k: [] for k in ("conv_id", "sent_idx", "mention_idx", "surface", "start", "end")}
    for cid, doc in blob.items():
        for si, sent in enumerate(doc.get("sentences", [])):
            for mi, (surf, span) in enumerate(
                zip(sent.get("entities", []), sent.get("entity_spans", []))
            ):
                rows["conv_id"].append(cid)
                rows["sent_idx"].append(si)
                rows["mention_idx"].append(mi)
                rows["surface"].append(surf)
                rows["start"].append(span[0])
                rows["end"].append(span[1])
    return pa.Table.from_arrays(
        [
            pa.array(rows["conv_id"], pa.string()),
            pa.array(rows["sent_idx"], pa.int32()),
            pa.array(rows["mention_idx"], pa.int32()),
            pa.array(rows["surface"], pa.string()),
            pa.array(rows["start"], pa.int32()),
            pa.array(rows["end"], pa.int32()),
        ],
        names=["conv_id", "sent_idx", "mention_idx", "surface", "start", "end"],
    )


def write_batched_json(sentence_mentions, out_dir: str, prefix: str = "ner",
                       docs_per_batch: int = 1000) -> list[str]:
    """Reference S6 sink shape: ``<prefix>-<i>.json`` files of at most
    ``docs_per_batch`` docs each (insertion order). Golden-artifact surface;
    collects to the driver, so fixture-scale only."""
    import math

    if isinstance(sentence_mentions, pa.Table):
        tbl = sentence_mentions
    else:
        import ray

        tbl = pa.concat_tables([ray.get(r) for r in sentence_mentions.to_arrow_refs()])
    blob = to_easyner_json(tbl)
    doc_ids = list(blob)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for bi in range(max(1, math.ceil(len(doc_ids) / docs_per_batch))):
        chunk = {d: blob[d] for d in doc_ids[bi * docs_per_batch : (bi + 1) * docs_per_batch]}
        p = os.path.join(out_dir, f"{prefix}-{bi + 1}.json")
        with open(p, "w") as fh:
            json.dump(chunk, fh, indent=2, ensure_ascii=False)
        paths.append(p)
    return paths


def load_pubtator_variant(path: str, corpus: str = "medmentions"):
    """Per-corpus PubTator -> docs converter variants (reference
    ``convert_hunflair2_pubtator_to_json.py:47-200``):

      * ``bioid``       — every ``id|x|text`` line is its own document;
        ``title`` keeps the raw ``id|x|`` prefix, ``abstract`` is the text
        (reference ``convert_bioid_to_json``);
      * ``medmentions`` — ``abstract = title + "." + " " + abstract``
        (the reference appends '.' to the title, then joins);
      * ``tmvar3`` / ``biored`` — ``abstract = title + " " + abstract``
        (join without the added period).

    All variants are distributed: line parse is a stateless map, the
    title/abstract join a bucketed group per doc id (bioid needs no group
    at all — one line is one doc).
    """
    import pandas as pd
    import ray.data as rd

    from easyner_ray.ops.relational import add_hash_bucket

    lines = rd.read_text(path)

    if corpus == "bioid":
        def parse_bioid(batch: pa.Table) -> pa.Table:
            ids, titles, abstracts = [], [], []
            for line in batch.column("text").to_pylist():
                parts = line.split("|", 2)
                if len(parts) == 3 and parts[0] and parts[1]:
                    ids.append(parts[0])
                    titles.append(f"{parts[0]}|{parts[1]}|")
                    abstracts.append(parts[2].strip())
            return pa.Table.from_arrays(
                [pa.array(ids, pa.string()), pa.array(titles, pa.string()),
                 pa.array(abstracts, pa.string())],
                names=["doc_id", "title", "abstract"],
            )

        return lines.map_batches(parse_bioid, batch_format="pyarrow")

    if corpus not in ("medmentions", "tmvar3", "biored"):
        raise ValueError(f"unknown pubtator corpus variant {corpus!r}")

    def parse(batch: pa.Table) -> pa.Table:
        ids, kinds, texts = [], [], []
        for line in batch.column("text").to_pylist():
            parts = line.split("|", 2)
            if len(parts) == 3 and parts[1] in ("t", "a"):
                ids.append(parts[0])
                kinds.append(parts[1])
                texts.append(parts[2].strip())
        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(kinds, pa.string()),
             pa.array(texts, pa.string())],
            names=["doc_id", "kind", "text"],
        )

    parsed = lines.map_batches(parse, batch_format="pyarrow")
    bucketed = parsed.map_batches(
        lambda t: add_hash_bucket(t, ["doc_id"], 64), batch_format="pyarrow"
    )
    title_suffix = "." if corpus == "medmentions" else ""

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="doc_id", columns="kind", values="text",
                             aggfunc="first").reset_index()
        for c in ("t", "a"):
            if c not in piv:
                piv[c] = ""
        title = piv["t"].fillna("") + title_suffix
        return pd.DataFrame({
            "doc_id": piv["doc_id"],
            "title": title,
            "abstract": title + " " + piv["a"].fillna(""),
        })

    return bucketed.groupby("__bucket").map_groups(assemble, batch_format="pandas")


def preprocess_pubtator_lines(path: str, mapping: dict[str, str] | None = None):
    """Reference ``preprocess_pubtatorformat.py:26-70``: pass text lines
    through; for annotation lines (>=5 TAB fields) append the dummy
    identifier ``-1`` when missing and remap the class field through
    ``mapping`` (exact-match, as the reference's TSV map). Returns a
    Dataset of corrected lines (write with ``write_text`` /
    ``write_csv``)."""
    import ray
    import ray.data as rd

    lines = rd.read_text(path)
    map_ref = ray.put(mapping or {})

    def fix(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        out = []
        for line in batch.column("text").to_pylist():
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 5:
                out.append(line)
                continue
            if len(parts) == 5:
                parts.append("-1")
            if parts[4].strip() in m:
                parts[4] = m[parts[4].strip()]
            out.append("\t".join(parts))
        return pa.Table.from_arrays([pa.array(out, pa.string())], names=["text"])

    return lines.map_batches(fix, batch_format="pyarrow")


def load_column_corpus(path: str) -> list[list[tuple]]:
    """ColumnCorpus IOB reader (the Flair eval harness input,
    reference ``Flair_prediction_evaluation.py:25``): whitespace-separated
    columns (token, gold[, pred...]), blank line = sentence boundary.
    Driver-side (an eval corpus is fixture-sized); returns a list of
    sentences, each a list of column tuples."""
    sentences: list[list[tuple]] = []
    cur: list[tuple] = []
    with open(path, encoding="utf8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                if cur:
                    sentences.append(cur)
                    cur = []
                continue
            cur.append(tuple(line.split()))
    if cur:
        sentences.append(cur)
    return sentences


def merge_bern2_annotations(bern_path: str, gold_text_path: str,
                            out_path: str) -> int:
    """Reference ``supplementary/experiment_scripts/
    preprocess_BERN2_into_evaluation_ready_format.ipynb``: BERN2 emits
    bare annotation blocks (blank-line separated, one block per doc, in
    gold-corpus order); re-attach each block to its gold PubTator doc's
    text lines so third-party-tool output becomes evaluation-ready
    PubTator (doc text lines, then the block's annotation lines verbatim,
    then a blank line). Driver-side — eval corpora are fixture-sized.
    Returns the number of docs written; raises if the block count and
    the gold doc count disagree (a silent zip would misalign every doc
    after the first gap)."""
    blocks: list[list[str]] = []
    cur: list[str] = []
    with open(bern_path, encoding="utf8") as f:
        for line in f:
            if line.strip():
                cur.append(line)
            else:
                blocks.append(cur)
                cur = []
    if cur:
        blocks.append(cur)

    docs: list[list[str]] = []
    cur = []
    with open(gold_text_path, encoding="utf8") as f:
        for line in f:
            if line.strip():
                cur.append(line)
            else:
                if cur:
                    docs.append(cur)
                cur = []
    if cur:
        docs.append(cur)

    if len(blocks) != len(docs):
        raise ValueError(
            f"BERN2 block count {len(blocks)} != gold doc count {len(docs)}")
    with open(out_path, "w", encoding="utf8") as f:
        for block, doc in zip(blocks, docs):
            for line in doc:
                f.write(line if line.endswith("\n") else line + "\n")
            for line in block:
                f.write(line if line.endswith("\n") else line + "\n")
            f.write("\n")
    return len(docs)


def strip_biored_relations(in_path: str, out_path: str) -> int:
    """Reference ``supplementary/experiment_scripts/
    remove_NEL_from_biored.ipynb``: BioRED PubTator carries relation /
    NEL lines after the mention annotations; strip them so the file
    becomes plain NER gold. Keep text lines (``^\\d+|[ta]|``-shaped),
    blank separators, and annotation lines whose SECOND whitespace token
    is a digit (a mention's start offset — relation lines carry a type
    string there). Returns the number of lines written."""
    import re

    pat = re.compile(r"^\d+\|[a-zA-Z]\|")
    n = 0
    with open(in_path, encoding="utf8") as f, \
            open(out_path, "w", encoding="utf8") as of:
        for line in f:
            if pat.match(line):
                of.write(line)
                n += 1
                continue
            parts = line.split()
            if not parts:          # blank separator
                of.write(line)
                n += 1
            elif len(parts) > 1 and parts[1].isdigit():
                of.write(line)
                n += 1
    return n


def read_jsonl(paths, **read_kwargs):
    """Line-delimited JSON source (the LLM-training interchange format) —
    Ray's native JSON datasource parses ``.jsonl`` / ``.jsonl.gz`` files
    in parallel tasks into Arrow blocks; this wrapper exists so every
    pipeline format has one named entry point next to the CSV / PubTator
    / free-text loaders."""
    import ray.data as rd

    return rd.read_json(paths, **read_kwargs)


def write_jsonl(ds, out_dir: str, **write_kwargs):
    """Line-delimited JSON sink: one ``.json`` file of newline-separated
    objects per block (Ray's native writer) — pair with
    ``ds.repartition`` or the export-shard assignment when downstream
    tooling expects a specific shard count."""
    ds.write_json(out_dir, **write_kwargs)
    return out_dir
