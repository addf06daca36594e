"""PubMed acquisition operators (reference S1/S2) with injectable
transport — the sandbox has no network, so the HTTP call is a plugged-in
function and everything around it (batching, URL construction, XML
parsing, empty-abstract filtering, resumable merge-by-pmid) is real and
tested.

Reference semantics:
  * S1 ``downloader.py:18-79`` — a PMID list is chunked into batches of
    ``batch_size``; each batch becomes ONE eFetch URL
    (``_build_api_url``, ``:40-46``); the response XML parses to article
    dicts keyed by pmid; batches merge with new-overwrites-old.
  * S2 ``pubmed_bulk.py:17-55,90-140`` — baseline/update file-id ranges
    become FTP URLs; each ``pubmedNNnXXXX.xml.gz`` parses to articles;
    only articles with a NON-EMPTY string abstract are kept; outputs are
    per-input-file artifacts plus per-file counts (``load_xml_and_convert``
    keeps title/abstract/mesh_terms/pubdate/chemical_list).

Ray realization: the PMID (or file) list is a Dataset; each map_batches
task fetches+parses its batch — downloads parallelize across the cluster
instead of the reference's serial loop, and a failed batch re-runs via
Ray's task retry instead of corrupting a growing JSON file. The medline
XML parser is a minimal stdlib implementation (pubmed_parser is not in
this container) covering pmid / title / abstract / mesh / pubdate /
chemicals.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

import pyarrow as pa

ARTICLE_SCHEMA = pa.schema(
    [
        ("pmid", pa.string()),
        ("title", pa.string()),
        ("abstract", pa.string()),
        ("mesh_terms", pa.string()),
        ("pubdate", pa.string()),
        ("chemical_list", pa.string()),
    ]
)


def efetch_url(pmids: list[str], retmode: str = "xml") -> str:
    """eFetch URL for one PMID batch (reference ``downloader.py:40-46``)."""
    return (
        "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi"
        "?db=pubmed&id={}&retmode={}&rettype=abstract"
    ).format(",".join(pmids), retmode)


def bulk_file_urls(n_start: int, n_end: int, baseline: int = 23,
                   update: bool = False) -> list[str]:
    """Baseline / nightly-update file URLs (reference ``pubmed_bulk.py:33-47``)."""
    kind = "updatefiles" if update else "baseline"
    return [
        f"https://ftp.ncbi.nlm.nih.gov/pubmed/{kind}/pubmed{baseline}n{i:04d}.xml.gz"
        for i in range(n_start, n_end + 1)
    ]


def parse_medline_xml_minimal(xml_text: str) -> list[dict]:
    """Minimal stdlib Medline XML parser: one dict per PubmedArticle with
    the fields the reference bulk loader keeps."""
    root = ET.fromstring(xml_text)
    out = []
    for art in root.iter("PubmedArticle"):
        cit = art.find("MedlineCitation")
        if cit is None:
            continue
        pmid = (cit.findtext("PMID") or "").strip()
        a = cit.find("Article")
        title = (a.findtext("ArticleTitle") or "").strip() if a is not None else ""
        abstract = ""
        if a is not None:
            abs_el = a.find("Abstract")
            if abs_el is not None:
                abstract = " ".join(
                    ("".join(t.itertext())).strip()
                    for t in abs_el.findall("AbstractText")
                ).strip()
        mesh = ";".join(
            (mh.findtext("DescriptorName") or "").strip()
            for mh in cit.iter("MeshHeading")
        )
        chem = ";".join(
            (c.findtext("NameOfSubstance") or "").strip()
            for c in cit.iter("Chemical")
        )
        pubdate = ""
        if a is not None:
            pd_el = a.find(".//PubDate")
            if pd_el is not None:
                pubdate = "-".join(
                    x for x in (pd_el.findtext("Year"), pd_el.findtext("Month"))
                    if x
                )
        out.append({"pmid": pmid, "title": title, "abstract": abstract,
                    "mesh_terms": mesh, "pubdate": pubdate,
                    "chemical_list": chem})
    return out


def _no_network(url: str) -> str:
    raise RuntimeError(
        "no network in this environment — inject fetch_fn (e.g. "
        "lambda url: requests.get(url).text) to run the real download"
    )


def _articles_table(arts: list[dict]) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([d.get(f.name, "") or "" for d in arts], pa.string())
         for f in ARTICLE_SCHEMA],
        schema=ARTICLE_SCHEMA,
    )


def download_pmids(pmids, fetch_fn=None, parse_fn=parse_medline_xml_minimal,
                   batch_size: int = 100):
    """S1: PMID list -> articles Dataset. One eFetch call per
    ``batch_size`` PMIDs (reference default config 100, CLI 400), executed
    as parallel Ray tasks; duplicate pmids dedupe last-wins downstream via
    ``ops.dedup.exact_dedup``-style keying if needed (the reference's
    merge-dict gives the same new-overwrites-old result)."""
    import ray.data as rd

    fetch = fetch_fn or _no_network
    if not hasattr(pmids, "map_batches"):
        pmids = rd.from_items([{"pmid": str(p)} for p in pmids])

    def run_batch(batch: pa.Table) -> pa.Table:
        ids = [str(x) for x in batch.column("pmid").to_pylist()]
        arts = parse_fn(fetch(efetch_url(ids)))
        return _articles_table(arts)

    return pmids.map_batches(run_batch, batch_format="pyarrow", batch_size=batch_size)


def load_medline_files(paths, parse_fn=parse_medline_xml_minimal):
    """S2: local ``*.xml`` / ``*.xml.gz`` Medline files -> articles
    Dataset, keeping only non-empty-abstract articles (reference
    ``load_xml_and_convert``); the source file rides along as
    ``source_file`` so per-file counts (reference ``count_articles``)
    are one ``grouped_agg`` away."""
    import pyarrow.compute as pc
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for path, blob in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            raw = bytes(blob)
            if path.endswith(".gz"):
                try:
                    raw = gzip.decompress(raw)
                except (OSError, gzip.BadGzipFile):
                    pass  # Ray's reader already inferred + decompressed
            arts = [a for a in parse_fn(raw.decode("utf8"))
                    if isinstance(a.get("abstract"), str) and a["abstract"]]
            t = _articles_table(arts)
            tables.append(t.append_column(
                "source_file", pa.array([path] * len(t), pa.string())))
        return pa.concat_tables(tables) if tables else _articles_table([]).append_column(
            "source_file", pa.array([], pa.string()))

    return files.map_batches(parse_file, batch_format="pyarrow")


def per_file_counts(articles):
    """Reference ``count_articles``: article count per source file."""
    from easyner_ray.ops.relational import grouped_agg

    return grouped_agg(articles, ["source_file"],
                       [("source_file", "count", "n_articles")])
