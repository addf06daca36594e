"""RDF N-Triples materialization of the knowledge graph — the standard
interchange format a downstream triple store (Jena/Virtuoso/oxigraph)
bulk-loads, produced as a streaming Ray Data transform over the nodes and
edges tables (north rule: "graph materialize"; the reference stops at its
JSON/TSV artifacts — `analysis.py` — so the export surface is
engine-added).

Line grammar (W3C N-Triples, one statement per line):

* node label   ``<urn:kg:n:ID> <rdfs:label> "norm" .``
* node type    ``<urn:kg:n:ID> <rdf:type> <urn:kg:c:CLS> .``
* edge         ``<urn:kg:n:SUBJ> <urn:kg:p:PRED> <urn:kg:n:OBJ> .``
* edge weight  ``<urn:kg:s:SUBJ-OBJ> <urn:kg:p:weight> "W"^^xsd:integer .``
  (classic statement reification keyed on the deterministic pair id, so
  evidence counts survive a format that has no edge attributes)

Everything is a vectorized Arrow kernel (``pc.binary_join_element_wise``
per batch, no Python per row); literal text escapes ``\\`` then ``"``
per the N-Triples spec, and class tokens sanitize spaces to ``_`` before
entering an IRI. The stream is embarrassingly parallel — no shuffle, no
state — so it scales as a pure map over however many blocks the nodes
and edges tables arrive in.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

RDFS_LABEL = "<http://www.w3.org/2000/01/rdf-schema#label>"
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
XSD_INT = "^^<http://www.w3.org/2001/XMLSchema#integer>"


def _esc_literal(col: pa.ChunkedArray | pa.Array):
    """N-Triples string-literal escaping: backslash first, then quote."""
    col = pc.replace_substring(col, pattern="\\", replacement="\\\\")
    return pc.replace_substring(col, pattern='"', replacement='\\"')


def _iri_token(col):
    """Sanitize a class token for IRI use (spaces -> underscores; node
    ids are hex and never need this)."""
    return pc.replace_substring(col, pattern=" ", replacement="_")


def _join(*parts) -> pa.Array:
    return pc.binary_join_element_wise(*parts, "")


def _node_lines(t: pa.Table) -> pa.Table:
    nid = t.column("node_id")
    label = _join("<urn:kg:n:", nid, "> " + RDFS_LABEL + ' "',
                  _esc_literal(t.column("norm")), '" .')
    typ = _join("<urn:kg:n:", nid, "> " + RDF_TYPE + " <urn:kg:c:",
                _iri_token(t.column("cls")), "> .")
    return pa.table({"line": pa.concat_arrays(
        [label.combine_chunks() if isinstance(label, pa.ChunkedArray) else label,
         typ.combine_chunks() if isinstance(typ, pa.ChunkedArray) else typ])})


def _edge_lines(t: pa.Table) -> pa.Table:
    s, o = t.column("subj_id"), t.column("obj_id")
    edge = _join("<urn:kg:n:", s, "> <urn:kg:p:",
                 _iri_token(t.column("pred")), "> <urn:kg:n:", o, "> .")
    w = _join("<urn:kg:s:", s, "-", o, '> <urn:kg:p:weight> "',
              pc.cast(t.column("weight"), pa.string()), '"' + XSD_INT + " .")
    return pa.table({"line": pa.concat_arrays(
        [edge.combine_chunks() if isinstance(edge, pa.ChunkedArray) else edge,
         w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w])})


def ntriples_lines(nodes, edges):
    """(nodes, edges) Datasets -> Dataset of one ``line`` column holding
    every N-Triples statement (2 per node, 2 per edge). Pure map — order
    is not semantic in N-Triples; sort before writing if a canonical
    file layout is wanted."""
    return (nodes.select_columns(["node_id", "norm", "cls"])
            .map_batches(_node_lines, batch_format="pyarrow")
            .union(edges.select_columns(
                ["subj_id", "pred", "obj_id", "weight"])
                .map_batches(_edge_lines, batch_format="pyarrow")))


def write_ntriples(nodes, edges, out_dir: str) -> None:
    """Materialize the export as sharded ``part-*.nt`` files (one per
    block, written distributedly — the bulk-load layout; cat them or
    point the loader at the directory)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table, ctx=None) -> pa.Table:
        import uuid

        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt")
        txt = "\n".join(t.column("line").to_pylist())
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(txt + ("\n" if txt else ""))
        return pa.table({"rows": pa.array([len(t)], pa.int64())})

    ntriples_lines(nodes, edges).map_batches(
        dump, batch_format="pyarrow").materialize()
