"""RDF/XML-subset → triples converter.

The reference routes ``.owl``/``.rdf``/``.xml`` inputs to oxrdfio's
RdfXml parser (src/rdf2nt.rs:51-65; the ``.owl`` special case at
:57-60) and re-serializes to N-Triples.  This implements the RDF/XML
subset ontologies actually ship with:

- ``rdf:RDF`` root (or a single node element as the document element);
- node elements: ``rdf:Description`` and typed nodes (element name →
  ``rdf:type`` triple), identified by ``rdf:about`` (absolute IRI),
  ``rdf:ID`` (resolved against ``xml:base`` / the supplied base) or
  ``rdf:nodeID`` (blank node); fresh blank node otherwise;
- property elements: ``rdf:resource`` / ``rdf:nodeID`` object
  references, nested node elements (recursive), and text literals with
  ``rdf:datatype`` or ``xml:lang``.

- ``rdf:parseType="Resource"`` (nested bnode whose property elements
  are the element's children), ``rdf:parseType="Collection"``
  (rdf:first/rdf:rest chain over the child node elements), and
  ``rdf:parseType="Literal"`` (inner XML serialized verbatim as an
  ``rdf:XMLLiteral`` — exact for already-canonical content);
- relative ``rdf:about``/``rdf:resource`` IRIs resolve against
  ``xml:base`` / the supplied base (RFC 3986).

Reification: ``rdf:ID`` on a property element names the statement and
adds the four ``rdf:Statement``/subject/predicate/object triples
(RDF/XML §7.3).  Parsing runs inside ``mapInPandas`` over whole-file rows
(one file = one row; many files parse in parallel across tasks — same
batching contract as the Turtle converter).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd

from de_spark import terms

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
RDF_TYPE = RDF_NS + "type"

_NT_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\t", "\\t"), ("\r", "\\r")]


def _escape_nt(s: str) -> str:
    for a, b in _NT_ESCAPES:
        s = s.replace(a, b)
    return s


def _tag_iri(tag: str) -> str:
    """ElementTree '{ns}local' → RDF/XML striped-syntax IRI ns+local."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def parse_rdfxml(text: str, base: str = "") -> list[tuple[str, str, str]]:
    """Parse an RDF/XML-subset document into HDT-convention triples."""
    root = ET.fromstring(text)
    base = root.get(f"{{{XML_NS}}}base", base)
    triples: list[tuple[str, str, str]] = []
    bnode_counter = [0]

    def abs_iri(iri: str) -> str:
        if _SCHEME_RE.match(iri) or not base:
            return iri
        from urllib.parse import urljoin

        return urljoin(base, iri)

    def fresh_bnode() -> str:
        bnode_counter[0] += 1
        return f"_:rx{bnode_counter[0]}"

    def subject_of(elem: ET.Element) -> str:
        about = elem.get(f"{{{RDF_NS}}}about")
        if about is not None:
            return abs_iri(about)
        rid = elem.get(f"{{{RDF_NS}}}ID")
        if rid is not None:
            return f"{base}#{rid}"
        nid = elem.get(f"{{{RDF_NS}}}nodeID")
        if nid is not None:
            return f"_:{nid}"
        return fresh_bnode()

    def walk_props(subj: str, elem: ET.Element) -> None:
        for prop in elem:
            p = _tag_iri(prop.tag)
            n_before = len(triples)
            _walk_prop(subj, p, prop)
            rid = prop.get(f"{{{RDF_NS}}}ID")
            if rid is not None:
                # reification (RDF/XML §7.3): rdf:ID on a property
                # element names the statement and adds the four
                # rdf:Statement triples for each emitted (subj, p, o)
                st = abs_iri(f"#{rid}") if base else f"#{rid}"
                for s2, p2, o2 in triples[n_before:]:
                    if s2 == subj and p2 == p:
                        triples.extend(
                            [
                                (st, RDF_TYPE, RDF_NS + "Statement"),
                                (st, RDF_NS + "subject", s2),
                                (st, RDF_NS + "predicate", p2),
                                (st, RDF_NS + "object", o2),
                            ]
                        )

    def _walk_prop(subj: str, p: str, prop: ET.Element) -> None:
        pt = prop.get(f"{{{RDF_NS}}}parseType")
        if pt == "Resource":
            # nested bnode whose property elements are the children
            # (oxrdfio behavior via src/rdf2nt.rs:67)
            b = fresh_bnode()
            triples.append((subj, p, b))
            walk_props(b, prop)
            return
        if pt == "Collection":
            items = [walk_node(child) for child in prop]
            node = RDF_NS + "nil" if not items else fresh_bnode()
            triples.append((subj, p, node))
            for j, item in enumerate(items):
                triples.append((node, RDF_NS + "first", item))
                nxt = RDF_NS + "nil" if j == len(items) - 1 else fresh_bnode()
                triples.append((node, RDF_NS + "rest", nxt))
                node = nxt
            return
        if pt == "Literal":
            # XML content becomes one rdf:XMLLiteral: leading text +
            # each child element serialized (child.tail rides along
            # in ElementTree's tostring).  oxrdfio emits the
            # exclusive-canonical form; this verbatim serialization
            # matches it for already-canonical content (the common
            # case in shipped ontologies) and is documented as such.
            parts = [prop.text or ""]
            for child in prop:
                parts.append(ET.tostring(child, encoding="unicode"))
            lit = '"' + _escape_nt("".join(parts)) + f'"^^<{RDF_NS}XMLLiteral>'
            triples.append((subj, p, lit))
            return
        if pt is not None:
            raise ValueError(
                f"rdf:parseType={pt!r} is outside the supported RDF/XML subset"
            )
        res = prop.get(f"{{{RDF_NS}}}resource")
        nid = prop.get(f"{{{RDF_NS}}}nodeID")
        dt = prop.get(f"{{{RDF_NS}}}datatype")
        lang = prop.get(f"{{{XML_NS}}}lang")
        children = list(prop)
        if res is not None:
            triples.append((subj, p, abs_iri(res)))
        elif nid is not None:
            triples.append((subj, p, f"_:{nid}"))
        elif children:
            for child in children:
                triples.append((subj, p, walk_node(child)))
        else:
            lit = '"' + _escape_nt(prop.text or "") + '"'
            if dt:
                lit += f"^^<{dt}>"
            elif lang:
                lit += f"@{lang}"
            triples.append((subj, p, lit))

    def walk_node(elem: ET.Element) -> str:
        subj = subject_of(elem)
        tag = _tag_iri(elem.tag)
        if tag != RDF_NS + "Description":
            triples.append((subj, RDF_TYPE, tag))
        walk_props(subj, elem)
        return subj

    if _tag_iri(root.tag) == RDF_NS + "RDF":
        for child in root:
            walk_node(child)
    else:
        walk_node(root)
    return triples


def rdfxml_files_to_triples(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (path, content, graph) rows → triples_raw rows."""
    for pdf in batches:
        out = []
        for path, content, graph in zip(pdf["path"], pdf["content"], pdf["graph"]):
            for s, p, o in parse_rdfxml(content, base=f"file:///{path.rsplit('/', 1)[-1]}"):
                out.append((s, p, o, terms.classify_py(o), graph))
        yield pd.DataFrame(out, columns=["s", "p", "o", "o_kind", "graph"])
