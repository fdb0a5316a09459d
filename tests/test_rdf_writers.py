import glob

from de_spark.sources.nt import triples_from_nt_text
from de_spark.sources.rdf_writers import render_nquads, render_turtle_lines, write_rdf
from de_spark.sources.turtle import parse_turtle
from tests.fixtures import BANANA_NT


def _read_lines(path):
    out = []
    for f in glob.glob(f"{path}/part-*"):
        out += open(f).read().splitlines()
    return out


def test_ntriples_roundtrip(spark, tmp_path):
    raw = triples_from_nt_text(spark, BANANA_NT, "file:///banana.hdt")
    out = str(tmp_path / "nt_out")
    write_rdf(raw, out, "nt")
    lines = _read_lines(out)
    # re-parse what we wrote: identical triple set
    back = triples_from_nt_text(spark, "\n".join(lines), "g")
    orig = {(r["s"], r["p"], r["o"]) for r in raw.collect()}
    got = {(r["s"], r["p"], r["o"]) for r in back.collect()}
    assert got == orig


def test_nquads_has_graph_term(spark):
    raw = triples_from_nt_text(spark, BANANA_NT, "file:///banana.hdt")
    line = render_nquads(raw).limit(1).collect()[0]["line"]
    assert line.endswith("<file:///banana.hdt> .")


def test_rdfxml_roundtrip(spark):
    """RDF/XML writer → RDF/XML parser recovers the exact triple set
    (S10 parity: the reference emits RdfXml via oxrdfio,
    src/query.rs:155-175)."""
    from de_spark.sources.rdf_writers import rdfxml_string
    from de_spark.sources.rdfxml import parse_rdfxml

    extra = (
        '<http://example.org/B> <http://example.org/note> "line1\\nline2 & <tag>" .\n'
        '<http://example.org/B> <http://example.org/label> "hola"@es .\n'
        "_:b0 <http://example.org/ref> _:b1 .\n"
    )
    raw = triples_from_nt_text(spark, BANANA_NT + extra, "g")
    doc = rdfxml_string(raw)
    orig = {(r["s"], r["p"], r["o"]) for r in raw.collect()}
    assert set(parse_rdfxml(doc)) == orig


def test_trig_lines_parse_back(spark):
    from de_spark.sources.rdf_writers import render_trig_lines
    from de_spark.sources.turtle import parse_trig

    raw = triples_from_nt_text(spark, BANANA_NT, "file:///banana.hdt")
    lines = [r["line"] for r in render_trig_lines(raw).collect()]
    assert all(line.startswith("<file:///banana.hdt> { ") for line in lines)
    triples, had_graphs = parse_trig("\n".join(lines))
    assert had_graphs is True  # '<g> { … }' label form is also demoted
    orig = {(r["s"], r["p"], r["o"]) for r in raw.collect()}
    assert set(triples) == orig


def test_turtle_grouping_parses_back(spark):
    raw = triples_from_nt_text(spark, BANANA_NT, "file:///banana.hdt")
    lines = [r["line"] for r in render_turtle_lines(raw).collect()]
    assert len(lines) == 2  # one statement per subject
    triples = parse_turtle("\n".join(lines))
    orig = {(r["s"], r["p"], r["o"]) for r in raw.collect()}
    assert set(triples) == orig


def test_rdfxml_streams_per_description(spark):
    """write_rdfxml must emit description-by-description (constant
    driver memory — VERDICT r4 item 5), never join the whole document
    into one string: the sink sees one write per description plus
    header/footer, and no single write carries more than one line."""
    from pyspark.sql import functions as F

    from de_spark.sources.rdf_writers import write_rdfxml

    n = 20_000  # ≫ any driver-side batch
    raw = spark.range(n).select(
        F.concat(F.lit("http://x/s"), F.col("id")).alias("s"),
        F.lit("http://x/p").alias("p"),
        F.concat(F.lit('"v'), F.col("id"), F.lit('"')).alias("o"),
    )

    class Sink:
        def __init__(self):
            self.writes = 0
            self.max_write = 0
            self.total = 0

        def write(self, s):
            self.writes += 1
            self.max_write = max(self.max_write, len(s))
            self.total += len(s)

    sink = Sink()
    count = write_rdfxml(raw, sink)
    assert count == n
    # one description per write (plus header/footer/newlines): a
    # whole-document join would show up as one giant write
    assert sink.writes >= n
    assert sink.max_write < 200
    assert sink.total > n * 40
