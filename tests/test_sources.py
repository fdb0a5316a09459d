from de_spark.sources.nt import triples_from_nt_text
from de_spark.sources.rdfxml import parse_rdfxml
from de_spark.sources.router import read_rdf
from de_spark.sources.turtle import parse_trig, parse_turtle
from tests.fixtures import (
    APPLE_RDFXML,
    APPLE_TTL,
    BANANA_NT,
    FRUIT_NQ,
    FRUIT_TRIG,
    PINEAPPLE_TTL,
)

XSD_BOOL = "http://www.w3.org/2001/XMLSchema#boolean"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_nt_parse(spark):
    df = triples_from_nt_text(spark, BANANA_NT, "file:///banana.hdt")
    rows = df.collect()
    assert len(rows) == 12
    by_p = {(r["s"], r["p"]): r for r in rows}
    r = by_p[("http://example.org/Banana", "http://example.org/isEdible")]
    assert r["o"] == f'"true"^^<{XSD_BOOL}>'
    assert r["o_kind"] == "literal"
    r = by_p[("http://example.org/Banana", RDF_TYPE)]
    assert r["o"] == "http://example.org/Fruit" and r["o_kind"] == "iri"
    assert all(r["graph"] == "file:///banana.hdt" for r in rows)


def test_turtle_parse_apple():
    triples = parse_turtle(APPLE_TTL)
    assert len(triples) == 9
    tset = set(triples)
    assert ("http://example.org/Apple", RDF_TYPE, "http://example.org/Fruit") in tset
    assert (
        "http://example.org/Apple",
        "http://example.org/isOrganic",
        f'"true"^^<{XSD_BOOL}>',
    ) in tset
    assert (
        "http://example.org/Fruit",
        "http://www.w3.org/2000/01/rdf-schema#label",
        '"Fruit"',
    ) in tset


def test_turtle_matches_nt_banana():
    """pineapple.ttl exercises the ';' list style; cross-check NT shape."""
    triples = parse_turtle(PINEAPPLE_TTL)
    assert len(triples) == 12
    subjects = {s for s, _, _ in triples}
    assert subjects == {"http://example.org/Pineapple", "http://example.org/Fruit"}


def test_rdfxml_matches_turtle_apple():
    """The RDF/XML rendering of apple.ttl parses to the SAME triple set
    (reference routes .owl/.rdf through the RdfXml parser,
    src/rdf2nt.rs:51-65)."""
    assert set(parse_rdfxml(APPLE_RDFXML)) == set(parse_turtle(APPLE_TTL))


def test_trig_demotes_named_graphs():
    triples, had_graphs = parse_trig(FRUIT_TRIG)
    assert had_graphs
    assert set(triples) == {
        ("http://example.org/Apple", "http://example.org/hasColor", '"Red"'),
        ("http://example.org/Banana", "http://example.org/hasColor", '"yellow"'),
        ("http://example.org/Banana", RDF_TYPE, "http://example.org/Fruit"),
        ("http://example.org/Cherry", "http://example.org/hasColor", '"red"'),
    }
    # plain Turtle still reports no graphs
    assert parse_trig(APPLE_TTL)[1] is False


def test_router_all_formats(spark, tmp_path):
    """One graph from .nt + .ttl + .rdf + .owl + .trig + .nq inputs;
    quad-capable formats surface the demotion warning; unknown
    extensions land in the unhandled list (src/rdf2nt.rs:60-64)."""
    files = {
        "banana.nt": BANANA_NT,
        "apple.ttl": APPLE_TTL,
        "apple2.rdf": APPLE_RDFXML,
        "apple3.owl": APPLE_RDFXML,
        "fruit.trig": FRUIT_TRIG,
        "fruit.nq": FRUIT_NQ,
        "notes.txt": "not rdf",
    }
    paths = []
    for name, content in files.items():
        p = tmp_path / name
        p.write_text(content)
        paths.append(str(p))
    df, unhandled, warnings = read_rdf(spark, paths, single_graph="g")
    assert unhandled == [str(tmp_path / "notes.txt")]
    assert sorted(w.split(":")[0].rsplit("/", 1)[-1] for w in warnings) == [
        "fruit.nq",
        "fruit.trig",
    ]
    got = {(r["s"], r["p"], r["o"]) for r in df.collect()}
    expect = (
        {(s, p, o) for s, p, o in parse_turtle(APPLE_TTL)}
        | {(s, p, o) for s, p, o in parse_trig(FRUIT_TRIG)[0]}
        | {(r["s"], r["p"], r["o"]) for r in triples_from_nt_text(spark, BANANA_NT, "g").collect()}
        | {
            ("http://example.org/A", "http://example.org/p", '"x"'),
            ("http://example.org/A", "http://example.org/p", "http://example.org/B"),
        }
    )
    assert got == expect
    assert df.select("graph").distinct().collect()[0]["graph"] == "g"
