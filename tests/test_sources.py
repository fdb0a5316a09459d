from de_spark.sources.nt import triples_from_nt_text
from de_spark.sources.turtle import parse_turtle
from tests.fixtures import APPLE_TTL, BANANA_NT, PINEAPPLE_TTL

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
