"""Round-5 SPARQL semantics: ADVICE r4 fixes (non-deterministic BIND
pushdown, unbound-lowest ordering, ENCODE_FOR_URI tilde) and numeric
result type promotion (XPath op:numeric — integer+integer→integer,
int/int division→decimal), plus boolean value equality.

Reference semantics: oxigraph spareval (src/sparql.rs:520) — SPARQL
1.1 §17.3 operator mapping, XPath numeric promotion, §15.1 ordering.
"""

import pytest

from de_spark.pipeline import build
from de_spark.query import sparql_select
from de_spark.sources.nt import triples_from_nt_text

XSD = "http://www.w3.org/2001/XMLSchema#"

NT = f"""\
<http://x/s1> <http://x/n> "2"^^<{XSD}integer> .
<http://x/s2> <http://x/n> "5"^^<{XSD}integer> .
<http://x/s3> <http://x/n> "7"^^<{XSD}integer> .
<http://x/s1> <http://x/d> "2.5"^^<{XSD}decimal> .
<http://x/s2> <http://x/d> "0.5"^^<{XSD}decimal> .
<http://x/s1> <http://x/x> "1.5"^^<{XSD}double> .
<http://x/s1> <http://x/f> "true"^^<{XSD}boolean> .
<http://x/s2> <http://x/f> "1"^^<{XSD}boolean> .
<http://x/s3> <http://x/f> "false"^^<{XSD}boolean> .
<http://x/s4> <http://x/f> "0"^^<{XSD}boolean> .
_:b1 <http://x/p> <http://x/o1> .
<http://x/s1> <http://x/p> <http://x/o2> .
"""

PX = "PREFIX x: <http://x/>\n"


@pytest.fixture(scope="module")
def kg(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r5_kg"))
    kg, _ = build(triples_from_nt_text(spark, NT, "file:///r5.nt"), out)
    return kg


def one(kg, q, col):
    rows = sparql_select(kg, PX + q).collect()
    assert len(rows) == 1
    return rows[0][col]


# ---------------------------------------------------------------------------
# ADVICE r4 fixes
# ---------------------------------------------------------------------------


def test_struuid_fresh_per_solution(kg):
    """BIND with STRUUID over a shared source term must produce a
    DISTINCT value per solution — the uid-space pushdown (one value
    per vocabulary term) must not capture non-deterministic builtins
    (ADVICE r4 medium)."""
    q = PX + "SELECT ?s ?u WHERE { ?s x:f ?v . BIND(CONCAT(STR(?v), STRUUID()) AS ?u) }"
    rows = sparql_select(kg, q).collect()
    assert len(rows) == 4
    assert len({r["u"] for r in rows}) == 4


def test_unbound_sorts_below_blank_nodes(kg):
    """SPARQL §15.1: unbound < blank < IRI < literal.  A row with ?x
    unbound must sort BEFORE a row binding ?x to a blank node under
    ASC (and after it under DESC) — ADVICE r4 low."""
    q = PX + """
    SELECT ?x WHERE {
      { ?s x:p ?o . FILTER(ISBLANK(?s)) . BIND(?s AS ?x) }
      UNION
      { ?s x:p ?o . FILTER(!ISBLANK(?s)) }
    } ORDER BY ?x
    """
    vals = [r["x"] for r in sparql_select(kg, q).collect()]
    assert vals[0] is None and vals[1].startswith("_")
    q_desc = q.replace("ORDER BY ?x", "ORDER BY DESC(?x)")
    vals = [r["x"] for r in sparql_select(kg, q_desc).collect()]
    assert vals[0].startswith("_") and vals[1] is None


def test_encode_for_uri_tilde(kg):
    """'~' is RFC 3986 unreserved: fn:encode-for-uri must not escape
    it (ADVICE r4 low); spaces still become %20, reserved chars still
    escape."""
    assert (
        one(kg, 'SELECT ?e WHERE { BIND(ENCODE_FOR_URI("~a b/c") AS ?e) }', "e")
        == '"~a%20b%2Fc"'
    )
