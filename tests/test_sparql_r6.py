"""Round-6 SPARQL semantics: EXACT integer arithmetic beyond 2^53
(VERDICT r5 item 1 — the decimal(38,0) lane) and the ADVICE r5
degradation rules (no scientific-notation lexicals, INF only for
float/double datatypes).

Reference semantics: oxigraph spareval does exact i64/decimal integer
operator dispatch (src/sparql.rs:520); SPARQL 1.1 §17.3 maps the
XPath arithmetic error to an unbound result.
"""

import pytest
from pyspark.sql import functions as F

from de_spark import terms
from de_spark.pipeline import build
from de_spark.query import sparql_select
from de_spark.sources.nt import triples_from_nt_text

XSD = "http://www.w3.org/2001/XMLSchema#"

# 2^53 = 9007199254740992: the first double-unrepresentable gap
NT = f"""\
<http://x/a> <http://x/n> "9007199254740992"^^<{XSD}integer> .
<http://x/b> <http://x/n> "9007199254740993"^^<{XSD}integer> .
<http://x/c> <http://x/n> "18014398509481984"^^<{XSD}integer> .
<http://x/a> <http://x/m> "3"^^<{XSD}integer> .
<http://x/bad> <http://x/q> "INF"^^<{XSD}integer> .
<http://x/inf> <http://x/q> "+INF"^^<{XSD}double> .
<http://x/ninf> <http://x/q> "-INF"^^<{XSD}float> .
"""

PX = "PREFIX x: <http://x/>\n"


@pytest.fixture(scope="module")
def kg(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r6_kg"))
    kg, _ = build(triples_from_nt_text(spark, NT, "file:///r6.nt"), out)
    return kg


def rows_of(kg, q):
    return sparql_select(kg, PX + q).collect()


# ---------------------------------------------------------------------------
# exact integer arithmetic (the decimal lane)
# ---------------------------------------------------------------------------


def test_bind_addition_exact_beyond_2p53(kg):
    """?n + 1 at 2^53: in doubles both 2^53 and 2^53+1 round to the
    same value; the exact lane must render distinct, correct lexicals."""
    rows = rows_of(
        kg,
        """
        SELECT ?s ?plus WHERE {
          ?s x:n ?n . BIND(?n + 1 AS ?plus)
        } ORDER BY ?s
        """,
    )
    got = {r["s"]: r["plus"] for r in rows}
    assert got["http://x/a"] == f'"9007199254740993"^^<{XSD}integer>'
    assert got["http://x/b"] == f'"9007199254740994"^^<{XSD}integer>'
    assert got["http://x/c"] == f'"18014398509481985"^^<{XSD}integer>'


def test_bind_multiplication_exact(kg):
    """Integer × integer beyond 2^53 renders exactly (try_multiply on
    the decimal lane)."""
    rows = rows_of(
        kg,
        """
        SELECT ?prod WHERE {
          <http://x/b> x:n ?n . BIND(?n * 3 AS ?prod)
        }
        """,
    )
    # 9007199254740993 * 3 = 27021597764222979 (double would give ...76 or ...80)
    assert rows[0]["prod"] == f'"27021597764222979"^^<{XSD}integer>'


def test_sum_exact_beyond_2p53(kg):
    """SUM over big integers is exact: 2^53 + (2^53+1) + 2^54 =
    36028797018963969 — the double lane cannot represent the odd unit."""
    rows = rows_of(
        kg,
        """
        SELECT (SUM(?n) AS ?total) WHERE { ?s x:n ?n }
        """,
    )
    assert rows[0]["total"] == f'"36028797018963969"^^<{XSD}integer>'


def test_filter_equality_exact(kg):
    """FILTER(?n = 9007199254740993) must NOT match 9007199254740992
    (they are equal as doubles)."""
    rows = rows_of(
        kg,
        """
        SELECT ?s WHERE { ?s x:n ?n . FILTER(?n = "9007199254740993"^^<http://www.w3.org/2001/XMLSchema#integer>) }
        """,
    )
    assert [r["s"] for r in rows] == ["http://x/b"]


def test_order_by_exact(kg):
    """ORDER BY distinguishes double-colliding big integers via the
    exact tiebreak lane."""
    rows = rows_of(kg, "SELECT ?s WHERE { ?s x:n ?n } ORDER BY ?n ?s")
    assert [r["s"] for r in rows] == ["http://x/a", "http://x/b", "http://x/c"]


def test_max_renders_exact_term(kg):
    rows = rows_of(kg, "SELECT (MAX(?n) AS ?mx) WHERE { ?s x:n ?n }")
    assert rows[0]["mx"] == f'"18014398509481984"^^<{XSD}integer>'


def test_beyond_i64_exact_via_decimal_lane(kg):
    """A data-borne integer × a near-i64-max constant exceeds long
    range but fits decimal(38,0): renders exactly (the reference's
    i64 lane would error here; xsd:integer is arbitrary-precision)."""
    rows = rows_of(
        kg,
        """
        SELECT ?big WHERE {
          <http://x/a> x:m ?m .
          BIND(9223372036854775807 * ?m AS ?big)
        }
        """,
    )
    assert rows[0]["big"] == f'"27670116110564327421"^^<{XSD}integer>'


def test_static_int_overflow_unbound(kg):
    """Static long + long overflow degrades to unbound (try_add),
    never an ANSI abort or a wrong wrapped value."""
    rows = rows_of(
        kg,
        """
        SELECT ?big WHERE {
          <http://x/a> x:m ?m .
          BIND(9223372036854775807 + 1 AS ?big)
        }
        """,
    )
    assert rows[0]["big"] is None


# ---------------------------------------------------------------------------
# degradation rules (ADVICE r5)
# ---------------------------------------------------------------------------


def test_decimal_overflow_renders_unbound(kg):
    """An integer-kinded product that leaves decimal(38,0) (>38 digits)
    is unbound — not a scientific-notation or precision-lost lexical."""
    rows = rows_of(
        kg,
        """
        SELECT ?huge WHERE {
          <http://x/c> x:n ?n .
          BIND(?n * ?n * ?n AS ?huge)
        }
        """,
    )
    # (1.8e16)^3 ≈ 5.8e48 > 38 digits
    assert rows[0]["huge"] is None


def test_big_decimal_division_unbound_not_scientific(kg):
    """int ÷ int yields xsd:decimal; a quotient ≥1e16 would render in
    scientific notation (invalid lexical) — must degrade to unbound."""
    rows = rows_of(
        kg,
        """
        SELECT ?q WHERE {
          <http://x/c> x:n ?n .
          BIND(?n / 1 AS ?q)
        }
        """,
    )
    assert rows[0]["q"] is None


def test_inf_only_for_float_double(kg):
    """"INF"^^xsd:integer is an invalid lexical → non-numeric (no
    value), while "+INF"^^xsd:double and "-INF"^^xsd:float are valid
    XSD 1.1 specials."""
    rows = rows_of(
        kg,
        """
        SELECT ?s WHERE { ?s x:q ?v . FILTER(ISNUMERIC(?v)) } ORDER BY ?s
        """,
    )
    assert [r["s"] for r in rows] == ["http://x/inf", "http://x/ninf"]


def test_plus_inf_numeric_value(spark):
    df = spark.createDataFrame(
        [(f'"+INF"^^<{XSD}double>',), (f'"INF"^^<{XSD}integer>',)], ["t"]
    )
    got = df.select(terms.numeric_value(F.col("t")).alias("v")).collect()
    assert got[0]["v"] == float("inf")
    assert got[1]["v"] is None
