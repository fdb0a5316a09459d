"""Round-4 SPARQL semantics: value-based comparison/ordering, seeded
property-path closures, LeftJoin conditions, expression ORDER/GROUP
BY, nested EXISTS, DISTINCT aggregates, datetime builtins.

Reference semantics throughout: oxigraph spareval (src/sparql.rs:520)
— SPARQL 1.1 operator mapping (§17.3), ORDER BY (§15.1),
ArbitraryLengthPath per-node evaluation, LeftJoin with expression
(§18.5)."""

import pytest

import de_spark.query.bgp as bgp_mod
from de_spark.pipeline import build
from de_spark.query import sparql_select
from de_spark.query.update import parse_update
from de_spark.sources.nt import triples_from_nt_text

XSD = "http://www.w3.org/2001/XMLSchema#"

NT = f"""\
<http://x/s1> <http://x/val> "9"^^<{XSD}integer> .
<http://x/s2> <http://x/val> "10"^^<{XSD}integer> .
<http://x/s3> <http://x/val> "01"^^<{XSD}integer> .
<http://x/s4> <http://x/val> "2"^^<{XSD}integer> .
<http://x/s5> <http://x/val> "02"^^<{XSD}integer> .
<http://x/s1> <http://x/kind> <http://x/A> .
<http://x/s2> <http://x/kind> <http://x/A> .
<http://x/s3> <http://x/kind> <http://x/B> .
<http://x/s4> <http://x/kind> <http://x/B> .
<http://x/s5> <http://x/kind> <http://x/B> .
<http://x/s1> <http://x/when> "2024-03-05T10:20:30Z"^^<{XSD}dateTime> .
<http://x/s2> <http://x/when> "2023-12-31T23:59:58+02:00"^^<{XSD}dateTime> .
<http://x/e1> <http://x/next> <http://x/e2> .
<http://x/e2> <http://x/next> <http://x/e3> .
<http://x/e3> <http://x/next> <http://x/e4> .
<http://x/f1> <http://x/next> <http://x/f2> .
"""

PX = "PREFIX x: <http://x/>\n"


@pytest.fixture(scope="module")
def kg(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r4_kg"))
    kg, _ = build(triples_from_nt_text(spark, NT, "file:///r4.nt"), out)
    return kg


def locals_(df, col):
    return [r[col].rsplit("/", 1)[1] for r in df.collect()]


# ---------------------------------------------------------------------------
# value semantics (VERDICT r3 missing #1 / ADVICE #1)
# ---------------------------------------------------------------------------


def test_numeric_value_equality(kg):
    # "01"^^xsd:integer equals the VALUE 1, not the lexical form
    q = PX + f'SELECT ?s WHERE {{ ?s x:val ?v . FILTER(?v = "1"^^<{XSD}integer>) }}'
    assert locals_(sparql_select(kg, q), "s") == ["s3"]
    # > is numeric for numeric literals: 10 > 9 (lexicographically "10" < "9")
    q2 = PX + f'SELECT ?s WHERE {{ ?s x:val ?v . FILTER(?v > "9"^^<{XSD}integer>) }}'
    assert locals_(sparql_select(kg, q2), "s") == ["s2"]
    # var-var equality by value: "2" and "02" are the same integer
    q3 = PX + """
    SELECT ?a ?b WHERE {
      ?a x:val ?v1 . ?b x:val ?v2 . FILTER(?v1 = ?v2 && ?a < ?b)
    } ORDER BY ?a
    """
    rows = [(r["a"].rsplit("/", 1)[1], r["b"].rsplit("/", 1)[1])
            for r in sparql_select(kg, q3).collect()]
    assert rows == [("s4", "s5")]
    # equality of non-numeric terms stays raw-term identity
    q4 = PX + 'SELECT ?s WHERE { ?s x:kind ?k . FILTER(?k = x:A) } ORDER BY ?s'
    assert locals_(sparql_select(kg, q4), "s") == ["s1", "s2"]


def test_order_by_numeric_value(kg):
    # ORDER BY sorts numeric literals by VALUE: 1, 2, 2, 9, 10
    # (value ties break on the raw term string: "02" < "2")
    q = PX + "SELECT ?s ?v WHERE { ?s x:val ?v } ORDER BY ?v ?s"
    assert locals_(sparql_select(kg, q), "s") == ["s3", "s5", "s4", "s1", "s2"]
    q2 = PX + "SELECT ?s WHERE { ?s x:val ?v } ORDER BY DESC(?v) ?s LIMIT 2"
    assert locals_(sparql_select(kg, q2), "s") == ["s2", "s1"]


def test_isnumeric(kg):
    q = PX + """
    SELECT ?s WHERE { ?s x:val ?v . FILTER(ISNUMERIC(?v)) } ORDER BY ?s
    """
    assert len(sparql_select(kg, q).collect()) == 5
    q2 = PX + "SELECT ?s WHERE { ?s x:kind ?k . FILTER(ISNUMERIC(?k)) }"
    assert sparql_select(kg, q2).count() == 0


# ---------------------------------------------------------------------------
# expression ORDER BY / GROUP BY (VERDICT r3 item 4)
# ---------------------------------------------------------------------------


def test_order_by_aggregate(kg):
    q = PX + """
    SELECT ?k (COUNT(?s) AS ?n) WHERE { ?s x:kind ?k }
    GROUP BY ?k ORDER BY DESC(COUNT(?s)) ?k
    """
    rows = [(r["k"], r["n"]) for r in sparql_select(kg, q).collect()]
    assert rows == [("http://x/B", 3), ("http://x/A", 2)]


def test_order_by_expression(kg):
    # ORDER BY on a computed key (numeric expression over a literal)
    q = PX + "SELECT ?s WHERE { ?s x:val ?v } ORDER BY DESC(?v * 2 - ?v) ?s LIMIT 2"
    assert locals_(sparql_select(kg, q), "s") == ["s2", "s1"]
    # builtin-call key
    q2 = PX + "SELECT ?k WHERE { ?s x:kind ?k } GROUP BY ?k ORDER BY STR(?k)"
    assert locals_(sparql_select(kg, q2), "k") == ["A", "B"]


def test_group_by_expression(kg):
    q = PX + """
    SELECT ?kk (COUNT(?s) AS ?n) WHERE { ?s x:kind ?k }
    GROUP BY (STRAFTER(STR(?k), "http://x/") AS ?kk) ORDER BY ?kk
    """
    rows = [(r["kk"], r["n"]) for r in sparql_select(kg, q).collect()]
    assert rows == [('"A"', 2), ('"B"', 3)]


def test_select_expr_with_group_by(kg):
    # ADVICE r3: computed projections must survive the aggregate branch
    # (evaluated over the grouped result, aggregate aliases in scope)
    q = PX + """
    SELECT ?k (COUNT(?s) AS ?n) ((?n * 10) AS ?n10)
    WHERE { ?s x:kind ?k } GROUP BY ?k ORDER BY ?k
    """
    rows = [(r["k"], r["n"], r["n10"]) for r in sparql_select(kg, q).collect()]
    # COUNT is an integer, so ?n * 10 stays xsd:integer (XPath promotion)
    assert rows == [
        ("http://x/A", 2, f'"20"^^<{XSD}integer>'),
        ("http://x/B", 3, f'"30"^^<{XSD}integer>'),
    ]


# ---------------------------------------------------------------------------
# DISTINCT aggregates (ADVICE r3 #2)
# ---------------------------------------------------------------------------


def test_distinct_aggregates(kg):
    q = PX + """
    SELECT (SUM(?v) AS ?t) (SUM(DISTINCT ?v) AS ?td) (AVG(DISTINCT ?v) AS ?ad)
    WHERE { ?s x:val ?v }
    """
    r = sparql_select(kg, q).collect()[0]
    # SUM of integers → xsd:integer, AVG → xsd:decimal (XPath promotion)
    assert (r["t"], r["td"], r["ad"]) == (
        f'"24"^^<{XSD}integer>', f'"22"^^<{XSD}integer>', f'"5.5"^^<{XSD}decimal>'
    )
    q2 = PX + """
    SELECT (GROUP_CONCAT(DISTINCT ?k ; SEPARATOR=",") AS ?ks)
    WHERE { ?s x:kind ?k }
    """
    assert sparql_select(kg, q2).collect()[0]["ks"] == "http://x/A,http://x/B"


# ---------------------------------------------------------------------------
# nested EXISTS (VERDICT r3 item 5)
# ---------------------------------------------------------------------------


def test_exists_in_or(kg):
    q = PX + f"""
    SELECT ?s WHERE {{
      ?s x:val ?v .
      FILTER(?v > "9"^^<{XSD}integer> || EXISTS {{ ?s x:when ?w }})
    }} ORDER BY ?s
    """
    assert locals_(sparql_select(kg, q), "s") == ["s1", "s2"]
    # NOT EXISTS under IF, composed with an aggregate-free projection
    q2 = PX + """
    SELECT ?s WHERE {
      ?s x:val ?v .
      FILTER(IF(EXISTS { ?s x:when ?w }, false, true))
    } ORDER BY ?s
    """
    assert locals_(sparql_select(kg, q2), "s") == ["s3", "s4", "s5"]


# ---------------------------------------------------------------------------
# null-tolerant filters must not push to uid space (ADVICE r3 #3)
# ---------------------------------------------------------------------------


def test_coalesce_filter_keeps_unbound(kg):
    q = PX + """
    SELECT ?s WHERE {
      ?s x:val ?v .
      OPTIONAL { ?s x:when ?w }
      FILTER(COALESCE(STR(?w), "none") = "none")
    } ORDER BY ?s
    """
    assert locals_(sparql_select(kg, q), "s") == ["s3", "s4", "s5"]


# ---------------------------------------------------------------------------
# datetime builtins (VERDICT r3 item 8)
# ---------------------------------------------------------------------------


def test_datetime_builtins(kg):
    q = PX + """
    SELECT ?y ?mo ?d ?h ?mi ?sec ?tz WHERE {
      x:s1 x:when ?w .
      BIND(YEAR(?w) AS ?y) BIND(MONTH(?w) AS ?mo) BIND(DAY(?w) AS ?d)
      BIND(HOURS(?w) AS ?h) BIND(MINUTES(?w) AS ?mi) BIND(SECONDS(?w) AS ?sec)
      BIND(TZ(?w) AS ?tz)
    }
    """
    r = sparql_select(kg, q).collect()[0]
    vals = [r[c] for c in ("y", "mo", "d", "h", "mi", "sec")]
    assert vals == [
        f'"{v}"^^<{XSD}integer>' for v in (2024, 3, 5, 10, 20, 30)
    ]
    assert r["tz"] == '"Z"'
    # field values come from the literal's own lexical form, never
    # shifted into the session timezone
    q2 = PX + "SELECT ?h ?tz WHERE { x:s2 x:when ?w . BIND(HOURS(?w) AS ?h) BIND(TZ(?w) AS ?tz) }"
    r2 = sparql_select(kg, q2).collect()[0]
    assert r2["h"] == f'"23"^^<{XSD}integer>'
    assert r2["tz"] == '"+02:00"'
    # filter through a datetime accessor
    q3 = PX + "SELECT ?s WHERE { ?s x:when ?w . FILTER(YEAR(?w) = 2024) }"
    assert locals_(sparql_select(kg, q3), "s") == ["s1"]


def test_datetime_value_comparison_and_order(kg):
    """xsd:dateTime compares and orders by INSTANT: s2's
    2023-12-31T23:59:58+02:00 is 21:59:58Z — before s1's
    2024-03-05T10:20:30Z — even though its lexical form sorts after."""
    q = PX + f"""
    SELECT ?s WHERE {{
      ?s x:when ?w .
      FILTER(?w < "2024-01-01T00:00:00Z"^^<{XSD}dateTime>)
    }}
    """
    assert locals_(sparql_select(kg, q), "s") == ["s2"]
    q2 = PX + "SELECT ?s WHERE { ?s x:when ?w } ORDER BY ?w"
    assert locals_(sparql_select(kg, q2), "s") == ["s2", "s1"]
    q3 = PX + "SELECT ?s WHERE { ?s x:when ?w } ORDER BY DESC(?w) LIMIT 1"
    assert locals_(sparql_select(kg, q3), "s") == ["s1"]


# ---------------------------------------------------------------------------
# seeded property-path closures (VERDICT r3 "do this" #1)
# ---------------------------------------------------------------------------


def test_bound_path_seeded_no_global_closure(kg, monkeypatch):
    """A bound-endpoint +/* path must run the SEEDED semi-naive
    reachability, never the full-relation transitive closure."""

    def _boom(pairs):
        raise AssertionError("global closure invoked for a bound-endpoint path")

    monkeypatch.setattr(bgp_mod, "_transitive_closure", _boom)
    q = PX + "SELECT ?y WHERE { x:e1 x:next+ ?y } ORDER BY ?y"
    assert locals_(sparql_select(kg, q), "y") == ["e2", "e3", "e4"]
    q2 = PX + "SELECT ?x WHERE { ?x x:next+ x:e3 } ORDER BY ?x"
    assert locals_(sparql_select(kg, q2), "x") == ["e1", "e2"]
    q3 = PX + "SELECT ?y WHERE { x:e1 x:next* ?y } ORDER BY ?y"
    assert locals_(sparql_select(kg, q3), "y") == ["e1", "e2", "e3", "e4"]
    # a closure inside a seeded sequence stays seeded too
    q4 = PX + "SELECT ?y WHERE { x:e1 x:next/x:next+ ?y } ORDER BY ?y"
    assert locals_(sparql_select(kg, q4), "y") == ["e3", "e4"]
    # both endpoints bound
    q5 = PX + "ASK { x:e1 x:next+ x:e4 }"
    assert sparql_select(kg, q5).collect()[0]["bool"] is True


def test_var_var_closure_still_global(kg):
    q = PX + "SELECT ?x ?y WHERE { ?x x:next+ ?y }"
    assert sparql_select(kg, q).count() == 3 + 2 + 1 + 1  # e-chain pairs + f-edge


def test_closure_releases_caches(kg, spark):
    """Closure iterations must not leave persisted frames behind
    (VERDICT r3 item 6): after the query, the only storage added is
    the (ContextCleaner-managed) localCheckpoint of the result."""
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    q = PX + "SELECT ?x ?y WHERE { ?x x:next+ ?y }"
    assert sparql_select(kg, q).count() == 7
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1


# ---------------------------------------------------------------------------
# GRAPH ?var over property paths + subqueries in GRAPH (VERDICT r3
# missing #6)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fruit2_kg(spark, tmp_path_factory):
    from de_spark import terms
    from de_spark.sources.turtle import parse_turtle
    from tests.fixtures import BANANA_NT, PINEAPPLE_TTL

    out = str(tmp_path_factory.mktemp("fruit2_kg"))
    pine = spark.createDataFrame(
        [
            (s, p, o, terms.classify_py(o), "file:///pineapple.hdt")
            for s, p, o in parse_turtle(PINEAPPLE_TTL)
        ],
        ["s", "p", "o", "o_kind", "graph"],
    )
    raw = triples_from_nt_text(spark, BANANA_NT, "file:///banana.hdt").unionByName(pine)
    kg, _ = build(raw, out)
    return kg


def test_graph_var_over_property_path(fruit2_kg):
    """GRAPH ?g { <path> } threads the graph-name column through every
    path step: co-grows pairs stay WITHIN each named graph (the
    default-union evaluation would also produce the cross-graph
    Banana↔Pineapple pairs)."""
    q = """
    PREFIX ex: <http://example.org/>
    SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a ex:growsIn/^ex:growsIn ?b } } ORDER BY ?g
    """
    rows = [
        (r["g"], r["a"].rsplit("/", 1)[1], r["b"].rsplit("/", 1)[1])
        for r in sparql_select(fruit2_kg, q).collect()
    ]
    assert rows == [
        ("file:///banana.hdt", "Banana", "Banana"),
        ("file:///pineapple.hdt", "Pineapple", "Pineapple"),
    ]
    # default union graph: the same path DOES cross graphs (4 pairs)
    q_union = """
    PREFIX ex: <http://example.org/>
    SELECT ?a ?b WHERE { ?a ex:growsIn/^ex:growsIn ?b }
    """
    assert sparql_select(fruit2_kg, q_union).count() == 4
    # closure under GRAPH ?g: per-graph semi-naive iteration
    q_clo = """
    PREFIX ex: <http://example.org/>
    SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a (ex:growsIn/^ex:growsIn)+ ?b } } ORDER BY ?g
    """
    rows = [
        (r["g"], r["a"].rsplit("/", 1)[1], r["b"].rsplit("/", 1)[1])
        for r in sparql_select(fruit2_kg, q_clo).collect()
    ]
    assert rows == [
        ("file:///banana.hdt", "Banana", "Banana"),
        ("file:///pineapple.hdt", "Pineapple", "Pineapple"),
    ]


def test_subquery_inside_graph(fruit2_kg):
    q = """
    PREFIX ex: <http://example.org/>
    SELECT ?f WHERE {
      GRAPH <file:///banana.hdt> {
        { SELECT ?f WHERE { ?f ex:hasColor "yellow" } }
      }
    }
    """
    rows = [r["f"].rsplit("/", 1)[1] for r in sparql_select(fruit2_kg, q).collect()]
    assert rows == ["Banana"]  # Pineapple is yellow too, other graph


# ---------------------------------------------------------------------------
# INSERT DATA groundness (ADVICE r3 #4)
# ---------------------------------------------------------------------------


def test_insert_data_ground_terms():
    ops = parse_update(
        'INSERT DATA { GRAPH <http://g/n> { '
        '<http://x/a> <http://x/p> [ <http://x/q> "v" ] . } }'
    )
    pats = ops[0].quads["http://g/n"]
    # the [ … ] property list became a fresh blank node, not a
    # ?__bnpl placeholder variable
    assert {p.s for p in pats} == {"http://x/a", "_:genid1"}
    assert all(not t.startswith("?") for p in pats for t in (p.s, p.p, p.o))
    with pytest.raises(ValueError, match="ground"):
        parse_update(
            "INSERT DATA { GRAPH <http://g/n> { ?s <http://x/p> <http://x/o> } }"
        )


# ---------------------------------------------------------------------------
# decode pruning (emission-stage column pruning)
# ---------------------------------------------------------------------------


def test_decode_pruning(kg):
    """Only projected/used variables pay a term_uids decode join: a
    var that exists just to connect patterns stays a uid through the
    plan (at 100 TB each decode is a fact-sized join — this is column
    pruning for the emission stage)."""
    both = sparql_select(kg, PX + "SELECT ?s ?k WHERE { ?s x:kind ?k }")
    one = sparql_select(kg, PX + "SELECT ?s WHERE { ?s x:kind ?k }")
    plan_both = both._jdf.queryExecution().optimizedPlan().toString()
    plan_one = one._jdf.queryExecution().optimizedPlan().toString()
    assert plan_one.count("Join") < plan_both.count("Join")
    # results unchanged
    assert one.count() == 5
    assert sorted(r["s"].rsplit("/", 1)[1] for r in one.collect()) == [
        "s1", "s2", "s3", "s4", "s5"
    ]
    # ORDER BY / HAVING / aggregate references still force the decode
    agg = sparql_select(
        kg,
        PX + "SELECT ?k (COUNT(?s) AS ?n) WHERE { ?s x:kind ?k } GROUP BY ?k ORDER BY ?k",
    )
    assert [r["k"] for r in agg.collect()] == ["http://x/A", "http://x/B"]


# ---------------------------------------------------------------------------
# property test: value ordering model (engine sort == Python model)
# ---------------------------------------------------------------------------


def test_value_ordering_property(spark):
    """Seeded randomized check: the engine's term sort key (kind rank,
    numeric value, dateTime instant, raw string) orders mixed term
    populations exactly like the reference Python model."""
    import random

    from pyspark.sql import functions as F

    from de_spark.query.sparql import _term_sort_cols

    rng = random.Random(42)
    xsd = "http://www.w3.org/2001/XMLSchema#"
    terms_pop: list[str] = []
    for _ in range(120):
        pick = rng.randrange(5)
        if pick == 0:
            n = rng.randrange(-50, 500)
            lex = f"{'0' * rng.randrange(3)}{abs(n)}" if n >= 0 else str(n)
            dt = rng.choice(["integer", "decimal", "double"])
            terms_pop.append(f'"{lex}"^^<{xsd}{dt}>')
        elif pick == 1:
            terms_pop.append(f"http://x/{rng.randrange(100)}")
        elif pick == 2:
            terms_pop.append(f"_:b{rng.randrange(50)}")
        elif pick == 3:
            terms_pop.append('"' + rng.choice(["apple", "Zebra", "10kg", ""]) + '"')
        else:
            ts = f"20{rng.randrange(10, 30)}-0{rng.randrange(1, 9)}-1{rng.randrange(0, 9)}T0{rng.randrange(0, 9)}:00:00"
            terms_pop.append(f'"{ts}"^^<{xsd}dateTime>')

    def model_key(t: str):
        import re as _re
        from datetime import datetime

        rank = 2 if t.startswith('"') else (0 if t.startswith("_") else 1)
        num = None
        dtv = None
        m = _re.match(r'^"((?:[^"\\]|\\.)*)"\^\^<([^>]*)>$', t)
        if m:
            dt = m.group(2)
            if dt in (xsd + "integer", xsd + "decimal", xsd + "double"):
                num = float(m.group(1))
            elif dt == xsd + "dateTime":
                dtv = datetime.fromisoformat(m.group(1)).timestamp()
        # None sorts FIRST (Spark asc nulls-first): a null sort key
        # precedes every non-null one
        return (rank, num is not None, num or 0.0, dtv is not None, dtv or 0.0, t)

    df = spark.createDataFrame([(t,) for t in terms_pop], ["v"])
    got = [r["v"] for r in df.orderBy(*_term_sort_cols(F.col("v"))).collect()]
    want = sorted(terms_pop, key=model_key)
    assert got == want


def test_nested_optional_with_leftjoin_condition(kg):
    """A LeftJoin-condition OPTIONAL stacked after another OPTIONAL:
    left rows already carrying nulls must anti-join null-safely (each
    unmatched row re-enters exactly once, never duplicated)."""
    q = PX + f"""
    SELECT ?s ?w ?v2 WHERE {{
      ?s x:val ?v .
      OPTIONAL {{ ?s x:when ?w }}
      OPTIONAL {{ ?s x:val ?v2 . FILTER(BOUND(?w) && ?v2 > "5"^^<{XSD}integer>) }}
    }} ORDER BY ?s
    """
    rows = [
        (r["s"].rsplit("/", 1)[1], r["w"] is not None, r["v2"])
        for r in sparql_select(kg, q).collect()
    ]
    # s1 (9, has when) → v2 = "9"; s2 (10, has when) → v2 = "10";
    # s3/s4/s5 have no ?w → condition fails → null v2, row kept ONCE
    assert rows == [
        ("s1", True, f'"9"^^<{XSD}integer>'),
        ("s2", True, f'"10"^^<{XSD}integer>'),
        ("s3", False, None),
        ("s4", False, None),
        ("s5", False, None),
    ]
