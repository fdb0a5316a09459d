"""Integration: source corpus → extraction → KG build → BGP queries
(the full north_rule path, M0→M3)."""

import pytest
from pyspark.sql import functions as F

from de_spark.corpus import generate_corpus
from de_spark.extract import CODE, ENT, RDF_TYPE, extract_code_triples
from de_spark.pipeline import build
from de_spark.query.bgp import TriplePattern, compile_bgp


@pytest.fixture(scope="module")
def corpus_kg(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus_kg"))
    raw = extract_code_triples(generate_corpus(spark, 0.0005)).cache()
    kg, _ = build(raw, out)
    return kg, raw


def test_bgp_files_importing_mod0(spark, corpus_kg):
    kg, raw = corpus_kg
    sols = compile_bgp(
        kg,
        [
            TriplePattern("?f", CODE + "imports", ENT + "module/mod_0"),
            TriplePattern("?f", RDF_TYPE, CODE + "File"),
        ],
    )
    got = {r["f"] for r in kg.decode_vars(sols, ["f"]).collect()}
    expected = {
        r["s"]
        for r in raw.where(
            (F.col("p") == CODE + "imports") & (F.col("o") == ENT + "module/mod_0")
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_bgp_two_hop_call_chain(spark, corpus_kg):
    kg, raw = corpus_kg
    sols = compile_bgp(
        kg,
        [
            TriplePattern("?a", CODE + "calls", "?b"),
            TriplePattern("?b", CODE + "calls", "?c"),
        ],
    )
    n = sols.count()
    calls = [(r["s"], r["o"]) for r in raw.where(F.col("p") == CODE + "calls").collect()]
    outgoing = {}
    for s, o in calls:
        outgoing.setdefault(s, []).append(o)
    expected = sum(len(outgoing.get(o, [])) for _, o in calls)
    assert n == expected and n > 0


def test_triple_set_parity_pr(spark, corpus_kg):
    """Triple-set P/R vs the extraction output (the BASELINE.json
    P/R≥0.95 contract, here exact: encode→decode must lose nothing)."""
    from de_spark.encode import decode_triples

    kg, raw = corpus_kg
    reference = {(r["s"], r["p"], r["o"]) for r in raw.collect()}
    ours = {
        (r["s"], r["p"], r["o"])
        for r in decode_triples(kg.triples, kg.term_uids).collect()
    }
    tp = len(reference & ours)
    precision = tp / len(ours)
    recall = tp / len(reference)
    assert precision == 1.0 and recall == 1.0
