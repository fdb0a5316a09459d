"""M0/M1: corpus determinism + extractor correctness (incl. the sha256
ingest invariant and hub-predicate skew presence)."""

import hashlib
import zlib

from pyspark.sql import functions as F

from de_spark.corpus import generate_corpus
from de_spark.extract import CODE, ENT, RDF_TYPE, extract_code_triples


def test_corpus_deterministic(spark):
    a = generate_corpus(spark, 0.0001).orderBy("path").collect()
    b = generate_corpus(spark, 0.0001, partitions=3).orderBy("path").collect()
    assert a == b  # partitioning must not change content
    assert len(a) == 100
    r = a[0]
    assert r["repo"].startswith("org") and "/" in r["repo"]
    assert len(r["commit"]) == 40
    assert r["lang"] in ("python", "rust")


def test_corpus_crc_mixing_matches_python(spark):
    """The generator's _mix is crc32 — replicable in plain Python, which
    pins the corpus byte-stable across engines."""
    row = generate_corpus(spark, 0.0001).where(F.col("path").like("%/file7.%")).collect()[0]
    org = zlib.crc32(b"1:7") % 7
    repo_n = zlib.crc32(b"2:7") % 23
    assert row["repo"] == f"org{org}/repo{repo_n}"
    lang = "python" if zlib.crc32(b"3:7") % 3 < 2 else "rust"
    assert row["lang"] == lang


def test_extract_triples(spark):
    corpus = generate_corpus(spark, 0.0001)
    triples = extract_code_triples(corpus)
    rows = triples.collect()
    n_files = 100

    by_p = {}
    for r in rows:
        by_p.setdefault(r["p"], []).append(r)

    # per-file fixed triples
    assert len(by_p[CODE + "sha256"]) == n_files
    assert len(by_p[CODE + "lang"]) == n_files
    assert len(by_p[CODE + "inRepo"]) == n_files
    # every file declares 6 imports (5 import + 1 from / 6 use lines)
    assert len(by_p[CODE + "imports"]) == 6 * n_files
    # 8 functions per file, each with one call edge
    assert len(by_p[CODE + "definedIn"]) == 8 * n_files
    assert len(by_p[CODE + "calls"]) == 8 * n_files
    # rdf:type is the hub predicate: repos + files + functions
    assert len(by_p[RDF_TYPE]) > 3 * n_files

    # graph naming: one named graph per repo
    graphs = {r["graph"] for r in rows}
    assert all(g.startswith("repo:///org") for g in graphs)


def test_sha256_invariant(spark):
    """content sha256 equality per row between input and extracted
    triple (BASELINE.json input_hint invariant)."""
    corpus = generate_corpus(spark, 0.0001).limit(5)
    expected = {
        ENT + f"file/{r['repo']}/{r['path']}": hashlib.sha256(
            r["content"].encode()
        ).hexdigest()
        for r in corpus.collect()
    }
    got = {
        r["s"]: r["o"].strip('"')
        for r in extract_code_triples(corpus).where(F.col("p") == CODE + "sha256").collect()
    }
    assert got == expected


def test_import_skew_present(spark):
    """Zipf-ish module picks → mod_0 must dominate (the skew the
    north_rule requires downstream joins to survive)."""
    corpus = generate_corpus(spark, 0.001)
    triples = extract_code_triples(corpus)
    counts = (
        triples.where(F.col("p") == CODE + "imports")
        .groupBy("o").count().orderBy(F.desc("count")).collect()
    )
    assert counts[0]["o"] == ENT + "module/mod_0"
    assert counts[0]["count"] > 3 * counts[len(counts) // 2]["count"]
