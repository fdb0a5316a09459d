"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "kg_build": {...},
   "query_walls": {name: [sec, ...]}, "by_sf": {sf: {...}}}

The headline number for the north_rule is kg_build: the end-to-end
extract → term-uid → dictionary → encode → materialize pipeline over
the synthetic source-code corpus at the matching SF, reported as
triples/sec.  Relational/ops queries run over the driver testdata.

Per-query timing is MIN-OF-N (default 3, $SPARK_GRAFT_BENCH_REPS):
the host shows CPU-steal spikes up to 2.5×, so a single wall cannot
distinguish a plan regression from steal (VERDICT r4 item 2); all
walls are reported alongside the min.  The suite also runs at a
second scale point (sf0.01) so per-query scaling slope is visible
round-over-round, not just absolute wall (fixed job overhead
dominates small queries at one SF and hides plan changes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from de_spark.corpus import generate_corpus
from de_spark.extract import extract_code_triples
from de_spark.pipeline import build
from de_spark.session import get_spark


def bench_kg_build(spark, sf: float) -> dict:
    """End-to-end KG construction throughput on the synthetic corpus,
    plus BGP query latency against the freshly built KG."""
    from de_spark.extract import CODE, ENT, RDF_TYPE
    from de_spark.query.bgp import TriplePattern, compile_bgp

    out_dir = tempfile.mkdtemp(
        prefix="de_bench_kg_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        t0 = time.monotonic()
        corpus = generate_corpus(spark, sf)
        raw = extract_code_triples(corpus)
        kg, stages = build(raw, out_dir)
        # the triples stage manifest already carries the exact row count
        # (observe() during the write) — no extra count action
        n_triples = next(s.rows for s in stages if s.name == "triples")
        wall = time.monotonic() - t0

        # 2-pattern BGP on the hub predicate (imports mod_0 ∧ type File)
        t1 = time.monotonic()
        q_hub = compile_bgp(
            kg,
            [
                TriplePattern("?f", CODE + "imports", ENT + "module/mod_0"),
                TriplePattern("?f", RDF_TYPE, CODE + "File"),
            ],
        )
        hub_rows = q_hub.count()
        bgp_hub_sec = round(time.monotonic() - t1, 3)

        # 2-hop call chain (self-join on the calls edge)
        t2 = time.monotonic()
        q_chain = compile_bgp(
            kg,
            [
                TriplePattern("?a", CODE + "calls", "?b"),
                TriplePattern("?b", CODE + "calls", "?c"),
            ],
        )
        chain_rows = q_chain.count()
        bgp_chain_sec = round(time.monotonic() - t2, 3)

        return {
            "sf": sf,
            "triples": n_triples,
            "wall_sec": round(wall, 3),
            "triples_per_sec": round(n_triples / wall, 1),
            "stages": {s.name: s.wall_ms for s in stages},
            "bgp_hub_sec": bgp_hub_sec,
            "bgp_hub_rows": hub_rows,
            "bgp_2hop_sec": bgp_chain_sec,
            "bgp_2hop_rows": chain_rows,
        }
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


QUERY_NAMES = [
    "kg_bgp_mentions",
    "kg_path_comention",
    "kg_path_reach",
    "kg_sparql_not_exists",
    "kg_sparql_arith_types",
    "kg_mentions_degree",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top10_orders",
    "cust_order_counts_left",
    "events_latest_per_user",
    "text_analyze",
    "text_chunk_docs",
    "text_scrub_pii",
    "sample_mix_by_lang",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
]


def _gc_ms(spark) -> int:
    """Cumulative JVM GC time (ms) — local mode: driver == executors."""
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _bench_suite(spark, qs, sf_dir: str, reps: int) -> tuple[dict, dict, dict]:
    """Run every suite query ``reps`` times against ``sf_dir``;
    returns ({name: min_sec}, {name: [walls...]}, {name: [diag...]}).
    Caches persisted by an operator (MinHash signatures, via
    ``handles``) are released after each rep so the suite leaves no
    storage behind; per-rep diagnostics record the persistent-RDD
    count and GC-time delta so wall drift gets a NAMED cause instead
    of a shrug (VERDICT r5 item 2 — suite-cumulative storage pressure
    was the suspected driver of the not_exists/path_reach drift)."""
    from de_spark.ops import dedup as _dedup

    mins: dict[str, float] = {}
    walls: dict[str, list[float]] = {}
    diags: dict[str, list[dict]] = {}
    for name in QUERY_NAMES:
        ws: list[float] = []
        ds: list[dict] = []
        for _ in range(reps):
            handles: list = []
            gc0 = _gc_ms(spark)
            t0 = time.monotonic()
            if name == "dedup_minhash_lsh":
                # the contract entry runs minhash in portable-md5 mode
                # so DuckDB can verify it value-exactly; the bench
                # times the PRODUCTION xxhash64 path (same plan,
                # codegen'd hash)
                df = _dedup.minhash_lsh_pairs(
                    spark.read.parquet(f"{sf_dir}/documents.parquet"),
                    threshold=0.5,
                    handles=handles,
                )
            else:
                df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ws.append(round(time.monotonic() - t0, 3))
            for h in handles:
                h.unpersist()
            ds.append(
                {"rdds": _n_persistent(spark), "gc_ms": _gc_ms(spark) - gc0}
            )
        mins[name] = min(ws)
        walls[name] = ws
        diags[name] = ds
    return mins, walls, diags


def _release_suite_caches(spark) -> dict:
    """Drop every suite-held cache (documents KG per sf_dir + operator
    caches) between scale points; returns what was released."""
    from de_spark.docs_kg import release_documents_kg
    from de_spark.ops import release_operator_caches

    released = {
        "kg_frames": release_documents_kg(),
        "operator_caches": release_operator_caches(),
    }
    released["rdds_after"] = _n_persistent(spark)
    return released


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("de_bench", cpus=cpus, shuffle_partitions=cpus)

    total0 = time.monotonic()

    # KG construction headline, min-of-N like the queries (the host's
    # steal spikes hit a 40 s build too: same-code builds measured
    # 34.8 s and 40.6 s within one hour); all walls reported
    build_reps = int(os.environ.get("SPARK_GRAFT_BENCH_BUILD_REPS", "2"))
    build_runs = [bench_kg_build(spark, sf) for _ in range(build_reps)]
    kg_build = min(build_runs, key=lambda b: b["wall_sec"])
    kg_build["walls"] = [b["wall_sec"] for b in build_runs]

    qs = entrymod.queries()
    by_sf: dict[str, dict] = {}
    primary_mins, primary_walls, primary_diags = _bench_suite(spark, qs, sf_dir, reps)
    by_sf[str(sf)] = {
        "queries": primary_mins,
        "walls": primary_walls,
        "diag": primary_diags,
        "released": _release_suite_caches(spark),
    }

    # second scale point: per-query scaling slope, not just one wall
    alt_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if os.path.isdir(alt_dir) and os.path.abspath(alt_dir) != os.path.abspath(
        sf_dir.rstrip("/")
    ):
        alt_mins, alt_walls, alt_diags = _bench_suite(spark, qs, alt_dir, reps)
        by_sf["0.01"] = {
            "queries": alt_mins,
            "walls": alt_walls,
            "diag": alt_diags,
            "released": _release_suite_caches(spark),
        }

    total = round(time.monotonic() - total0, 3)
    queries = {"kg_build": kg_build["wall_sec"], **primary_mins}
    print(
        json.dumps(
            {
                "metric": "kg-construct+query suite wall time (headline: kg_build triples/sec)",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "query_walls": primary_walls,
                "by_sf": by_sf,
                "reps": reps,
                "sf": sf,
                "cpus": cpus,
                "kg_build": kg_build,
            }
        )
    )


if __name__ == "__main__":
    main()
