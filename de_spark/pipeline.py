"""Checkpointed end-to-end build: the ``de create`` equivalent.

Stages (each a checkpoint, per north_rule resumability):

  1. extract      — source rows → triples_raw strings
  2. term_uids    — global term→uid assignment
  3. dict         — four-section per-graph dictionary
  4. triples      — uid-encoded, SPO-sorted, graph-partitioned
  5. stats        — VOID header stats

Each stage writes parquet plus a ``_manifest.json`` with row count,
wall-clock, schema and an order-insensitive content fingerprint
(sum of per-row crc32 over the canonical JSON of the row — cheap,
distributed, deterministic).  A killed job resumes by skipping stages
whose manifest already exists (``build(..., resume=True)``).

Iceberg note: the target deployment materializes these as partitioned
Iceberg tables (snapshot semantics = the reference's immutable HDT +
whole-graph add/drop, src/sparql.rs:126-221).  This container has no
Iceberg runtime, so the catalog layer is parquet + manifest files with
the same layout and the writes are plain ``write.parquet`` — swap
``write.parquet(path)`` for ``writeTo(table)`` on a real cluster.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_spark.dictionary import build_dictionary, build_term_uids, position_flags
from de_spark.encode import encode_triples, sort_spo
from de_spark.graph import KnowledgeGraph
from de_spark.stats import void_stats_encoded


def _lineage_exprs(df: DataFrame):
    """count + order-insensitive checksum as observe() metrics.

    Checksum = XOR of xxhash64 over all columns — cheap, JVM-side,
    deterministic regardless of row order/partitioning, and cannot
    overflow (sum would under ANSI mode).  Paired with the row count it
    detects any content change except exact duplicate-row multiplicity
    swaps.  Computed via the observation API DURING the write job —
    no second pass, no extra action (each extra action costs serial
    driver planning/codegen time that caps scaling efficiency)."""
    chk_expr = F.expr(
        "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in df.columns) + "))"
    ).alias("chk")
    return [F.count(F.lit(1)).alias("n"), chk_expr]


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    checksum: int
    wall_ms: int
    skipped: bool


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_manifest.json")


def _write_stage(
    df: DataFrame,
    stage_dir: str,
    name: str,
    resume: bool,
    partition_by: list[str] | None = None,
    sort: bool = False,
) -> StageResult:
    if resume and os.path.exists(_manifest_path(stage_dir)):
        with open(_manifest_path(stage_dir)) as f:
            m = json.load(f)
        return StageResult(name, stage_dir, m["rows"], m["checksum"], m["wall_ms"], True)

    from pyspark.sql import Observation

    t0 = time.monotonic()
    cached = None
    if sort:
        # sort_spo range-shuffles: cache the input so the boundary
        # sampling pass doesn't re-run the encode joins
        cached = df.persist()
        out = sort_spo(cached)
    else:
        out = df
    obs = Observation(f"lineage_{name}")
    out = out.observe(obs, *_lineage_exprs(out))
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage_dir)
    if cached is not None:
        cached.unpersist()
    metrics = obs.get
    rows, checksum = int(metrics["n"]), int(metrics["chk"] or 0)

    # per-graph partition lineage: one extra pass, only for the
    # partitioned triples table (the resume/repair unit)
    per_part = {}
    if partition_by and "graph" in (partition_by or []):
        written = df.sparkSession.read.parquet(stage_dir)
        per_part = {
            r["graph"]: int(r["n"])
            for r in written.groupBy("graph").agg(F.count("*").alias("n")).collect()
        }
    wall_ms = int((time.monotonic() - t0) * 1000)

    with open(_manifest_path(stage_dir), "w") as f:
        json.dump(
            {
                "stage": name,
                "rows": rows,
                "checksum": checksum,
                "wall_ms": wall_ms,
                "schema": out.schema.simpleString(),
                "partitions": per_part,
            },
            f,
            indent=1,
        )
    return StageResult(name, stage_dir, rows, checksum, wall_ms, False)


def build(
    triples_raw: DataFrame,
    out_dir: str,
    resume: bool = False,
) -> tuple[KnowledgeGraph, list[StageResult]]:
    """Materialize a KnowledgeGraph from string triples (``de create``)."""
    spark = triples_raw.sparkSession
    results: list[StageResult] = []
    os.makedirs(out_dir, exist_ok=True)

    raw_dir = f"{out_dir}/triples_raw"
    results.append(_write_stage(triples_raw, raw_dir, "extract", resume))
    raw = spark.read.parquet(raw_dir)

    # one term-universe shuffle shared by the uid + dictionary stages
    flags = position_flags(raw).persist()

    uids_dir = f"{out_dir}/term_uids"
    done = lambda d: resume and os.path.exists(_manifest_path(d))  # noqa: E731
    uids_df = spark.read.parquet(uids_dir) if done(uids_dir) else build_term_uids(raw, flags)
    results.append(_write_stage(uids_df, uids_dir, "term_uids", resume))
    uids = spark.read.parquet(uids_dir)

    dict_dir = f"{out_dir}/dict"
    dict_df = (
        spark.read.parquet(dict_dir) if done(dict_dir) else build_dictionary(raw, uids, flags)
    )
    results.append(_write_stage(dict_df, dict_dir, "dict", resume))

    triples_dir = f"{out_dir}/triples"
    p_vocab = flags.where(F.col("is_p") == 1).select("term").distinct()
    results.append(
        _write_stage(
            encode_triples(raw, uids, p_vocab),
            triples_dir,
            "triples",
            resume,
            partition_by=["graph"],
            sort=True,
        )
    )
    flags.unpersist()

    stats_dir = f"{out_dir}/stats"
    enc = spark.read.parquet(triples_dir)
    results.append(_write_stage(void_stats_encoded(enc), stats_dir, "stats", resume))

    # predicate-degree statistics: drives selectivity ordering in the
    # BGP compiler (SURVEY.md §4 P7 — the classic SPARQL optimizer
    # trick the reference gets from spareval's prepare())
    pred_dir = f"{out_dir}/pred_stats"
    pred_stats = enc.groupBy("p_id").agg(F.count("*").alias("n"))
    results.append(_write_stage(pred_stats, pred_dir, "pred_stats", resume))

    return KnowledgeGraph.load(spark, out_dir), results
