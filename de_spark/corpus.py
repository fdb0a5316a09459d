"""Deterministic synthetic source-code corpus (BASELINE.json input_hint).

Generates the pipeline's input table
``(repo, path, commit, lang, content)`` at any scale, fully
distributed (``spark.range`` + JVM-side column expressions — no Python
in the row path, no RNG state: every value is a pure function of the
row id via crc32/sha2 mixing, so the corpus is byte-stable across
runs, partitionings and cluster sizes).

Content is templated source text with module docstring, import/use
lines drawn from a fixed 50-module vocabulary with Zipf-ish skew
(hot modules → the ``imports`` hub-predicate skew the north_rule
requires us to handle), function definitions, and call expressions
referencing other generated functions.

Scale mapping: SF=0.001 ≈ 1k files, SF=0.01 ≈ 10k, SF=0.1 ≈ 100k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FILES_PER_SF = 1_000_000  # SF=1.0 ≈ 1M files; SF=100 ≈ the 100M+ regime
N_MODULES = 50
N_ORGS = 7
N_REPOS = 23


def _mix(col, salt: int):
    """Deterministic 32-bit mix of a long column."""
    return F.crc32(F.concat(F.lit(str(salt) + ":"), col.cast("string")))


def generate_corpus(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = max(int(FILES_PER_SF * sf), 10)
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    df = spark.range(0, n, 1, partitions).withColumnRenamed("id", "fid")
    fid = F.col("fid")

    org = _mix(fid, 1) % N_ORGS
    repo_n = _mix(fid, 2) % N_REPOS
    repo = F.concat(F.lit("org"), org.cast("string"), F.lit("/repo"), repo_n.cast("string"))
    lang = F.when(_mix(fid, 3) % 3 < 2, F.lit("python")).otherwise(F.lit("rust"))
    ext = F.when(lang == "python", F.lit("py")).otherwise(F.lit("rs"))
    path = F.concat(
        F.lit("src/mod"), (_mix(fid, 4) % 17).cast("string"),
        F.lit("/file"), fid.cast("string"), F.lit("."), ext,
    )
    # 40-char hex from three xxhash64 mixes — NOT sha2: Spark's sha2
    # calls MessageDigest.getInstance per row, whose provider lock
    # serializes all executor threads in a JVM (measured: a pure sha2
    # map job stops scaling beyond 2 threads).  xxhash64 is codegen'd
    # and lock-free; for synthetic commit ids any deterministic hex is
    # equivalent.
    key = F.concat(repo, F.lit("@"), path)
    commit = F.lower(
        F.concat(
            F.lpad(F.hex(F.xxhash64(key, F.lit(1))), 16, "0"),
            F.lpad(F.hex(F.xxhash64(key, F.lit(2))), 16, "0"),
            F.lpad(F.hex(F.xxhash64(key, F.lit(3))), 16, "0"),
        )
    ).substr(1, 40)

    # Zipf-ish module picks: square a uniform [0,1) to skew toward module 0
    def module_pick(salt: int):
        u = (_mix(fid, salt) % 10_000) / 10_000.0
        return F.floor(F.lit(N_MODULES) * u * u).cast("int")

    def fn_target(salt: int):
        # call targets reference other files' functions (dense id space)
        return (_mix(fid, salt) % F.lit(max(n, 1))).cast("long")

    n_imports = 6
    n_defs = 8
    imp = [module_pick(10 + i) for i in range(n_imports)]
    tgt = [fn_target(20 + i) for i in range(n_defs)]

    py_parts = [F.lit('"""module '), path, F.lit('"""\n')]
    rs_parts = [F.lit("//! module "), path, F.lit("\n")]
    for i in range(n_imports - 1):
        py_parts += [F.lit("import mod_"), imp[i].cast("string"), F.lit("\n")]
        rs_parts += [F.lit("use mod_"), imp[i].cast("string"), F.lit(";\n")]
    py_parts += [F.lit("from mod_"), imp[-1].cast("string"), F.lit(" import helper\n\n")]
    rs_parts += [F.lit("use mod_"), imp[-1].cast("string"), F.lit(";\n\n")]
    for k in range(n_defs):
        fk = fid.cast("string")
        py_parts += [
            F.lit(f"def fn_"), fk, F.lit(f"_{k}(x):\n    # body {k}\n    return fn_"),
            tgt[k].cast("string"), F.lit("_0(x) + helper(x)\n\n"),
        ]
        rs_parts += [
            F.lit("pub fn fn_"), fk, F.lit(f"_{k}(x: i64) -> i64 {{\n    fn_"),
            tgt[k].cast("string"), F.lit("_0(x)\n}\n\n"),
        ]
    content = F.when(lang == "python", F.concat(*py_parts)).otherwise(F.concat(*rs_parts))

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )
