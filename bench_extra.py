"""Extra benchmarks for the optimization rounds (guide §1.4):

- per-query noop-sink timing (same methodology as bench.py, but
  selectable query subset + rep count via CLI args), and
- ``.explain("formatted")`` capture for every declared query into
  plans/<tag>/<query>_<suffix>.txt.

bench.py itself is FROZEN for measurement; this file exists so
optimization evidence (isolated walls, plan diffs) can be produced
without touching it.

Usage:
  python bench_extra.py plans <tag> <suffix> [query ...]
  python bench_extra.py time  <reps> [query ...]
  python bench_extra.py build [sf]           # kg_build stage profile
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from de_spark.session import get_spark


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark("de_bench_extra", cpus=cpus, shuffle_partitions=cpus)


def capture_plans(tag: str, suffix: str, names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    qs = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names or list(qs):
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


def time_queries(reps: int, names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    qs = entrymod.queries()
    results = {}
    for name in names or list(qs):
        walls = []
        for _ in range(reps):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        results[name] = walls
        print(f"{name}: min={min(walls)} walls={walls}", flush=True)
    import json

    print(json.dumps(results))


def profile_build(sf: float) -> None:
    import shutil
    import tempfile

    from de_spark.corpus import generate_corpus
    from de_spark.extract import extract_code_triples
    from de_spark.pipeline import build

    spark = _spark()
    out_dir = tempfile.mkdtemp(
        prefix="de_profile_kg_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        t0 = time.monotonic()
        corpus = generate_corpus(spark, sf)
        raw = extract_code_triples(corpus)
        kg, stages = build(raw, out_dir)
        wall = time.monotonic() - t0
        print(f"total wall: {wall:.2f}s")
        for s in stages:
            print(f"  {s.name}: {s.wall_ms} ms rows={s.rows}")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "plans":
        capture_plans(sys.argv[2], sys.argv[3], sys.argv[4:])
    elif mode == "time":
        time_queries(int(sys.argv[2]), sys.argv[3:])
    elif mode == "build":
        profile_build(float(sys.argv[2]) if len(sys.argv) > 2 else 0.1)
    else:
        raise SystemExit(f"unknown mode {mode}")
