"""spark-submit entry point for the KG build (north_rule deployment
shape: ``spark-submit --py-files de_spark.zip tools/submit_build.py``).

Args: SF OUT_DIR [RESUME]

The SparkSession comes from spark-submit's conf (master/executors set
on the command line); ``get_spark`` only layers the engine defaults
(AQE, Arrow, shuffle sizing) on top.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/de_spark_build"
    resume = len(sys.argv) > 3 and sys.argv[3] == "resume"

    from de_spark.corpus import generate_corpus
    from de_spark.extract import extract_code_triples
    from de_spark.pipeline import build
    from de_spark.session import get_spark

    spark = get_spark("de_spark_submit")
    t0 = time.monotonic()
    kg, stages = build(extract_code_triples(generate_corpus(spark, sf)), out_dir, resume=resume)
    wall = time.monotonic() - t0
    n = next(s.rows for s in stages if s.name == "triples")
    print(
        json.dumps(
            {
                "sf": sf,
                "triples": n,
                "wall_sec": round(wall, 3),
                "triples_per_sec": round(n / wall, 1),
                "stages": {s.name: {"rows": s.rows, "wall_ms": s.wall_ms, "skipped": s.skipped} for s in stages},
            }
        )
    )


if __name__ == "__main__":
    main()
