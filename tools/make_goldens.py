"""Regenerate golden parquet oracles for queries whose semantics have
no closed-form SQL twin (currently: ann_ivf_topk — iterative k-means).

The golden is the engine's own deterministic output at the driver's
correctness scale (sf0.01), committed to the repo; the driver's DuckDB
oracle reads it back via read_parquet.  This checks STABILITY (the
result is a pure function of the input — seeded centroids, rounded
Lloyd means, deterministic tie-breaks), complementing the recall
pytest that checks QUALITY against brute force.

Run after any change to the IVF parameters or algorithm:

    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from de_spark.session import get_spark

GOLDENS = {
    "ann_ivf_topk": "tests/goldens/ann_ivf_topk_sf0.01.parquet",
}
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark("make_goldens", cpus=8, shuffle_partitions=8)
    qs = entrymod.queries()
    for name, rel in GOLDENS.items():
        out = os.path.join(repo, rel)
        df = qs[name](spark, SF_DIR)
        pdf = df.toPandas()
        os.makedirs(os.path.dirname(out), exist_ok=True)
        pdf.to_parquet(out, index=False)
        print(f"wrote {out}: {len(pdf)} rows, cols={list(pdf.columns)}")


if __name__ == "__main__":
    main()
