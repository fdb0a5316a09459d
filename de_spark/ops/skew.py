"""Skew-handling utilities (SURVEY.md §4 P11).

AQE's skew-join splitting (on in the session factory) covers
shuffle-join skew at runtime; ``salted_join`` is the explicit fallback
for when a deliberate pre-partitioning must survive (or AQE is off):
the build side is replicated ``salt`` ways, the probe side gets a
deterministic salt from a hash of its row, so hot keys (rdf:type,
mod_0 imports) spread across ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with key salting.

    ``small`` is exploded ×salt (fine for dimension-sized inputs);
    ``large`` rows pick one salt deterministically from a hash of the
    WHOLE row (not the join key — same-key rows must land on different
    salts, and it must be stable across retries, unlike rand())."""
    salt_col = (
        F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in large.columns])) % salt
    ).cast("int")
    big = large.withColumn("__salt", salt_col)
    rep = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = big.join(rep, on + ["__salt"], how)
    return out.drop("__salt")


def key_histogram(df: DataFrame, key_cols: list[str], top: int = 20) -> DataFrame:
    """Top-N hottest keys — the measurement step before salting."""
    return df.groupBy(*key_cols).count().orderBy(F.desc("count")).limit(top)
