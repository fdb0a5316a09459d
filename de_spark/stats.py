"""VOID/HDT header statistics (``de view``).

The reference writes VOID counts into every HDT header and ``de view``
prints them (src/view.rs:52-55; concrete golden from
tests/resources/apple.hdt: triples=9, properties=7, distinctSubjects=2,
distinctObjects=9).  Exact countDistinct is used — these are parity
stats, not progress metrics (SURVEY.md §2.4 A1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def void_stats(triples_raw: DataFrame) -> DataFrame:
    """Per-graph VOID stats over string triples.

    Schema: graph, triples, properties, distinct_subjects,
    distinct_objects (all long).
    """
    return triples_raw.groupBy("graph").agg(
        F.count("*").alias("triples"),
        F.countDistinct("p").alias("properties"),
        F.countDistinct("s").alias("distinct_subjects"),
        F.countDistinct("o").alias("distinct_objects"),
    )


def void_stats_encoded(triples_enc: DataFrame) -> DataFrame:
    """Same VOID stats computed over the uid-encoded triples — counts
    are identical (term↔uid is a bijection) but the countDistinct
    shuffle moves 8-byte longs instead of term strings."""
    return triples_enc.groupBy("graph").agg(
        F.count("*").alias("triples"),
        F.countDistinct("p_id").alias("properties"),
        F.countDistinct("s_id").alias("distinct_subjects"),
        F.countDistinct("o_id").alias("distinct_objects"),
    )
