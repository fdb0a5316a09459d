"""Integer triple encoding + SPO-ordered materialization.

The reference's hdt crate encodes NT triples against the dictionary and
stores them SPO-sorted as bitmap/CSR adjacency lists
(tests/resources/apple.hdt header: ``triplesOrder "SPO"``).  Spark
equivalent: three equi-joins against the term-uid table, then a range
shuffle on (graph, s_id) with in-partition (s_id, p_id, o_id) sort —
sorted parquet files + min/max row-group stats play the role of the
bitmap index (subject-bound patterns skip files, SURVEY.md §4 P1).

Join strategy at 100 TB:
- predicate terms are a tiny vocabulary → the p-side uid subset is
  broadcast (never shuffles the fact table);
- s/o joins shuffle on the term string; hub objects (rdf:type targets,
  hot import modules) are exactly the AQE skew-join case —
  ``spark.sql.adaptive.skewJoin.enabled`` is on in the session factory,
  and de_spark.ops.skew has an explicit salting fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encode_triples(
    triples_raw: DataFrame, term_uids: DataFrame, p_vocab: DataFrame | None = None
) -> DataFrame:
    """triples_raw (strings) → (graph, s_id, p_id, o_id) uid triples.

    ``p_vocab`` (a DataFrame with a ``term`` column of the distinct
    predicate terms) can be supplied by the caller to avoid a rescan —
    the pipeline derives it from the position-flags aggregation."""
    s_uid = term_uids.select(F.col("term").alias("s"), F.col("uid").alias("s_id"))
    o_uid = term_uids.select(F.col("term").alias("o"), F.col("uid").alias("o_id"))

    # predicate vocabulary is tiny: restrict + broadcast
    if p_vocab is None:
        p_vocab = triples_raw.select(F.col("p").alias("term")).distinct()
    p_uid = term_uids.join(p_vocab, "term", "left_semi").select(
        F.col("term").alias("p"), F.col("uid").alias("p_id")
    )

    return (
        triples_raw.join(s_uid, "s")
        .join(F.broadcast(p_uid), "p")
        .join(o_uid, "o")
        .select("graph", "s_id", "p_id", "o_id")
    )


def sort_spo(triples_enc: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Range-partition + sort triples into SPO order (per graph)."""
    spark = triples_enc.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return triples_enc.repartitionByRange(
        num_partitions, "graph", "s_id", "p_id", "o_id"
    ).sortWithinPartitions("graph", "s_id", "p_id", "o_id")


def write_triples(triples_enc: DataFrame, path: str) -> None:
    """Materialize SPO-sorted triples, partitioned by graph.

    Partition column ``graph`` ≈ the reference's one-HDT-per-graph
    layout (src/sparql.rs:40-48); graph-filtered queries prune
    partitions before any IO (the reference's "filter before loading"
    optimization, src/sparql.rs:86-99, is free here).
    """
    sort_spo(triples_enc).write.mode("overwrite").partitionBy("graph").parquet(path)


def decode_triples(triples_enc: DataFrame, term_uids: DataFrame) -> DataFrame:
    """(graph, s_id, p_id, o_id) → string triples, for emission only
    (mirror of the reference decoding at result time, src/sparql.rs:491-497)."""
    s_t = term_uids.select(F.col("uid").alias("s_id"), F.col("term").alias("s"))
    p_t = term_uids.select(F.col("uid").alias("p_id"), F.col("term").alias("p"))
    o_t = term_uids.select(F.col("uid").alias("o_id"), F.col("term").alias("o"))
    return (
        triples_enc.join(s_t, "s_id").join(p_t, "p_id").join(o_t, "o_id")
        .select("graph", "s", "p", "o")
    )
