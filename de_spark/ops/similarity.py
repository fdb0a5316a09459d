"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k — the baseline and oracle.
  The dot product is a JVM-side ``aggregate(zip_with(...))`` fold —
  no Python, no UDF; one scan, one TakeOrdered.
- hyperplane_lsh_topk: the scale path.  Sign-random-projection LSH:
  h(v) = bits of sign(v·p_i) for fixed deterministic hyperplanes →
  candidates share a bucket → exact cosine only within buckets.
  At 100 TB the bucket join replaces the full cross product; recall is
  tuned by (n_planes, n_tables).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a constant query vector.
    Returns (vec_id, cosine) ordered desc, ties broken by id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(_cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _deterministic_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes from a splitmix-style integer
    stream — reproducible anywhere, no RNG library dependency."""
    planes = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z = z ^ (z >> 31)
            # map to (-1, 1)
            plane.append((z / 2**63) - 1.0)
        planes.append(plane)
    return planes


def _bucket_expr(vec_col_expr, planes: list[list[float]]):
    """Sign-projection bucket id of a vector column for fixed planes."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(x) for x in p])
        bit = F.when(_dot(vec_col_expr, pc) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit * F.lit(2**i).cast("long")
    return bucket


def hyperplane_signatures(
    embeddings: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, bucket) — sign-projection LSH bucket id."""
    planes = _deterministic_planes(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        _bucket_expr(v, planes).alias("bucket"),
    )


def _table_planes(dim: int, n_planes: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    return [_deterministic_planes(dim, n_planes, seed + t * 1000) for t in range(n_tables)]


def multi_table_signatures(
    embeddings: DataFrame,
    n_planes: int,
    n_tables: int,
    dim: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_vec: bool = True,
) -> DataFrame:
    """(vec_id[, embedding], table, bucket) for ALL hash tables in ONE
    projection over ONE scan of the input (round 1 scanned the
    embeddings once per table — n_tables× the IO at 100 TB).

    ``include_vec=False`` keeps the vector out of the exploded rows —
    the near-dup candidate path only joins (id, table, bucket), so
    carrying the embedding n_tables× through the explode is pure
    shuffle payload (the top-k path keeps it to skip a re-join).
    """
    v = F.col(vec_col).cast("array<double>")
    entries = [
        F.struct(
            F.lit(t).alias("table"),
            _bucket_expr(v, planes).alias("bucket"),
        )
        for t, planes in enumerate(_table_planes(dim, n_planes, n_tables, seed))
    ]
    carried = [F.col(vec_col).alias("embedding")] if include_vec else []
    out_cols = (["vec_id", "embedding"] if include_vec else ["vec_id"]) + [
        F.col("tb.table").alias("table"),
        F.col("tb.bucket").alias("bucket"),
    ]
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        *carried,
        F.explode(F.array(*entries)).alias("tb"),
    ).select(*out_cols)


def _hamming_ball(bucket: int, n_planes: int, radius: int) -> list[int]:
    """All bucket ids within ``radius`` bit flips of ``bucket``."""
    out = [bucket]
    if radius >= 1:
        out += [bucket ^ (1 << i) for i in range(n_planes)]
    if radius >= 2:
        out += [
            bucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return out


def hyperplane_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors that share (or are within
    ``multiprobe_hamming`` bits of) the query's bucket in ANY of the
    ``n_tables`` independent hash tables.  Recall levers: more tables
    (union of candidates) and multi-probe (neighbor buckets); both
    trade scan fraction for recall.  On weakly-clustered data (random
    embeddings) expect to scan 30-40% for recall ≈0.9; on real
    embedding manifolds buckets are far more selective."""
    dim = len(query_vec)
    # one scan for all tables: signatures computed in a single projection
    sigs = multi_table_signatures(embeddings, n_planes, n_tables, dim, seed, id_col, vec_col)
    # query's probe set per table, computed driver-side (tiny)
    probe_rows = []
    for t, planes in enumerate(_table_planes(dim, n_planes, n_tables, seed)):
        qbucket = 0
        for i, p in enumerate(planes):
            if sum(x * y for x, y in zip(query_vec, p)) >= 0:
                qbucket |= 1 << i
        probe_rows += [(t, b) for b in set(_hamming_ball(qbucket, n_planes, multiprobe_hamming))]
    probe_df = embeddings.sparkSession.createDataFrame(probe_rows, ["table", "bucket"])
    cand = (
        sigs.join(F.broadcast(probe_df), ["table", "bucket"], "left_semi")
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        "vec_id",
        F.round(_cosine(F.col("embedding").cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _assign_to_centroids(
    embeddings: DataFrame,
    centroids_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, list_id): nearest centroid by cosine via a
    broadcast join + argmax aggregation.

    The centroid table is broadcast (n_lists × dim doubles — a few MB
    even at 4k lists), so the fact table never shuffles rows it doesn't
    have to: after the broadcast join, all n_lists scores of one vector
    sit in the SAME partition, so the max_by groupBy partial-aggregates
    map-side back down to one row per vector before the exchange.  Plan
    size is flat in n_lists — round 1 inlined every centroid as a
    literal when-chain (plan grew O(n_lists·dim), VERDICT.md issue 2).
    Tie-break: lower list_id wins (deterministic).
    """
    v = F.col(vec_col).cast("array<double>")
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).join(F.broadcast(centroids_df.select("list_id", "centroid")))
    score = _cosine(F.col("embedding").cast("array<double>"), F.col("centroid"))
    return scored.groupBy("vec_id").agg(
        F.first("embedding").alias("embedding"),
        F.max_by("list_id", F.struct(score.alias("s"), (-F.col("list_id")).alias("nl")))
        .cast("int")
        .alias("list_id"),
    )


def ivf_build(
    embeddings: DataFrame,
    n_lists: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF index: k-means-lite centroids + per-vector list assignment.

    Centroids start from a deterministic sample (every (n/k)-th vector
    by id order) and refine with ``iters`` Lloyd rounds.  The centroids
    live in a small DataFrame (list_id, centroid: array<double>) that is
    BROADCAST into the assignment join — never inlined into the plan —
    and each round's assignment is persisted so the next round's means
    aggregate the cache instead of recomputing the lineage.

    Returns (centroids_df, assigned) where
    assigned = (vec_id, embedding, list_id).

    Scale path: at 100 TB the assignment pass is one scan + broadcast
    join + map-side argmax per round, and queries touch only
    n_probe/n_lists of the data.
    """
    n = embeddings.count()
    step = max(n // n_lists, 1)
    # deterministic seeding: row_number over the ≤n_lists sampled rows
    # (tiny — the limit collapses to one task)
    from pyspark.sql import Window

    seeds = (
        embeddings.where((F.col(id_col) % step == 0))
        .orderBy(id_col)
        .limit(n_lists)
        .select(F.col(vec_col).cast("array<double>").alias("centroid"), F.col(id_col).alias("__sid"))
    )
    w = Window.orderBy("__sid")
    centroids_df = seeds.select(
        (F.row_number().over(w) - 1).cast("int").alias("list_id"), "centroid"
    )

    assigned = _assign_to_centroids(embeddings, centroids_df, id_col, vec_col).persist()
    for _ in range(iters):
        # per-list mean: explode to (list_id, pos, val), aggregate, and
        # fold back to an array — shuffle volume is n_lists × dim rows
        # of doubles after map-side partial aggregation
        means = (
            assigned.select(
                "list_id",
                F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
            )
            .groupBy("list_id", "pos")
            # round(…, 9): float summation order varies with
            # partitioning; rounding makes Lloyd means (and therefore
            # the whole index) bit-deterministic across cluster sizes
            .agg(F.round(F.avg("val"), 9).alias("m"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("list_id", F.col("pm.m").alias("mean"))
        )
        # a list that lost all members keeps its previous centroid
        centroids_df = centroids_df.join(means, "list_id", "left").select(
            "list_id", F.coalesce("mean", "centroid").alias("centroid")
        )
        prev = assigned
        assigned = _assign_to_centroids(embeddings, centroids_df, id_col, vec_col).persist()
        assigned.count()  # materialize before dropping the previous round
        prev.unpersist()
    from de_spark.ops import register_operator_cache

    # the final assignment cache backs ivf_topk lazily; the session
    # registry releases it once the caller is done (ADVICE r5 hygiene)
    register_operator_cache(assigned)
    return centroids_df, assigned


def ivf_topk(
    assigned: DataFrame,
    centroids_df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k via IVF: score only the n_probe lists whose
    centroids are closest to the query (one tiny collect of n_probe
    list ids — the centroid table itself never leaves the executors)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_rows = (
        centroids_df.select("list_id", _cosine(F.col("centroid"), q).alias("cs"))
        .orderBy(F.desc("cs"), F.asc("list_id"))
        .limit(n_probe)
        .collect()
    )
    probe = [int(r["list_id"]) for r in probe_rows]

    cand = assigned.where(F.col("list_id").isin(probe))
    scored = cand.select(
        "vec_id",
        F.round(_cosine(F.col("embedding").cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def pairwise_topk_per_vector(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each vector: its k nearest neighbors by cosine (brute force,
    windowed rank).  Verification-scale helper for kNN-graph builds."""
    from pyspark.sql import Window

    a = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    scored = (
        a.crossJoin(b)
        .where(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.round(_cosine(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("a").orderBy(F.desc("cosine"), F.asc("b"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k).drop("rk")
