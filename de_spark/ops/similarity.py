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
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(x) for x in p])
        bit = F.when(_dot(v, pc) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit * F.lit(2**i).cast("long")
    return embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"), bucket.alias("bucket")
    )


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
    cand = None
    for t in range(n_tables):
        table_seed = seed + t * 1000
        planes = _deterministic_planes(dim, n_planes, table_seed)
        qbucket = 0
        for i, p in enumerate(planes):
            if sum(x * y for x, y in zip(query_vec, p)) >= 0:
                qbucket |= 1 << i
        probe = [qbucket]
        if multiprobe_hamming >= 1:
            probe += [qbucket ^ (1 << i) for i in range(n_planes)]
        if multiprobe_hamming >= 2:
            probe += [
                qbucket ^ (1 << i) ^ (1 << j)
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            ]
        sigs = hyperplane_signatures(embeddings, n_planes, dim, table_seed, id_col, vec_col)
        hits = sigs.where(F.col("bucket").isin(probe)).select("vec_id", "embedding")
        cand = hits if cand is None else cand.unionByName(hits)
    cand = cand.dropDuplicates(["vec_id"])
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        "vec_id",
        F.round(_cosine(F.col("embedding").cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def ivf_build(
    embeddings: DataFrame,
    n_lists: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """IVF index: k-means-lite centroids + per-vector list assignment.

    Centroids start from a deterministic sample (every (n/k)-th vector
    by id order) and refine with ``iters`` Lloyd rounds — each round is
    one groupBy-mean over the assignments (map-side partial means, one
    shuffle of k×dim doubles).  Returns (centroids, assigned) where
    assigned = (vec_id, embedding, list_id).

    Scale path: at 100 TB the assignment pass is a scan (centroids
    broadcast as literals) and queries touch only n_probe/n_lists of
    the data.
    """
    v = F.col(vec_col).cast("array<double>")

    n = embeddings.count()
    step = max(n // n_lists, 1)
    seeds = (
        embeddings.where((F.col(id_col) % step == 0))
        .orderBy(id_col)
        .limit(n_lists)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]

    def assign(cents: list[list[float]]) -> DataFrame:
        best_id = F.lit(0)
        best_dot = _cosine(v, F.array(*[F.lit(x) for x in cents[0]]))
        for i, c in enumerate(cents[1:], start=1):
            d = _cosine(v, F.array(*[F.lit(x) for x in c]))
            better = d > best_dot
            best_id = F.when(better, F.lit(i)).otherwise(best_id)
            best_dot = F.when(better, d).otherwise(best_dot)
        return embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            best_id.cast("int").alias("list_id"),
        )

    assigned = assign(centroids)
    for _ in range(iters):
        dim = len(centroids[0])
        means = (
            assigned.select(
                "list_id", F.col("embedding").cast("array<double>").alias("e")
            )
            .groupBy("list_id")
            .agg(*[F.avg(F.element_at("e", i + 1)).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        new_cents = list(centroids)
        for r in means:
            new_cents[r["list_id"]] = [float(r[f"c{i}"]) for i in range(dim)]
        centroids = new_cents
        assigned = assign(centroids)
    return centroids, assigned


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k via IVF: score only the n_probe lists whose
    centroids are closest to the query."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    scores = []
    for i, c in enumerate(centroids):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        scores.append((sum(a * b for a, b in zip(query_vec, c)) / (qn * cn), i))
    probe = [i for _, i in sorted(scores, reverse=True)[:n_probe]]

    q = F.array(*[F.lit(float(x)) for x in query_vec])
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
