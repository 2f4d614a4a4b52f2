"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the scale path is
LSH random-hyperplane bucketing (candidate generation ∝ corpus size)
— an IVF-style variant would swap the hash for a k-means assignment.
All dot products are JVM-side ``zip_with``/``aggregate`` folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_cosine_topk(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against one query vector. The orderBy+limit
    plans as TakeOrderedAndProject: per-partition top-k then a driver
    merge — no global sort shuffle."""
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    sim = cosine(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, planes: int, seed: int) -> list[list[float]]:
    """Deterministic gaussian hyperplanes shared by ingest and query."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def _bucket_expr(vec: Column, hyperplanes: list[list[float]]) -> Column:
    key = F.lit(0)
    for i, hp in enumerate(hyperplanes):
        hp_col = F.array(*[F.lit(x) for x in hp])
        bit = F.when(_dot(vec, hp_col) >= 0, F.lit(1)).otherwise(F.lit(0))
        key = key + F.shiftleft(bit, i)
    return key


def add_lsh_buckets(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
    bucket_col: str = "__bucket",
) -> DataFrame:
    """Ingest-time bucket materialization: stamp each vector with its
    sign-pattern bucket. Write the result clustered on ``bucket_col``
    (``repartitionByRange(bucket_col)``) and every later ANN probe
    reads only the ~``planes+1`` probed buckets' files instead of the
    whole corpus — that is the 100 TB path."""
    return df.withColumn(
        bucket_col, _bucket_expr(F.col(vec_col), _hyperplanes(dim, planes, seed))
    )


def lsh_bucket_ann(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str = "__bucket",
) -> DataFrame:
    """Approximate NN via random-hyperplane LSH.

    Bucket key = sign pattern of ``planes`` fixed pseudo-random
    hyperplanes (deterministic from ``seed``). Only vectors in the
    query's bucket (or at Hamming distance <= 1, probing) are scored.
    If ``bucket_col`` already exists (materialized at ingest by
    ``add_lsh_buckets`` with the same seed), it is used directly — on a
    bucket-clustered table the isin predicate prunes at file level.
    """
    dim = len(query_vector)
    hyperplanes = _hyperplanes(dim, planes, seed)

    def bucket_py(vec: list[float]) -> int:
        key = 0
        for i, hp in enumerate(hyperplanes):
            if sum(a * b for a, b in zip(vec, hp)) >= 0:
                key |= 1 << i
        return key

    qb = bucket_py(query_vector)
    probe = [qb] + [qb ^ (1 << i) for i in range(planes)]  # Hamming<=1
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    if bucket_col not in df.columns:
        df = add_lsh_buckets(df, dim, planes, seed, vec_col, bucket_col)
    cand = df.filter(F.col(bucket_col).isin(probe))
    sim = cosine(F.col(vec_col), q)
    return (
        cand.select(F.col(id_col), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
