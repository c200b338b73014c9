"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: the dot product and norms
are JVM higher-order array folds (zip_with + aggregate), so the scan stays
in whole-stage codegen, and top-k is an orderBy+limit that Spark executes
as a per-partition partial top-k + a single-reducer merge (TakeOrdered) —
no full sort, no full shuffle.

The LSH-bucketed variant (random-hyperplane signs with deterministic seeded
planes) is the 100TB path: candidates come from an equi-join on the bucket
key, and exact cosine re-ranks only within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    ec = F.col(vec_col).cast("array<double>")
    return (
        embeddings.select(
            F.col(id_col),
            cosine_similarity(ec, q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hyperplane_signature(vec_col, n_planes: int = 8, seed: int = 42):
    """Deterministic random-hyperplane LSH bucket id (long). Plane weights
    are a seeded LCG over (plane, dim) so any engine can reproduce them."""

    def plane_weight(p: int, d) -> object:
        # hash(plane, dim) -> pseudo-uniform in [-1, 1)
        x = (F.lit(p * 1_000_003) + d) * F.lit(2654435761)
        frac = (x % F.lit(1 << 20)).cast("double") / F.lit(float(1 << 20))
        return frac * 2.0 - 1.0

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda v, i: v * plane_weight(p, i.cast("long")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to the query's hyperplane
    bucket. At 10^12 rows: bucket the table once (write-time partition),
    prune to one bucket at query time — scan cost /2^n_planes."""
    ec = F.col(vec_col).cast("array<double>")
    bucketed = embeddings.withColumn("bucket", hyperplane_signature(ec, n_planes))
    import pandas as pd  # driver-side tiny computation, not a UDF

    qdf = bucketed.sparkSession.createDataFrame(
        pd.DataFrame({"q": [list(map(float, query_vec))]})
    ).select(hyperplane_signature(F.col("q").cast("array<double>"), n_planes).alias("b"))
    qbucket = qdf.collect()[0]["b"]
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qbucket), query_vec, k, id_col, vec_col
    )
