"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an IVF-style
sign-bucketed ANN as the scale path (bucket = sign pattern of the first
B dimensions — a coarse quantizer with zero training, deterministic and
SQL-expressible so the oracle can mirror it; a learned IVF/k-means
codebook slots into the same bucket-join shape).

All math is done JVM-side with ``zip_with``/``aggregate`` higher-order
functions in double precision, rounded to 6 decimals for cross-engine
comparability. At 100 TB the brute-force path is a broadcast of the
(small) query set against a full scan; the IVF path turns it into a
bucket-equi-join that prunes ~(1 − 1/2^B) of comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["IVF_SIGN_BITS", "cosine", "cosine_topk", "ivf_ann_topk"]

IVF_SIGN_BITS = 4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, cos, rank): exact brute-force top-k per
    query vector. ``queries`` has (query_id, query_vec); it is the small
    broadcast side of the cross join."""
    pairs = emb.crossJoin(F.broadcast(queries)).where(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("query_vec"), F.col(vec_col)), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def sign_bucket(vec: Column, bits: int = IVF_SIGN_BITS) -> Column:
    """Coarse quantizer: integer from the sign bits of the first dims."""
    return sum(
        F.when(vec.getItem(i).cast("double") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(bits)
    )


def ivf_ann_topk(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = IVF_SIGN_BITS,
) -> DataFrame:
    """→ (vec_id, neighbor_id, cos, rank): approximate top-k for EVERY
    vector, searching only its own sign bucket (bucket equi-join instead
    of a quadratic cross join)."""
    b = emb.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    left = b.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), "bucket"
    )
    right = b.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket"
    )
    scored = (
        left.join(right, "bucket")
        .where(F.col("qid") != F.col("neighbor_id"))
        .select(
            F.col("qid").alias("vec_id"),
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos", "rank")
    )
