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

__all__ = [
    "IVF_SIGN_BITS",
    "cosine",
    "cosine_topk",
    "ivf_ann_topk",
    "kmeans_centroids",
    "ivf_kmeans_topk",
]

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


# --- learned coarse quantizer (IVF / k-means) --------------------------------

def _sq_dist_to(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a constant centroid (JVM column expr)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based index of the nearest centroid (ties → lowest index)."""
    dists = F.array(*[_sq_dist_to(vec, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic distributed Lloyd iterations → centroid list.

    Init = the ``n_centroids`` vectors with the smallest md5(id) (a
    deterministic pseudo-random sample, stable across partitionings).
    Each iteration is one groupBy over the assignments: per-cluster
    per-dimension means as ``array(avg(vec[0]), …)`` — no per-row Python,
    and the only driver traffic is the (n_centroids × dim) centroid
    matrix per iteration. Empty clusters keep their previous centroid
    (the standard Lloyd fallback, keeps the codebook size fixed)."""
    dim = len(emb.select(vec_col).first()[0])
    init = (
        emb.select(vec_col, F.md5(F.col(id_col).cast("string")).alias("_r"))
        .orderBy("_r")
        .limit(n_centroids)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init]
    for _ in range(iters):
        assigned = emb.select(
            _nearest(F.col(vec_col), centroids).alias("_c"), F.col(vec_col)
        )
        rows = (
            assigned.groupBy("_c")
            .agg(
                F.array(
                    *[F.avg(F.col(vec_col).getItem(i).cast("double")) for i in range(dim)]
                ).alias("_mean")
            )
            .collect()
        )
        new = {int(r["_c"]): [float(x) for x in r["_mean"]] for r in rows}
        centroids = [new.get(i, centroids[i]) for i in range(n_centroids)]
    return centroids


def ivf_kmeans_topk(
    emb: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    max_bucket: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """→ (vec_id, neighbor_id, cos, rank): IVF ANN with a LEARNED coarse
    quantizer. Every vector is indexed under its nearest centroid; every
    query probes its ``nprobe`` nearest centroids' inverted lists via a
    bucket equi-join. With nprobe = n_centroids this is exhaustive search
    (must equal cosine_topk — the recall anchor in tests).

    Skew/occupancy bound: each inverted list is SALTED into
    ceil(size / max_bucket) sub-buckets (index side hashed, probe side
    fans out over the salt range), so no join group exceeds ~max_bucket
    vectors even when the quantizer collapses mass into one cell — the
    explicit hot-key treatment the 10^10-scale north rule asks for (AQE
    skew-join would split these too; salting makes the bound a property
    of the plan, not the runtime)."""
    if centroids is None:
        centroids = kmeans_centroids(emb, n_centroids, iters, id_col, vec_col)
    n_centroids = len(centroids)

    indexed = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        _nearest(F.col(vec_col), centroids).alias("bucket"),
    )
    sizes = indexed.groupBy("bucket").agg(
        F.ceil(F.count("*") / F.lit(max_bucket)).cast("int").alias("_nsub")
    )
    right = indexed.join(F.broadcast(sizes), "bucket").select(
        "bucket",
        F.pmod(F.hash("neighbor_id"), F.col("_nsub")).alias("_salt"),
        "neighbor_id",
        "nv",
    )

    # probe side: nprobe nearest centroids per query, fanned over salts
    probes = F.slice(
        F.transform(
            F.array_sort(
                F.array(
                    *[
                        F.struct(
                            _sq_dist_to(F.col(vec_col), c).alias("d"),
                            F.lit(i).alias("b"),
                        )
                        for i, c in enumerate(centroids)
                    ]
                )
            ),
            lambda s: s["b"],
        ),
        1,
        min(nprobe, n_centroids),
    )
    left = (
        emb.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            F.explode(probes).alias("bucket"),
        )
        .join(F.broadcast(sizes), "bucket")
        .select(
            "qid", "qv", "bucket", F.explode(F.sequence(F.lit(0), F.col("_nsub") - 1)).alias("_salt")
        )
    )

    scored = (
        left.join(right, ["bucket", "_salt"])
        .where(F.col("qid") != F.col("neighbor_id"))
        .select(
            F.col("qid").alias("vec_id"),
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos"),
        )
        # a vector can meet the same neighbor through at most one
        # (bucket, salt) pair — buckets partition the index — so no dedup
        # is needed before ranking.
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos", "rank")
    )
