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

from .textops import spread

__all__ = [
    "IVF_SIGN_BITS",
    "LITERAL_CODEBOOK_MAX",
    "cosine",
    "cosine_topk",
    "ivf_ann_topk",
    "kmeans_centroids",
    "ivf_kmeans_topk",
]

# 2^8 = 256 sign buckets: the self-join candidate set is ~N²/256 before
# the occupancy salting bounds any single join group.
IVF_SIGN_BITS = 8

# Codebooks up to this size are planned as per-centroid literal
# expressions (zero shuffles — the whole probe is map-side); bigger
# codebooks switch to a broadcast centroid-table join so the plan stays
# O(1) in n_centroids (a 4k×128 codebook as literals is ~500k expression
# nodes — the r2 plan-blowup finding).
LITERAL_CODEBOOK_MAX = 64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """``_dot`` unrolled for a KNOWN dimension: the same left-fold
    ``((0 + a0·b0) + a1·b1) + …`` as flat scalar expressions, which run
    in whole-stage codegen instead of the interpreted higher-order
    zip_with/aggregate path (HOFs are CodegenFallback — per PAIR they
    allocate a 64-element array and dispatch two lambdas per element;
    measured ~4x the per-pair cost of the unrolled form on the bucketed
    pair joins). Identical doubles: same multiplication and addition
    order, elementwise float→double casts are exact. (The r2 note about
    unrolled-codegen being slower concerned inlining full cosine — dot
    AND both norms, 3x64 terms — per pair; with norms hoisted per
    vector the 64-term dot is the right trade.)"""
    acc: Column = F.lit(0.0)
    for d in range(dim):
        acc = acc + a.getItem(d).cast("double") * b.getItem(d).cast("double")
    return acc


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision. The pair-join operators
    below inline this with the two norms HOISTED to the per-vector
    inputs (computed once per vector, not once per candidate pair) —
    same values, 3× less per-pair higher-order-function work. (An
    unrolled per-dimension codegen variant was measured SLOWER end to
    end: 64-term expressions push janino compile time and ~1MB task
    binaries past any per-row win.)"""
    return _dot(a, b) / (_norm(a) * _norm(b))


def vec_dim(emb: DataFrame, vec_col: str = "embedding") -> int:
    """Element count of the (fixed-width) embedding column — arrays
    don't carry length in the schema, so peek at one row."""
    return len(emb.select(vec_col).first()[0])


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """→ (query_id, neighbor_id, cos, rank): exact brute-force top-k per
    query vector. ``queries`` has (query_id, query_vec); it is the small
    broadcast side of the cross join. Norms are hoisted out of the pair
    loop — computed once per vector, not once per pair.

    ``spread`` matters here: every corpus row fans out into |queries|
    scored pairs, so a single-split scan would run the whole pair loop
    in ONE task (the shuffle/scan byte counts that drive AQE and split
    planning cannot see the CPU fan-out)."""
    dot = (lambda a, b: _dot_fixed(a, b, dim)) if dim else _dot
    embn = spread(emb).withColumn("_nn", _norm(F.col(vec_col)))
    qn = queries.withColumn("_qn", _norm(F.col("query_vec")))
    pairs = embn.crossJoin(F.broadcast(qn)).where(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("query_vec"), F.col(vec_col)) / (F.col("_qn") * F.col("_nn")),
            6,
        ).alias("cos"),
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


def bucket_sizes(bucketed: DataFrame, max_bucket: int) -> DataFrame:
    """→ (bucket, _nsub): sub-bucket count so no join group exceeds
    ~``max_bucket`` rows. The occupancy bound every bucketed self-join
    here shares: the index side is hashed into one of ``_nsub`` salts,
    the probe side fans out over the full salt range — result-invariant
    (a probe still meets every index row of its bucket exactly once),
    but the biggest join group shrinks from the hottest bucket's full
    occupancy to ~max_bucket. AQE skew-join would split these at
    runtime too; salting makes the bound a property of the plan."""
    return bucketed.groupBy("bucket").agg(
        F.ceil(F.count("*") / F.lit(max_bucket)).cast("int").alias("_nsub")
    )


def ivf_ann_topk(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = IVF_SIGN_BITS,
    max_bucket: int = 4096,
    dim: int | None = None,
) -> DataFrame:
    """→ (vec_id, neighbor_id, cos, rank): approximate top-k for EVERY
    vector, searching only its own sign bucket (bucket equi-join instead
    of a quadratic cross join). Join groups are occupancy-bounded by
    salting (``bucket_sizes``) — a degenerate sign pattern (e.g. an
    all-positive embedding model) can no longer collapse the self-join
    into one quadratic group. The input is ``spread`` first — pair
    scoring is CPU-bound and byte-count-invisible to AQE, so the
    probe-side stage must start with real parallelism."""
    b = spread(emb).select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
        _norm(F.col(vec_col)).alias("_n"),  # once per vector
    )
    sizes = bucket_sizes(b, max_bucket)
    right = b.join(F.broadcast(sizes), "bucket").select(
        "bucket",
        F.pmod(F.hash(F.col(id_col)), F.col("_nsub")).alias("_salt"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col("_n").alias("_nn"),
    )
    left = (
        b.join(F.broadcast(sizes), "bucket")
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            F.col("_n").alias("_qn"),
            "bucket",
            F.explode(F.sequence(F.lit(0), F.col("_nsub") - 1)).alias("_salt"),
        )
    )
    dot = (lambda a, b: _dot_fixed(a, b, dim)) if dim else _dot
    scored = (
        left.join(right, ["bucket", "_salt"])
        .where(F.col("qid") != F.col("neighbor_id"))
        .select(
            F.col("qid").alias("vec_id"),
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("nv")) / (F.col("_qn") * F.col("_nn")),
                6,
            ).alias("cos"),
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


def _centroid_candidates(
    emb: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    id_col: str,
    vec_col: str,
    prefer_join: bool = False,
) -> DataFrame:
    """→ (id, vec, cand: array<struct<d: double, b: int>>): each row's
    ``nprobe`` nearest centroids, ascending by (distance, index).

    Two physically different, numerically identical plans:

    - **literal path** (≤ LITERAL_CODEBOOK_MAX centroids): the codebook
      is embedded as column expressions — the probe is pure map-side
      whole-stage codegen, zero shuffles.
    - **broadcast-join path** (bigger codebooks): the codebook is a
      broadcast DataFrame; emb ⨯ broadcast(centroids) scores every
      (vector, centroid) pair, and a groupBy(id) with map-side partial
      aggregation collapses the C rows per vector back to one BEFORE the
      exchange (each vector's C copies live in one partition, so the
      shuffle moves ~|emb| rows). Plan size is O(1) in n_centroids —
      a 4k-centroid codebook plans instantly.

    Both paths compute (x − c)² folded in index order in double
    precision, so results are bit-identical — asserted in tests."""
    nprobe = min(nprobe, len(centroids))
    if len(centroids) <= LITERAL_CODEBOOK_MAX and not prefer_join:
        cand = F.slice(
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
            1,
            nprobe,
        )
        return emb.select(F.col(id_col), F.col(vec_col), cand.alias("cand"))

    spark = emb.sparkSession
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "b int, cvec array<double>",
    )
    d = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("cvec"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        F.col(id_col),
        F.col(vec_col),
        F.struct(d.alias("d"), F.col("b")).alias("_s"),
    )
    if nprobe == 1:
        # the training hot path (assignment only): min over the (d, b)
        # struct is bit-identical to sort+slice(1) — struct comparison is
        # field-order lexicographic, the same (d, b) key array_sort uses —
        # but the partial-agg buffer is ONE struct per key instead of a
        # C-element collect_list, so the agg stays map-side-combinable at
        # any codebook size.
        return scored.groupBy(id_col).agg(
            F.first(F.col(vec_col)).alias(vec_col),
            F.array(F.min("_s")).alias("cand"),
        )
    return scored.groupBy(id_col).agg(
        F.first(F.col(vec_col)).alias(vec_col),
        F.slice(F.array_sort(F.collect_list("_s")), 1, nprobe).alias("cand"),
    )


def _cluster_means(assigned: DataFrame, vec_col: str) -> DataFrame:
    """→ (_c, _mean: array<double>): per-cluster vector mean as ONE
    aggregate (``Summarizer.mean`` over an ML Vector column), not one
    ``avg(vec[i])`` expression per dimension — the plan is O(1) in the
    embedding dimension, so training scales to 768-dim codebooks where
    the unrolled form planned 768 agg expressions per iteration."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    return (
        assigned.select(
            "_c", array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v")
        )
        .groupBy("_c")
        .agg(vector_to_array(Summarizer.mean(F.col("_v"))).alias("_mean"))
    )


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
    Each iteration is one groupBy over the assignments with a single
    vector-native mean aggregate (``_cluster_means``) — no per-row
    Python, plan size O(1) in both dim and n_centroids (assignment takes
    the broadcast-codebook join path: literal per-centroid expressions
    would re-plan the whole codebook every iteration), and the only
    driver traffic is the (n_centroids × dim) centroid matrix per
    iteration. Empty clusters keep their previous centroid (the standard
    Lloyd fallback, keeps the codebook size fixed)."""
    init = (
        emb.select(vec_col, F.md5(F.col(id_col).cast("string")).alias("_r"))
        .orderBy("_r")
        .limit(n_centroids)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init]
    for _ in range(iters):
        assigned = _centroid_candidates(
            emb, centroids, 1, id_col, vec_col, prefer_join=True
        ).select(F.col("cand")[0]["b"].alias("_c"), F.col(vec_col))
        rows = _cluster_means(assigned, vec_col).collect()
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

    # ONE candidate pass serves both sides: cand[0] is the assignment
    # (index side), the whole array is the probe list. The codebook is
    # literal expressions for small C, a broadcast DataFrame join for
    # big C (see _centroid_candidates).
    cand = _centroid_candidates(
        spread(emb), centroids, min(nprobe, n_centroids), id_col, vec_col
    )
    indexed = cand.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col("cand")[0]["b"].alias("bucket"),
        _norm(F.col(vec_col)).alias("_nn"),  # once per vector
    )
    sizes = bucket_sizes(indexed, max_bucket)
    right = indexed.join(F.broadcast(sizes), "bucket").select(
        "bucket",
        F.pmod(F.hash("neighbor_id"), F.col("_nsub")).alias("_salt"),
        "neighbor_id",
        "nv",
        "_nn",
    )

    # probe side: nprobe nearest centroids per query, fanned over salts
    left = (
        cand.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            _norm(F.col(vec_col)).alias("_qn"),
            F.explode(F.transform(F.col("cand"), lambda s: s["b"])).alias("bucket"),
        )
        .join(F.broadcast(sizes), "bucket")
        .select(
            "qid", "qv", "_qn", "bucket",
            F.explode(F.sequence(F.lit(0), F.col("_nsub") - 1)).alias("_salt"),
        )
    )

    # pair scoring: the codebook fixes the dimension, so the dot is the
    # unrolled codegen form (see _dot_fixed) — the pair join is the only
    # O(candidates) stage and was dominated by interpreted HOF dispatch
    dot_dim = len(centroids[0]) if centroids and centroids[0] else None
    dot = (lambda a, b: _dot_fixed(a, b, dot_dim)) if dot_dim else _dot
    scored = (
        left.join(right, ["bucket", "_salt"])
        .where(F.col("qid") != F.col("neighbor_id"))
        .select(
            F.col("qid").alias("vec_id"),
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("nv")) / (F.col("_qn") * F.col("_nn")),
                6,
            ).alias("cos"),
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
