"""Learned-codebook IVF ANN: recall anchors vs exact cosine top-k.

Three invariants:
1. nprobe = n_centroids (exhaustive probe) must EQUAL brute-force
   cosine_topk — the quantizer only routes, it never changes scores.
2. partial probe keeps useful recall on the fixture embeddings.
3. the salted occupancy bound changes the PLAN, never the results.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators import (
    similarity,
)

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
K = 10
N_CENTROIDS = 8


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _pairs(df):
    return {(r["vec_id"], r["neighbor_id"]) for r in df.collect()}


def test_full_probe_equals_exact(spark):
    emb = _emb(spark)
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.cosine_topk(emb, queries, k=K).select(
        F.col("query_id").alias("vec_id"), "neighbor_id", "cos", "rank"
    )
    cents = similarity.kmeans_centroids(emb, n_centroids=N_CENTROIDS, iters=3)
    assert len(cents) == N_CENTROIDS
    full = similarity.ivf_kmeans_topk(
        emb, k=K, nprobe=N_CENTROIDS, centroids=cents
    )
    a = {tuple(r) for r in exact.collect()}
    b = {tuple(r) for r in full.collect()}
    assert a == b, "exhaustive-probe IVF must equal brute force"

    # partial probe: recall@10 stays useful on the fixture
    part = similarity.ivf_kmeans_topk(emb, k=K, nprobe=3, centroids=cents)
    recall = len(_pairs(part) & _pairs(exact)) / len(_pairs(exact))
    assert recall >= 0.4, f"recall@{K} {recall:.3f} too low for nprobe=3/{N_CENTROIDS}"

    # the occupancy bound (salting) must not change results
    salted = similarity.ivf_kmeans_topk(
        emb, k=K, nprobe=3, centroids=cents, max_bucket=40
    )
    assert _pairs(salted) == _pairs(part)


def test_literal_and_join_codebook_paths_identical(spark):
    """_centroid_candidates has two physical plans (literal expressions
    vs broadcast-centroid join); they must be numerically identical."""
    emb = _emb(spark)
    cents = similarity.kmeans_centroids(emb, n_centroids=N_CENTROIDS, iters=2)
    lit = similarity._centroid_candidates(emb, cents, 3, "vec_id", "embedding")
    # force the join path by dropping the literal threshold
    orig = similarity.LITERAL_CODEBOOK_MAX
    similarity.LITERAL_CODEBOOK_MAX = 0
    try:
        join = similarity._centroid_candidates(emb, cents, 3, "vec_id", "embedding")
    finally:
        similarity.LITERAL_CODEBOOK_MAX = orig
    a = {(r["vec_id"], tuple((x["d"], x["b"]) for x in r["cand"])) for r in lit.collect()}
    b = {(r["vec_id"], tuple((x["d"], x["b"]) for x in r["cand"])) for r in join.collect()}
    assert a == b, "literal and broadcast-join codebook paths must be bit-identical"


def test_big_codebook_plans_without_blowup(spark):
    """A 1024-centroid codebook must take the broadcast-join path: plan
    size stays O(1) in n_centroids (the r2 finding: per-centroid literal
    expressions blow up the plan at realistic codebook sizes), and the
    probe still executes and returns well-formed ranked neighbors."""
    import time

    emb = _emb(spark).limit(200)
    rows = emb.collect()
    dim = len(rows[0]["embedding"])
    # synthetic 1024-centroid codebook (values in the fixture range)
    cents = [
        [((i * 37 + d * 11) % 19 - 9) / 32.0 for d in range(dim)] for i in range(1024)
    ]
    t0 = time.time()
    df = similarity.ivf_kmeans_topk(
        emb, k=3, nprobe=2, centroids=cents, max_bucket=64
    )
    plan_secs = time.time() - t0  # plan construction only (lazy)
    assert plan_secs < 30, f"plan construction took {plan_secs:.1f}s — literal blowup?"
    out = df.collect()
    assert len(out) > 0
    # structure: every query ranks ≤ k neighbors, ranks are 1..n
    by_q = {}
    for r in out:
        by_q.setdefault(r["vec_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_kmeans_training_scales_in_dim_and_codebook(spark):
    """Training must plan O(1) in both the embedding dimension and the
    codebook size: the cluster mean is ONE vector-native aggregate
    (Summarizer.mean), not dim unrolled avg(vec[i]) expressions, and
    assignment takes the broadcast-codebook join. Exercised at dim=256 /
    n_centroids=1024 — the regime where the r3 unroll planned 256 agg
    expressions per iteration."""
    import time

    dim, n = 256, 1400
    emb = spark.range(n).select(
        F.col("id").cast("string").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda d: ((F.col("id") * d) % 17).cast("double") / 8.0 - 1.0,
        ).alias("embedding"),
    )

    # plan shape: one aggregate, no per-dimension avg unroll
    cents0 = [[(i * 7 + d) % 5 / 4.0 for d in range(dim)] for i in range(8)]
    assigned = similarity._centroid_candidates(
        emb, cents0, 1, "vec_id", "embedding", prefer_join=True
    ).select(F.col("cand")[0]["b"].alias("_c"), F.col("embedding"))
    means = similarity._cluster_means(assigned, "embedding")
    plan = means._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("avg(") == 0, "per-dimension avg unroll is back"
    assert len(plan) < 20_000, f"plan grew with dim ({len(plan)} chars)"

    # numeric: vector mean == per-dimension mean (same data, tiny frame)
    small = emb.limit(40).withColumn("_c", (F.col("vec_id").cast("int") % 3))
    got = {
        int(r["_c"]): r["_mean"]
        for r in similarity._cluster_means(small, "embedding").collect()
    }
    want_rows = small.groupBy("_c").agg(
        F.array(*[F.avg(F.col("embedding").getItem(i)) for i in range(dim)]).alias("m")
    ).collect()
    for r in want_rows:
        for a, b in zip(got[int(r["_c"])], r["m"]):
            assert abs(a - b) < 1e-9

    # end-to-end: a 1024-centroid codebook trains without plan blowup
    t0 = time.time()
    cents = similarity.kmeans_centroids(emb, n_centroids=1024, iters=1)
    secs = time.time() - t0
    assert len(cents) == 1024 and all(len(c) == dim for c in cents)
    assert secs < 300, f"1024-centroid / 256-dim iteration took {secs:.0f}s"
