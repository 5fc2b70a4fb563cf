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
