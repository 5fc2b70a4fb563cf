"""KMV distinct sketch: exact below k, bounded relative error above k,
deterministic across runs, k-bounded per-group state by construction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.sketches import (
    kmv_distinct,
)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("g", f"k{i % 17}") for i in range(200)], "grp string, key string"
    )
    got = kmv_distinct(df, key="key", by=["grp"], k=64).collect()
    assert len(got) == 1
    assert got[0]["est_distinct"] == 17.0  # < k -> exact, not estimated


def test_kmv_estimate_within_error_bound_above_k(spark):
    k = 64
    groups = {"a": 1000, "b": 5000, "c": 300}
    rows = [
        (g, f"{g}-key-{i}") for g, n in groups.items() for i in range(n)
    ]
    df = spark.createDataFrame(rows * 2, "grp string, key string")  # dups
    got = {
        r["grp"]: r["est_distinct"]
        for r in kmv_distinct(df, key="key", by=["grp"], k=k).collect()
    }
    # SE ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    tol = 4 / math.sqrt(k - 2)
    for g, n in groups.items():
        assert abs(got[g] - n) / n < tol, (g, got[g], n)


def test_kmv_deterministic(spark):
    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.col("id").cast("string").alias("key"),
    )
    a = sorted(map(tuple, kmv_distinct(df, "key", ["grp"], k=32).collect()))
    b = sorted(
        map(tuple, kmv_distinct(df.repartition(7), "key", ["grp"], k=32).collect())
    )
    assert a == b
