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


# ---------------------------------------------------------------- HLL ----

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.sketches import (  # noqa: E402
    HLL_M,
    hll_distinct,
)


def test_hll_estimate_within_error_bound(spark):
    groups = {"a": 1000, "b": 20000, "c": 5000}
    rows = [(g, f"{g}-key-{i}") for g, n in groups.items() for i in range(n)]
    df = spark.createDataFrame(rows * 2, "grp string, key string")  # dups
    got = {
        r["grp"]: r["est_distinct"]
        for r in hll_distinct(df, key="key", by=["grp"]).collect()
    }
    tol = 5 * 1.04 / math.sqrt(HLL_M)  # 5 sigma of the published SE
    for g, n in groups.items():
        assert abs(got[g] - n) / n < tol, (g, got[g], n)


def test_hll_linear_counting_small_cardinality(spark):
    # tiny cardinality: the linear-counting branch should be near-exact
    df = spark.createDataFrame(
        [("g", f"k{i % 7}") for i in range(300)], "grp string, key string"
    )
    got = hll_distinct(df, key="key", by=["grp"]).collect()
    assert len(got) == 1
    assert abs(got[0]["est_distinct"] - 7) <= 1.5, got


def test_hll_deterministic_and_dup_insensitive(spark):
    df = spark.range(8000).select(
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") % 2500).cast("string").alias("key"),  # heavy dups
    )
    a = sorted(map(tuple, hll_distinct(df, "key", ["grp"]).collect()))
    b = sorted(
        map(tuple, hll_distinct(df.repartition(13), "key", ["grp"]).collect())
    )
    c = sorted(  # union with itself: max-merge must be a no-op
        map(tuple, hll_distinct(df.union(df), "key", ["grp"]).collect())
    )
    assert a == b == c


# -------------------------------------------------------- KMV algebra ----

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.sketches import (  # noqa: E402
    kmv_pair_overlap,
    kmv_signature,
)


def test_kmv_signature_capped_and_deterministic(spark):
    df = spark.range(5000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        F.col("id").cast("string").alias("key"),
    )
    sig = kmv_signature(df, "key", ["grp"], k=64)
    counts = {r["grp"]: r["n"] for r in sig.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"0": 64, "1": 64}
    a = sorted(map(tuple, sig.collect()))
    b = sorted(map(tuple, kmv_signature(df.repartition(9), "key", ["grp"], k=64).collect()))
    assert a == b


def test_kmv_pair_overlap_exact_below_k(spark):
    # |A|=30, |B|=20, |A∩B|=10 — all below k, so the sketch IS the set
    rows = [("a", f"k{i}") for i in range(30)] + [
        ("b", f"k{i}") for i in range(20, 40)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    got = kmv_pair_overlap(df, "key", "grp", k=64).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["ga"], r["gb"]) == ("a", "b")
    assert r["est_union"] == 40.0
    assert r["jaccard_est"] == round(10 / 40, 4)


def test_kmv_pair_overlap_estimates_above_k(spark):
    # |A|=|B|=4000, |A∩B|=2000 -> union 6000, jaccard 1/3
    rows = [("a", f"k{i}") for i in range(4000)] + [
        ("b", f"k{i}") for i in range(2000, 6000)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    r = kmv_pair_overlap(df, "key", "grp", k=256).first()
    assert abs(r["est_union"] - 6000) / 6000 < 0.25, r
    assert abs(r["jaccard_est"] - 1 / 3) < 0.12, r


# ------------------------------------------- randomized seeded sweeps ----

import numpy as np  # noqa: E402


def test_kmv_pair_overlap_randomized_vs_exact(spark):
    """Seeded sweep: random set sizes/overlaps; below-k pairs must be
    EXACT, above-k pairs inside 5-sigma KMV error."""
    rng = np.random.RandomState(23)
    k = 128
    rows, truth = [], {}
    names = ["g0", "g1", "g2", "g3"]
    universe = [f"u{i}" for i in range(12000)]
    sets = {}
    for g in names:
        n = int(rng.randint(40, 4000))
        sets[g] = set(rng.choice(universe, size=n, replace=False))
        rows += [(g, m) for m in sets[g]]
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            u = sets[a] | sets[b]
            truth[(a, b)] = (len(u), len(sets[a] & sets[b]) / len(u))
    df = spark.createDataFrame(rows, "grp string, key string")
    got = {
        (r["ga"], r["gb"]): (r["est_union"], r["jaccard_est"])
        for r in kmv_pair_overlap(df, "key", "grp", k=k).collect()
    }
    assert set(got) == set(truth)
    se = 1 / np.sqrt(k - 2)
    for pair, (n_u, jac) in truth.items():
        est_u, est_j = got[pair]
        if n_u < k:
            assert est_u == float(n_u), (pair, est_u, n_u)
            assert est_j == round(jac, 4), (pair, est_j, jac)
        else:
            assert abs(est_u - n_u) / n_u < 5 * se, (pair, est_u, n_u)
            # jaccard: k-sample binomial, sd <= 0.5/sqrt(k)
            assert abs(est_j - jac) < 5 * 0.5 / np.sqrt(k), (pair, est_j, jac)


def test_hll_randomized_vs_exact(spark):
    rng = np.random.RandomState(31)
    cards = [int(c) for c in rng.randint(200, 30000, size=6)]
    rows = [
        (f"g{i}", f"g{i}-x-{j}") for i, n in enumerate(cards) for j in range(n)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    got = {
        r["grp"]: r["est_distinct"]
        for r in hll_distinct(df, key="key", by=["grp"]).collect()
    }
    tol = 5 * 1.04 / np.sqrt(HLL_M)
    for i, n in enumerate(cards):
        assert abs(got[f"g{i}"] - n) / n < tol, (i, got[f"g{i}"], n)


# --------------------------------------------------------- count-min ----

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.sketches import (  # noqa: E402
    cms_estimate,
    cms_sketch,
)


def test_cms_upper_bounds_truth_and_is_exact_when_sparse(spark):
    rng = np.random.RandomState(41)
    true = {f"k{i}": int(rng.randint(1, 200)) for i in range(50)}
    rows = [(k,) for k, n in true.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "key string")
    sk = cms_sketch(df, "key")
    assert sk.count() <= 3 * 1024
    got = {
        r["key"]: r["est_count"]
        for r in cms_estimate(df, sk, "key").collect()
    }
    assert set(got) == set(true)
    for k, n in true.items():
        assert got[k] >= n, (k, got[k], n)  # CMS never undercounts
    # 50 keys in 1024 buckets: collisions possible but bounded — total
    # inflation stays small
    assert sum(got.values()) <= sum(true.values()) * 1.5


def test_cms_deterministic_across_partitionings(spark):
    df = spark.range(5000).select(
        (F.col("id") % 300).cast("string").alias("key")
    )
    a = sorted(map(tuple, cms_estimate(df, cms_sketch(df, "key"), "key").collect()))
    df2 = df.repartition(11)
    b = sorted(map(tuple, cms_estimate(df2, cms_sketch(df2, "key"), "key").collect()))
    assert a == b
