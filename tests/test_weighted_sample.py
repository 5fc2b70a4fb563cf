"""Deterministic weighted sampling (Efraimidis-Spirakis with md5
uniforms): pure-Python replication of the exact formula, partitioning
invariance, and the weighting property."""

from __future__ import annotations

import hashlib

from distributed_web_search_engine_crawler_indexing_pagerank__spark import queries as Q


def _py_score(event_type: str, user_id: int, w: int) -> float:
    # uniform per (stratum, item): independent draws across strata
    key = f"{event_type}|{user_id}".encode()
    u = int(hashlib.md5(key).hexdigest()[:15], 16) / 16**15
    return round(u ** (1.0 / w), 10)


def test_weighted_sample_matches_pure_python(spark, sf_dir):
    got = Q.QUERIES["q_weighted_sample"][0](spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        assert r["score"] == _py_score(r["event_type"], r["user_id"], r["w"]), r


def test_weighted_sample_strata_draw_independently(spark):
    """Fixture built to expose cross-stratum correlation: every user has
    IDENTICAL weight 1 in each of 8 strata. With per-(stratum, item)
    uniforms the per-stratum top-5 sets must differ across strata; the
    old per-item hash made them identical in all 8."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    strata = [f"s{i}" for i in range(8)]
    rows = [(s, u) for s in strata for u in range(200)]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    wts = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("w"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("event_type"), F.col("user_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long").cast("double") / F.lit(float(16**15))
    )
    win = Window.partitionBy("event_type").orderBy(
        F.pow(u, 1.0 / F.col("w")).desc(), F.col("user_id").asc()
    )
    top = (
        wts.withColumn("rk", F.row_number().over(win))
        .where("rk <= 5").select("event_type", "user_id").collect()
    )
    by_stratum = {}
    for r in top:
        by_stratum.setdefault(r["event_type"], set()).add(r["user_id"])
    assert len(by_stratum) == len(strata)
    distinct_top5 = {frozenset(v) for v in by_stratum.values()}
    # identical weights everywhere — only the hash separates strata;
    # 8 identical top-5 sets would mean the uniforms are still correlated
    assert len(distinct_top5) > 1


def test_weighted_sample_prefers_heavy_users(spark):
    rows = [("t", 999)] * 400 + [("t", i) for i in range(60)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    df.write.mode("overwrite").parquet("/tmp/ws_events.parquet")
    import pyspark.sql.functions as F

    # reuse the query body against a synthetic events layout
    ev = spark.read.parquet("/tmp/ws_events.parquet")
    wts = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("w"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("event_type"), F.col("user_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long").cast("double") / F.lit(float(16**15))
    )
    from pyspark.sql import Window

    win = Window.partitionBy("event_type").orderBy(
        F.pow(u, 1.0 / F.col("w")).desc(), F.col("user_id").asc()
    )
    top = (
        wts.withColumn("rk", F.row_number().over(win))
        .where("rk <= 5").select("user_id").collect()
    )
    # u^(1/400) >= u^(1) for u in (0,1): the heavy user must be sampled
    assert 999 in {r["user_id"] for r in top}
