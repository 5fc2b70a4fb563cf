"""Bloom shards at scale: 10^6 keys, measured fp-rate, auto-resize.

Driver-side (numpy) checks of the vectorized kernels — no Spark needed
for the bit math; the Spark integration invariants live in
test_bloom_webgen.py.
"""

from __future__ import annotations

import numpy as np

from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.bloom import (
    _K,
    BITS_PER_KEY,
    BloomShards,
    _hash_pair,
    _positions,
)


def _keys(prefix: str, n: int) -> np.ndarray:
    return np.asarray([f"{prefix}{i:032d}" for i in range(n)], dtype="U40")


def test_million_keys_no_false_negatives_and_low_fp_rate():
    n = 1_000_000
    n_shards = 16
    # size for the target load up front (what ensure_capacity would pick)
    m = 1 << 17
    while m * n_shards < 2 * BITS_PER_KEY * n:
        m *= 2
    bloom = BloomShards(n_shards=n_shards, bits_per_shard=m)
    ins = _keys("k", n)
    shards = (np.arange(n) % n_shards).astype(np.int64)
    bloom.add_arrays(ins, shards)
    assert bloom.n_keys == n

    # no false negatives: every inserted key probes positive
    h1, h2 = _hash_pair(ins)
    byte_idx, bit = _positions(h1, h2, bloom.m)
    vals = bloom.bitmaps[shards[:, None], byte_idx]
    assert ((vals >> bit) & 1).all()

    # false-positive rate over 10^6 fresh keys ≤ 2%
    fresh = _keys("x", n)
    h1, h2 = _hash_pair(fresh)
    byte_idx, bit = _positions(h1, h2, bloom.m)
    vals = bloom.bitmaps[shards[:, None], byte_idx]
    fp = ((vals >> bit) & 1).all(axis=1).mean()
    assert fp <= 0.02, f"fp rate {fp:.4f} exceeds 2%"


def test_auto_resize_grows_and_rebuilds(spark):
    bloom = BloomShards(n_shards=4, bits_per_shard=1 << 10)  # tiny: 4096 bits
    rows = [(f"h{i:04d}", f"host{i % 7}.test") for i in range(3000)]
    seen = spark.createDataFrame(rows, "url_hash string, host string")
    bloom.build_from_seen(seen)
    assert bloom.n_keys == 3000
    # 3000 keys need 30000 bits; current capacity 4096 ⇒ must grow
    grew = bloom.ensure_capacity(seen)
    assert grew
    assert bloom.m * bloom.n_shards >= BITS_PER_KEY * 3000
    assert bloom.m & (bloom.m - 1) == 0
    # rebuild kept every key (no false negatives after the resize)
    probe = bloom.probe_udf(spark)
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.bloom import (
        shard_of_host,
    )
    from pyspark.sql import functions as F

    flags = seen.select(probe(F.col("url_hash"), shard_of_host(F.col("host"), 4)).alias("f"))
    assert flags.where(~F.col("f")).count() == 0
    # and a second call at the same size is a no-op
    assert not bloom.ensure_capacity(seen)


def test_crawler_capacity_planning(spark):
    """expected_urls pre-sizes the shards (power-of-two bits, >=10
    bits/key with 2x headroom) so a correctly-estimated crawl never
    pauses a wave for a Bloom rebuild."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import (
        Catalog,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.crawl import (
        SparkCrawler,
    )
    import tempfile

    empty_resp = spark.createDataFrame(
        [],
        "url string, head_status int, location string, content_type string,"
        " content_language string, body binary",
    )
    empty_robots = spark.createDataFrame([], "host string, status int, body string")
    crawler = SparkCrawler(
        spark,
        Catalog(tempfile.mkdtemp(prefix="captest-")),
        empty_resp,
        empty_robots,
        n_bloom_shards=16,
        expected_urls=1_000_000,
    )
    total_bits = crawler.bloom.m * crawler.bloom.n_shards
    assert total_bits >= 2 * BITS_PER_KEY * 1_000_000
    assert crawler.bloom.m & (crawler.bloom.m - 1) == 0
    # pre-sized: ensure_capacity on a ledger within the estimate is a no-op
    rows = [(f"h{i:05d}", f"host{i % 11}.test") for i in range(5000)]
    seen = spark.createDataFrame(rows, "url_hash string, host string")
    crawler.bloom.build_from_seen(seen)
    assert not crawler.bloom.ensure_capacity(seen)
    # default (no estimate) stays at the small bootstrap size
    small = SparkCrawler(
        spark,
        Catalog(tempfile.mkdtemp(prefix="captest2-")),
        empty_resp,
        empty_robots,
        n_bloom_shards=16,
    )
    assert small.bloom.m == 1 << 17
