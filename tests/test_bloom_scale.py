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
