#!/usr/bin/env python3
"""URL-seen probe bench at 10^7 ledger keys (VERDICT r2 → r3 item #1).

Builds the catalog-backed BloomStore shard table from a 10^7-key seen
ledger and probes 2·10^6 candidates (half true dupes) through BOTH probe
strategies:

- broadcast (small regime): map-side pandas UDF against a broadcast of
  the bitmap matrix — what runs while bitmaps ≤ 64 MB;
- shard-routed cogroup (scale regime, forced via threshold=0):
  candidates shuffled by host-shard, each task holding exactly ONE
  shard's bitset — the plan that still runs when the bitmaps total
  ~12 GB at the 10^10-URL north star.

Both must return the exact same unseen count (asserted). Results land in
BENCH/bloom_probe.json; scripts/bench_scaling.py folds them into
BENCH/BASELINE.md.

Usage: python3 scripts/bench_bloom_probe.py [--keys 10000000]
       [--candidates 2000000] [--shards 64] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ledger(spark, lo: int, hi: int, n_hosts: int):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.sha1(F.col("id").cast("string")).alias("url_hash"),
        F.concat(
            F.lit("host"), (F.col("id") % n_hosts).cast("string"), F.lit(".test")
        ).alias("host"),
    )


def run_path(spark, cat_dir: str, seen, cand, n_keys: int, threshold: int) -> dict:
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.bloom import (
        BITS_PER_KEY,
        BloomStore,
    )

    bits = 1 << 17
    n_shards = ARGS.shards
    need = 2 * BITS_PER_KEY * n_keys // n_shards
    while bits < need:
        bits *= 2
    store = BloomStore(
        Catalog(cat_dir),
        n_shards=n_shards,
        bits_per_shard=bits,
        broadcast_threshold=threshold,
    )
    t0 = time.time()
    store.build_from_seen(seen)
    build_sec = time.time() - t0
    assert store.n_keys == n_keys

    t0 = time.time()
    unseen = store.filter_unseen(spark, cand, seen.select("url_hash")).count()
    probe_sec = time.time() - t0
    return {
        "build_sec": round(build_sec, 2),
        "probe_sec": round(probe_sec, 2),
        "keys_per_sec": round(ARGS.candidates / probe_sec, 0),
        "unseen": unseen,
        "bits_per_shard": bits,
        "bitmap_mb": round(n_shards * bits / 8 / 1e6, 1),
    }


def main() -> None:
    global ARGS
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=10_000_000)
    ap.add_argument("--candidates", type=int, default=2_000_000)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--hosts", type=int, default=1_000_000)
    ap.add_argument(
        "--fast-dir", default="/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    )
    ARGS = ap.parse_args()

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.session import get_spark

    spark = get_spark("bloom-probe-bench", cores=ARGS.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    seen = _ledger(spark, 0, ARGS.keys, ARGS.hosts)
    half = ARGS.candidates // 2
    from pyspark.sql import functions as F

    cand = (
        _ledger(spark, 0, half, ARGS.hosts)  # true dupes
        .unionByName(_ledger(spark, ARGS.keys, ARGS.keys + (ARGS.candidates - half), ARGS.hosts))
        .withColumn("url", F.col("url_hash"))
        .repartition(ARGS.cpus)
        .persist()
    )
    cand.count()  # materialize candidates outside the timed window

    work = tempfile.mkdtemp(prefix="bloomprobe-", dir=ARGS.fast_dir)
    try:
        res = {
            "n_keys": ARGS.keys,
            "n_candidates": ARGS.candidates,
            "dupe_fraction": half / ARGS.candidates,
            "n_shards": ARGS.shards,
            "cpus": ARGS.cpus,
            "broadcast": run_path(
                spark, f"{work}/cat-bc", seen, cand, ARGS.keys, threshold=1 << 40
            ),
            "cogroup": run_path(
                spark, f"{work}/cat-cg", seen, cand, ARGS.keys, threshold=0
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    exact_unseen = ARGS.candidates - half
    assert res["broadcast"]["unseen"] == exact_unseen, res
    assert res["cogroup"]["unseen"] == exact_unseen, res

    out = os.path.join(REPO, "BENCH", "bloom_probe.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
