#!/usr/bin/env python3
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR plus the
crawl-replay throughput run. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "urls/sec", "queries": {...}, "sf": ...}

``value`` = frontier URLs scheduled+fetched per second in the crawl
replay — BASELINE.json's authoritative metric (higher is better), on a
workload-size-independent scale so rounds stay comparable even when the
replay workload grows. Per-query wall seconds (including the replay's,
as ``crawl_replay``) are in ``queries``; their sum is
``headline_total_sec``. Scaling evidence across two parallelism levels
lives in BENCH/BASELINE.md (scripts/bench_scaling.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_web_search_engine_crawler_indexing_pagerank__spark.benchmarks import (  # noqa: E402
    run_crawl_bench,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.queries import (  # noqa: E402
    queries,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.session import (  # noqa: E402
    get_spark,
)

HEADLINE = [
    "q_tpch_q1",
    "q_join_agg",
    "q_politeness_window",
    "q_frontier_antijoin",
    "q_tfidf_docs",
    "q_minhash_lsh",
    "q_ngram_jaccard",
    "q_simhash",
    "q_cosine_topk",
    "q_ivf_ann",
    "q_ivf_kmeans",
    "q_embed_neardup",
    "q_media_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qmap = queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qmap[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # workload family matches BENCH/BASELINE.md: every host seeded (each
    # wave schedules ~n_hosts URLs), heft'd Common-Crawl-ish page sizes,
    # fast-mode checkpointing — the steady-state regime, not the
    # tiny-frontier fixed-cost regime.
    # RAM-backed scratch when available — same protocol as
    # scripts/bench_scaling.py: the single local disk's erratic write
    # bandwidth is measurement noise, not crawl cost (a cluster's storage
    # bandwidth scales with executors).
    fast = os.environ.get(
        "BENCH_CRAWL_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    workdir = tempfile.mkdtemp(prefix="crawlbench-", dir=fast) if fast else None
    try:
        crawl = run_crawl_bench(
            spark,
            n_hosts=int(os.environ.get("BENCH_CRAWL_HOSTS", "20000")),
            pages_base=int(os.environ.get("BENCH_CRAWL_PAGES", "3")),
            n_seeds=int(os.environ.get("BENCH_CRAWL_SEEDS", "20000")),
            waves=int(os.environ.get("BENCH_CRAWL_WAVES", "3")),
            heft=int(os.environ.get("BENCH_CRAWL_HEFT", "60")),
            checkpoint_interval=int(os.environ.get("BENCH_CRAWL_CKPT", "4")),
            partitions=max(8, int(cpus) if str(cpus).isdigit() else 32),
            workdir=workdir,
        )
    finally:
        if workdir:
            shutil.rmtree(workdir, ignore_errors=True)
    timings["crawl_replay"] = crawl["crawl_sec"]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "crawl_urls_per_sec",
                "value": crawl["urls_per_sec"],
                "unit": "urls/sec",
                "queries": timings,
                "sf": sf,
                "headline_total_sec": total,
                "crawl_urls_per_sec": crawl["urls_per_sec"],
                "crawl_urls_scheduled": crawl["urls_scheduled"],
                "crawl_pages_fetched": crawl["pages_fetched"],
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
