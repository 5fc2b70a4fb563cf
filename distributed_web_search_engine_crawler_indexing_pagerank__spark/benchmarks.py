"""Benchmark helpers: crawl-replay throughput + headline query timings.

The crawl replay is the north-star metric (BASELINE.json: "frontier URLs
scheduled+fetched/sec ... seed-list replay"): generate a deterministic
pseudo-web at bench scale (distributed, fetch-free — responses come from
a parquet join), run N micro-iterations of the scheduler, and report
scheduled URLs (trace rows) per second. The same function at two
parallelism levels gives the scaling-efficiency evidence
(``scripts/bench_scaling.py`` → BENCH/BASELINE.md).
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import SparkSession

from . import webgen
from .catalog import Catalog
from .oracle.simulator import CrawlConfig
from .plans.crawl import SparkCrawler

__all__ = ["run_crawl_bench"]


def run_crawl_bench(
    spark: SparkSession,
    n_hosts: int = 2000,
    pages_base: int = 12,
    n_seeds: int = 400,
    waves: int = 4,
    seed: int = 101,
    workdir: str | None = None,
    partitions: int = 32,
    heft: int = 1,
    checkpoint_interval: int = 1,
) -> dict:
    """Run a fetch-free frontier replay; returns timing + throughput.

    ``heft`` scales synthetic page size/link counts toward realistic web
    pages (see webgen.page_html); ``checkpoint_interval`` selects the
    every-K-waves durable-snapshot cadence."""
    tmp = workdir or tempfile.mkdtemp(prefix="crawlbench-")
    try:
        gen_t0 = time.time()
        pages, responses, robots = webgen.gen_web_spark(
            spark, seed, n_hosts, pages_base, partitions=partitions, heft=heft
        )
        resp_path = f"{tmp}/responses.parquet"
        robots_path = f"{tmp}/robots.parquet"
        responses.write.mode("overwrite").parquet(resp_path)
        robots.write.mode("overwrite").parquet(robots_path)
        gen_sec = time.time() - gen_t0

        cfg = CrawlConfig(
            target_pages=10**9,
            max_pages_per_host=500,
            max_waves=waves,
            strict_robots=True,
        )
        crawler = SparkCrawler(
            spark,
            Catalog(f"{tmp}/catalog"),
            spark.read.parquet(resp_path),
            spark.read.parquet(robots_path),
            cfg,
            n_bloom_shards=16,
            frontier_partitions=partitions,
            checkpoint_interval=checkpoint_interval,
        )
        seeds = webgen.seed_urls(seed, n_hosts, pages_base, n_seeds)
        crawler.init_from_seeds(seeds)

        t0 = time.time()
        crawler.run(max_waves=waves)
        crawl_sec = time.time() - t0

        n_trace = crawler.cat.read(spark, "trace").count()
        n_pages = crawler.cat.read(spark, "crawl").count()
        return {
            "gen_sec": round(gen_sec, 3),
            "crawl_sec": round(crawl_sec, 3),
            "waves": waves,
            "urls_scheduled": n_trace,
            "pages_fetched": n_pages,
            "urls_per_sec": round(n_trace / crawl_sec, 2) if crawl_sec > 0 else 0.0,
            "n_hosts": n_hosts,
            "n_seeds": n_seeds,
        }
    finally:
        if workdir is None:
            shutil.rmtree(tmp, ignore_errors=True)
