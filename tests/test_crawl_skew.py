"""Enqueue-stage skew: one hot host owns ~half the discovered frontier.

SURVEY §7 step 8. Selection can't skew (≤1 URL/host/wave by
construction), but the link fan-in can: every page linking to the same
host makes that host the hottest groupBy/anti-join key in the enqueue
stage. This fixture builds exactly that web and asserts (a) the trace
still matches the oracle exactly, and (b) the merged frontier is not
concentrated in one partition (AQE + hash partitioning spread the hot
host's URLs — the key is url_hash, not host, precisely so a hot host
cannot pin a partition).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog
from distributed_web_search_engine_crawler_indexing_pagerank__spark.oracle.simulator import (
    CrawlConfig,
    OracleCrawler,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.crawl import (
    SparkCrawler,
)

N_HOSTS = 10
HOT_PAGES = 60  # pages on the hot host h0


def _url(h: int, p: int) -> str:
    return f"http://h{h}.test/p/{p}.html"


def _html(links: list[str]) -> str:
    body = "".join(f'<a href="{u}">x</a>' for u in links)
    return f"<html><head><title>t</title></head><body>{body}</body></html>"


def _web() -> tuple[pd.DataFrame, pd.DataFrame]:
    rows = []
    # every host's seed page links 10× to the hot host + 1 cross link —
    # h0 receives ~10/11 ≈ 90% of wave-0 discoveries
    for h in range(N_HOSTS):
        links = [_url(0, 10 + (h * 10 + j) % HOT_PAGES) for j in range(10)]
        links.append(_url((h + 1) % N_HOSTS, 1))
        rows.append((_url(h, 0), _html(links)))
        rows.append((_url(h, 1), _html([])))
    for p in range(HOT_PAGES):
        rows.append((_url(0, 10 + p), _html([])))
    resp = pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "head_status": 200,
            "location": None,
            "content_type": "text/html",
            "content_language": "en",
            "body": [r[1].encode() for r in rows],
        }
    )
    robots = pd.DataFrame(
        {
            "host": [f"h{h}.test:80" for h in range(N_HOSTS)],
            "robots_status": 404,
            "robots_txt": None,
        }
    )
    return resp, robots


def test_hot_host_fanin_trace_and_partition_balance(spark, tmp_path):
    resp, robots = _web()
    cfg = CrawlConfig(target_pages=10_000, max_pages_per_host=100, max_waves=4,
                      strict_robots=True)
    seeds = [_url(h, 0) for h in range(N_HOSTS)]

    oc = OracleCrawler(
        {r["url"]: dict(r) for _, r in resp.iterrows()},
        {r["host"]: (int(r["robots_status"]), r["robots_txt"]) for _, r in robots.iterrows()},
        cfg,
    )
    oc.add_seeds(seeds)
    oc.run(max_waves=4)

    crawler = SparkCrawler(
        spark,
        Catalog(str(tmp_path / "cat")),
        spark.createDataFrame(resp),
        spark.createDataFrame(robots),
        cfg,
        n_bloom_shards=4,
    )
    crawler.init_from_seeds(seeds)
    crawler.run(max_waves=1)

    # the skew is real: after wave 0 the hot host owns ≥70% of the frontier
    frontier = crawler.cat.read(spark, "frontier")
    hot = frontier.where(F.col("host") == "h0.test:80").count()
    total = frontier.count()
    assert total > 0 and hot / total >= 0.7, (hot, total)

    # ...and no partition holds it all: the frontier is keyed by url_hash,
    # so the hot host's URLs spread across partitions
    parts = (
        frontier.repartition(8, "url_hash")
        .select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .collect()
    )
    sizes = [r["count"] for r in parts]
    assert len(sizes) > 1 and max(sizes) <= 0.5 * sum(sizes), sizes

    crawler.run(max_waves=4)
    spark_trace = sorted(
        (r["wave"], r["url"], r["depth"], r["outcome"])
        for r in crawler.cat.read(spark, "trace").collect()
    )
    oracle_trace = sorted(
        (t["wave"], t["url"], t["depth"], t["outcome"]) for t in oc.trace
    )
    assert spark_trace == oracle_trace
    spark_seen = {r["url_hash"] for r in crawler.cat.read(spark, "seen").collect()}
    assert spark_seen == set(oc.seen)
