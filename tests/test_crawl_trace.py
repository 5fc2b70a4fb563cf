"""Trace-equality: Spark crawl plan vs the pure-Python oracle simulator.

BASELINE.json north_rule: same seed list + politeness budget ⇒ identical
crawl ordering (fetch schedule) and URL-seen set. The oracle implements
the reference's semantics (src/jobs/Crawler.java) via the byte-exact
javaport kernels; the Spark plan must match it row-for-row, including
page bytes, depths, wave assignment, outcomes, host politeness effects,
and resume-from-checkpoint stability.
"""

from __future__ import annotations

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__spark import webgen
from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog
from distributed_web_search_engine_crawler_indexing_pagerank__spark.oracle.simulator import (
    CrawlConfig,
    OracleCrawler,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.crawl import (
    SparkCrawler,
)

SEED = 11  # covers every outcome branch incl. robots_disallowed/non_english
N_HOSTS = 10
PAGES_BASE = 12
N_SEEDS = 5

CFG = CrawlConfig(
    target_pages=45,
    max_pages_per_host=5,
    max_waves=9,
    strict_robots=True,  # exercise real robots gating, not the quirk
)


@pytest.fixture(scope="module")
def web():
    pages, responses, robots = webgen.gen_web_local(SEED, N_HOSTS, PAGES_BASE)
    return pages, responses, robots


@pytest.fixture(scope="module")
def oracle_result(web):
    _, responses, robots = web
    resp_map = {r["url"]: dict(r) for _, r in responses.iterrows()}
    robots_map = {
        r["host"]: (int(r["robots_status"]), r["robots_txt"]) for _, r in robots.iterrows()
    }
    oc = OracleCrawler(resp_map, robots_map, CFG)
    oc.add_seeds(webgen.seed_urls(SEED, N_HOSTS, PAGES_BASE, N_SEEDS))
    oc.run()
    return oc


def _run_spark_crawl(spark, web, tmp, max_waves=None, crawler=None):
    _, responses, robots = web
    if crawler is None:
        cat = Catalog(str(tmp))
        resp_df = spark.createDataFrame(responses)
        robots_df = spark.createDataFrame(robots)
        crawler = SparkCrawler(spark, cat, resp_df, robots_df, CFG, n_bloom_shards=4)
        crawler.init_from_seeds(webgen.seed_urls(SEED, N_HOSTS, PAGES_BASE, N_SEEDS))
    crawler.run(max_waves=max_waves)
    return crawler


def _spark_trace(crawler):
    rows = crawler.cat.read(crawler.spark, "trace").collect()
    return sorted((r["wave"], r["url"], r["depth"], r["outcome"]) for r in rows)


def _oracle_trace(oc):
    return sorted((t["wave"], t["url"], t["depth"], t["outcome"]) for t in oc.trace)


@pytest.fixture(scope="module")
def spark_crawler(spark, web, tmp_path_factory):
    return _run_spark_crawl(spark, web, tmp_path_factory.mktemp("crawlcat"))


def test_fetch_schedule_matches(oracle_result, spark_crawler):
    assert _spark_trace(spark_crawler) == _oracle_trace(oracle_result)
    # the schedule is non-trivial: pages actually got fetched over waves
    fetched = [t for t in oracle_result.trace if t["outcome"] == "fetched"]
    assert len(fetched) >= 10
    assert max(t["wave"] for t in oracle_result.trace) >= 3
    # every outcome branch is exercised by this fixture
    outcomes = {t["outcome"] for t in oracle_result.trace}
    assert {
        "fetched", "redirect", "non_english", "non_html",
        "robots_disallowed", "unfetchable", "status_404",
    } <= outcomes


def test_url_seen_set_matches(oracle_result, spark_crawler):
    spark_seen = {
        (r["url_hash"], r["url"])
        for r in spark_crawler.cat.read(spark_crawler.spark, "seen").collect()
    }
    assert spark_seen == set(oracle_result.seen.items())


def test_crawl_table_matches_bytes(oracle_result, spark_crawler):
    rows = spark_crawler.cat.read(spark_crawler.spark, "crawl").collect()
    spark_pages = {
        r["url_hash"]: (r["url"], bytes(r["page"]), r["length"], r["depth"], r["wave"])
        for r in rows
    }
    oracle_pages = {
        p["url_hash"]: (p["url"], p["page"], p["length"], p["depth"], p["wave"])
        for p in oracle_result.crawl
    }
    assert spark_pages == oracle_pages


def test_final_frontier_matches(oracle_result, spark_crawler):
    rows = spark_crawler.cat.read(spark_crawler.spark, "frontier").collect()
    spark_frontier = {
        r["url_hash"]: (r["depth"], r["disc_wave"], r["parent_hash"], r["link_idx"])
        for r in rows
    }
    oracle_frontier = {
        h: (e.prio.depth, e.prio.disc_wave, e.prio.parent_hash, e.prio.link_idx)
        for h, e in oracle_result.frontier.items()
    }
    assert spark_frontier == oracle_frontier


def test_politeness_one_fetch_per_host_per_wave(oracle_result):
    seen = set()
    for t in oracle_result.trace:
        key = (t["wave"], t["host"])
        assert key not in seen, f"host {t['host']} touched twice in wave {t['wave']}"
        seen.add(key)


def test_host_cap_respected(oracle_result, spark_crawler):
    rows = spark_crawler.cat.read(spark_crawler.spark, "crawl").collect()
    per_host: dict[str, int] = {}
    for r in rows:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    assert per_host and max(per_host.values()) <= CFG.max_pages_per_host


def test_fast_mode_interval_equivalence(spark, web, tmp_path_factory, spark_crawler):
    """checkpoint_interval=3 (in-memory state between durable snapshots)
    must produce the exact same crawl: identical trace, seen set, and
    final frontier after the run's closing flush."""
    _, responses, robots = web
    fast = SparkCrawler(
        spark,
        Catalog(str(tmp_path_factory.mktemp("crawlcat-fast"))),
        spark.createDataFrame(responses),
        spark.createDataFrame(robots),
        CFG,
        n_bloom_shards=4,
        checkpoint_interval=3,
    )
    fast.init_from_seeds(webgen.seed_urls(SEED, N_HOSTS, PAGES_BASE, N_SEEDS))
    fast.run()
    assert _spark_trace(fast) == _spark_trace(spark_crawler)
    a = {r["url_hash"] for r in fast.cat.read(spark, "seen").collect()}
    b = {r["url_hash"] for r in spark_crawler.cat.read(spark, "seen").collect()}
    assert a == b
    fa = {r["url_hash"] for r in fast.cat.read(spark, "frontier").collect()}
    fb = {r["url_hash"] for r in spark_crawler.cat.read(spark, "frontier").collect()}
    assert fa == fb


def test_resume_from_checkpoint(spark, web, tmp_path_factory, spark_crawler):
    """Kill after 4 waves, resume in a fresh SparkCrawler, assert the final
    state is identical to the uninterrupted run (north_rule resumability)."""
    tmp = tmp_path_factory.mktemp("crawlcat-resume")
    first = _run_spark_crawl(spark, web, tmp, max_waves=4)
    assert first.wave == 4

    _, responses, robots = web
    resumed = SparkCrawler(
        spark,
        Catalog(str(tmp)),
        spark.createDataFrame(responses),
        spark.createDataFrame(robots),
        CFG,
        n_bloom_shards=4,
    )
    resumed.resume()
    assert resumed.wave == 4
    resumed.run()

    assert _spark_trace(resumed) == _spark_trace(spark_crawler)
    a = {r["url_hash"] for r in resumed.cat.read(spark, "seen").collect()}
    b = {r["url_hash"] for r in spark_crawler.cat.read(spark, "seen").collect()}
    assert a == b


def test_host_budget_override_caps_per_host(spark, web, tmp_path_factory):
    """Quality-steering hook (operators/budget.py apply side): a
    per-host budget frame overrides the global max_pages_per_host for
    the hosts it names — budgeted hosts stop early, unnamed hosts keep
    the global cap, and with budgets == global cap for every host the
    trace is IDENTICAL to the unsteered crawl (the default-off hook
    cannot perturb reference-trace behavior)."""
    _, responses, robots = web

    def mk(tmp, budgets):
        cat = Catalog(str(tmp))
        c = SparkCrawler(
            spark,
            cat,
            spark.createDataFrame(responses),
            spark.createDataFrame(robots),
            CFG,
            n_bloom_shards=4,
            host_budgets=budgets,
        )
        c.init_from_seeds(webgen.seed_urls(SEED, N_HOSTS, PAGES_BASE, N_SEEDS))
        c.run()
        return c

    # pick two hosts that fetch the full 5 pages in the unsteered run.
    # budgets are keyed by the POLITENESS key (host:port,
    # functions.exprs.host_key_col) — derived from each trace URL.
    def key_of(url):
        netloc = url.split("/")[2]
        if ":" in netloc:
            return netloc
        return netloc + (":443" if url.startswith("https") else ":80")

    base = mk(tmp_path_factory.mktemp("bud-base"), None)
    per_host = {}
    for w, url, d, oc in _spark_trace(base):
        if oc == "fetched":
            h = key_of(url)
            per_host[h] = per_host.get(h, 0) + 1
    full = sorted(h for h, n in per_host.items() if n == CFG.max_pages_per_host)
    assert len(full) >= 2, per_host
    h_cut = full[0]

    budgets = spark.createDataFrame(
        [(h_cut, 2)], "host string, budget int"
    )
    steered = mk(tmp_path_factory.mktemp("bud-steer"), budgets)
    got = {}
    for w, url, d, oc in _spark_trace(steered):
        if oc == "fetched":
            h = key_of(url)
            got[h] = got.get(h, 0) + 1
    assert got[h_cut] == 2
    # an unbudgeted host still reaches the global cap
    assert any(got.get(h, 0) == CFG.max_pages_per_host for h in full[1:])

    # budgets equal to the global cap everywhere == no steering at all
    hosts_all = sorted(
        r["host"]
        for r in base.cat.read(spark, "hosts").select("host").distinct().collect()
    )
    neutral = spark.createDataFrame(
        [(h, CFG.max_pages_per_host) for h in hosts_all],
        "host string, budget int",
    )
    same = mk(tmp_path_factory.mktemp("bud-neutral"), neutral)
    assert _spark_trace(same) == _spark_trace(base)
