"""Structured Streaming skins: seed ingest (foreachBatch) + windowed
trace telemetry, both driven with availableNow triggers."""

from __future__ import annotations

import os

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__spark import webgen
from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog
from distributed_web_search_engine_crawler_indexing_pagerank__spark.oracle.simulator import (
    CrawlConfig,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport.urlnorm import (
    extract_host_key,
    normalize_seed_url,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.crawl import (
    SparkCrawler,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.streaming.crawl_stream import (
    seed_ingest_stream,
    trace_window_stream,
)

SEED, N_HOSTS, PAGES = 11, 10, 12


@pytest.fixture()
def crawler(spark, tmp_path):
    _, responses, robots = webgen.gen_web_local(SEED, N_HOSTS, PAGES)
    cfg = CrawlConfig(target_pages=30, max_pages_per_host=5, max_waves=6, strict_robots=True)
    c = SparkCrawler(
        spark,
        Catalog(str(tmp_path / "cat")),
        spark.createDataFrame(responses),
        spark.createDataFrame(robots),
        cfg,
        n_bloom_shards=4,
    )
    c.init_from_seeds(webgen.seed_urls(SEED, N_HOSTS, PAGES, 2))
    return c


def test_seed_ingest_stream_feeds_frontier(spark, tmp_path, crawler):
    before = crawler.cat.read(spark, "frontier").count()
    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    urls = webgen.seed_urls(SEED, N_HOSTS, PAGES, 6)[2:]  # 4 new hosts
    (seed_dir / "batch1.txt").write_text("\n".join(urls + [urls[0], "javascript:void(0)"]))
    q = seed_ingest_stream(spark, str(seed_dir), crawler, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    after = crawler.cat.read(spark, "frontier")
    assert after.count() == before + len(urls)
    # re-running the stream with no new files is a no-op
    q2 = seed_ingest_stream(spark, str(seed_dir), crawler, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert crawler.cat.read(spark, "frontier").count() == before + len(urls)
    # host state was hydrated for the fresh hosts (step()'s invariant)
    hosts = {r["host"] for r in crawler.cat.read(spark, "hosts").collect()}
    # ingested seeds are actually scheduled — wave 0 picks every host's
    # depth-0 seed, so all ingested URLs must appear in the trace
    crawler.run(max_waves=1)
    traced = {r["url"] for r in crawler.cat.read(spark, "trace").collect()}
    for u in urls:
        norm = normalize_seed_url(u)
        assert extract_host_key(norm) in hosts
        assert norm in traced, f"ingested seed {norm} never scheduled"


def test_trace_window_stream(spark, tmp_path, crawler):
    crawler.run(max_waves=3)
    # point the stream at the trace table's data directories
    snap = crawler.cat.current_snapshot("trace")
    src = os.path.dirname(snap.data_dirs[0])
    out = str(tmp_path / "telemetry")
    q = trace_window_stream(
        spark,
        f"{src}/data-*",
        str(tmp_path / "telemetry-ckpt"),
        out,
        window="2 seconds",
        watermark="0 seconds",
    )
    q.awaitTermination(120)
    res = spark.read.parquet(out)
    assert res.count() > 0
    assert set(res.columns) == {"start", "end", "host", "outcome", "n"}
    # append mode emits only CLOSED windows: with max event time = wave 2
    # (2s) and a 0s watermark, window [0,2) is closed, [2,4) still open —
    # exactly the late-data semantics the watermark is for.
    total = sum(r["n"] for r in res.collect())
    trace = crawler.cat.read(spark, "trace")
    expected = trace.where("wave < 2").count()
    assert total == expected


def test_host_counter_stateful_stream(spark, tmp_path):
    """applyInPandasWithState: per-host counters must accumulate across
    micro-batches AND across query restarts (state store persistence) —
    two installments of trace files, two availableNow runs, final
    counters must equal the batch groupBy over everything."""
    from pyspark.sql import functions as F

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.streaming.crawl_stream import (
        host_counter_stream,
    )

    trace_dir = str(tmp_path / "trace")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "wave int, url string, url_hash string, host string, depth int, outcome string"

    def rows(wave, host, n_fetched, n_other):
        return [
            (wave, f"http://{host}/p{i}", f"h{host}{wave}{i}", host, 1, "fetched")
            for i in range(n_fetched)
        ] + [
            (wave, f"http://{host}/q{i}", f"g{host}{wave}{i}", host, 1, "redirect")
            for i in range(n_other)
        ]

    batch1 = rows(0, "a.test", 3, 1) + rows(0, "b.test", 2, 0)
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(trace_dir)
    host_counter_stream(spark, trace_dir, ckpt, out).awaitTermination(120)

    batch2 = rows(1, "a.test", 1, 2) + rows(1, "c.test", 4, 0)
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(trace_dir)
    host_counter_stream(spark, trace_dir, ckpt, out).awaitTermination(120)

    # latest emitted row per host = the running totals incl. both batches
    w = spark.read.parquet(out)
    latest = {
        r["host"]: (r["events"], r["fetched"], r["last_wave"])
        for r in w.orderBy("events").collect()  # later rows have ≥ events
    }
    assert latest["a.test"] == (7, 4, 1)   # 4+3 events across both runs
    assert latest["b.test"] == (2, 2, 0)
    assert latest["c.test"] == (4, 4, 1)


# --------------------------------------------------------------------------
# stream-stream interval join + watermarked dedup (analytics_stream)
# --------------------------------------------------------------------------

import shutil

from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.streaming.analytics_stream import (
    click_attribution_stream,
    dedup_stream,
)

SF_EVENTS = os.environ.get(
    "TEST_SF_DIR", "/root/testdata/sf0.001"
) + "/events.parquet"


def _events_dir(tmp_path, name):
    d = tmp_path / name
    d.mkdir()
    shutil.copy(SF_EVENTS, d / "part-0.parquet")
    return str(d)


def test_click_attribution_stream_matches_batch_join(spark, tmp_path):
    q = click_attribution_stream(
        spark, _events_dir(tmp_path, "ev1"), gap_seconds=3600,
        query_name="attrib_t",
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM attrib_t").collect())
    )
    ev = spark.read.parquet(SF_EVENTS)
    clicks = ev.where("event_type='click'").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    views = ev.where("event_type='view'").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    exp = sorted(
        map(
            tuple,
            clicks.join(
                views,
                F.expr(
                    "c_user = v_user AND view_ts <= click_ts "
                    "AND view_ts >= click_ts - INTERVAL 3600 SECONDS"
                ),
            )
            .select("click_id", F.col("c_user").alias("user_id"), "view_id")
            .collect(),
        )
    )
    assert got == exp and len(got) > 0


def test_dedup_stream_drops_replayed_rows(spark, tmp_path):
    d = tmp_path / "ev2"
    d.mkdir()
    # the same events file lands twice — an at-least-once transport replay
    shutil.copy(SF_EVENTS, d / "part-0.parquet")
    shutil.copy(SF_EVENTS, d / "part-1.parquet")
    q = dedup_stream(spark, str(d), query_name="dedup_t")
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_t").first()
    n_src = spark.read.parquet(SF_EVENTS).count()
    assert got["n"] == got["d"] == n_src


def test_session_rollup_stream_matches_batch_session_window(spark, tmp_path):
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.streaming.analytics_stream import (
        session_rollup_stream,
    )

    q = session_rollup_stream(
        spark, _events_dir(tmp_path, "ev3"), gap="30 minutes",
        query_name="sess_t",
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM sess_t").collect()))
    assert len(got) > 0

    ev = spark.read.parquet(SF_EVENTS)
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    # append mode + 0s watermark: only sessions CLOSED by the final
    # watermark (= max event time) are emitted; later ones stay open
    exp = sorted(
        map(tuple, batch.where(F.col("session_end") <= F.lit(max_ts)).collect())
    )
    assert got == exp


def test_hll_sketch_stream_matches_batch_after_micro_batches(spark, tmp_path):
    """Streaming sketch parity (r4 verdict #8): fold HLL registers over
    N micro-batches (two availableNow runs, restart in between), then
    the estimate from the folded catalog table must EQUAL the batch
    hll_distinct over the union of all batches — same registers, same
    estimate, constant state per group."""
    from pyspark.sql import functions as F

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.sketches import (
        HLL_M,
        hll_distinct,
        hll_estimate,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.streaming.crawl_stream import (
        hll_sketch_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "cat"))
    schema = "grp string, uid string"

    def batch(lo, hi, grp):
        return [(grp, f"user-{i}") for i in range(lo, hi)]

    # batch 1+2 in the first run (two files), batch 3 after a restart;
    # overlapping uid ranges exercise cross-batch idempotence
    spark.createDataFrame(batch(0, 300, "a") + batch(0, 50, "b"), schema) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(batch(150, 450, "a"), schema) \
        .write.mode("append").parquet(src)
    hll_sketch_stream(
        spark, src, ckpt, cat, key="uid", by=["grp"], schema=schema
    ).awaitTermination(120)

    spark.createDataFrame(batch(25, 200, "b"), schema) \
        .write.mode("append").parquet(src)
    hll_sketch_stream(
        spark, src, ckpt, cat, key="uid", by=["grp"], schema=schema
    ).awaitTermination(120)

    # folded state is constant-size: ≤ HLL_M rows per group
    folded = cat.read(spark, "hll_registers")
    assert folded.count() <= 2 * HLL_M
    streamed = {
        r["grp"]: r["est_distinct"]
        for r in hll_estimate(folded, ["grp"]).collect()
    }
    everything = spark.createDataFrame(
        batch(0, 450, "a") + batch(0, 200, "b"), schema
    )
    batch_est = {
        r["grp"]: r["est_distinct"]
        for r in hll_distinct(everything, "uid", ["grp"]).collect()
    }
    assert streamed == batch_est and set(streamed) == {"a", "b"}


def test_kmv_sketch_stream_matches_batch_after_micro_batches(spark, tmp_path):
    """Streaming KMV parity: fold signatures over 3 micro-batches (two
    availableNow runs, restart in between, overlapping uid ranges), then
    the estimate from the folded signature must EQUAL the batch
    kmv_distinct over the union of all batches, with state capped at
    |groups|*k rows."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.sketches import (
        kmv_distinct,
        kmv_estimate_from_signature,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.streaming.crawl_stream import (
        kmv_sketch_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "cat"))
    schema = "grp string, uid string"
    k = 32

    def batch(lo, hi, grp):
        return [(grp, f"user-{i}") for i in range(lo, hi)]

    spark.createDataFrame(batch(0, 300, "a") + batch(0, 20, "b"), schema) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(batch(150, 450, "a"), schema) \
        .write.mode("append").parquet(src)
    kmv_sketch_stream(
        spark, src, ckpt, cat, key="uid", by=["grp"], k=k, schema=schema
    ).awaitTermination(120)

    spark.createDataFrame(batch(5, 200, "b"), schema) \
        .write.mode("append").parquet(src)
    kmv_sketch_stream(
        spark, src, ckpt, cat, key="uid", by=["grp"], k=k, schema=schema
    ).awaitTermination(120)

    folded = cat.read(spark, "kmv_signature")
    assert folded.count() <= 2 * k
    streamed = {
        r["grp"]: r["est_distinct"]
        for r in kmv_estimate_from_signature(folded, ["grp"], k).collect()
    }
    everything = spark.createDataFrame(
        batch(0, 450, "a") + batch(0, 200, "b"), schema
    )
    batch_est = {
        r["grp"]: r["est_distinct"]
        for r in kmv_distinct(everything, "uid", ["grp"], k).collect()
    }
    assert streamed == batch_est and set(streamed) == {"a", "b"}
    # group b crossed k only via the merged state; group a is capped
    assert streamed["a"] != 450.0  # estimate, not exact count


def test_cms_sketch_stream_matches_batch_after_micro_batches(spark, tmp_path):
    """Streaming CMS parity: summed per-batch sketches equal the batch
    sketch over the union (counters additive over the stream's disjoint
    micro-batches); probe estimates agree exactly and state stays d*w."""
    from pyspark.sql import functions as F

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.sketches import (
        CMS_D,
        CMS_W,
        cms_estimate,
        cms_sketch,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.streaming.crawl_stream import (
        cms_sketch_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "cat"))
    schema = "url string"

    def batch(spec):
        # spec: {url: occurrences}
        return [(u,) for u, n in spec.items() for _ in range(n)]

    b1 = {"u-hot": 50, "u-warm": 5, "u-cold": 1}
    b2 = {"u-hot": 30, "u-new": 7}
    b3 = {"u-hot": 20, "u-warm": 5, "u-cold": 2}
    spark.createDataFrame(batch(b1), schema).write.mode("append").parquet(src)
    spark.createDataFrame(batch(b2), schema).write.mode("append").parquet(src)
    cms_sketch_stream(
        spark, src, ckpt, cat, key="url", schema=schema
    ).awaitTermination(120)
    spark.createDataFrame(batch(b3), schema).write.mode("append").parquet(src)
    cms_sketch_stream(
        spark, src, ckpt, cat, key="url", schema=schema
    ).awaitTermination(120)

    folded = cat.read(spark, "cms_sketch")
    assert folded.count() <= CMS_D * CMS_W
    # total mass conserved: sum over any hash row == total events
    total = sum(sum(s.values()) for s in (b1, b2, b3))
    per_row = {
        r["_row"]: r["s"]
        for r in folded.groupBy("_row").agg(F.sum("_cnt").alias("s")).collect()
    }
    assert all(v == total for v in per_row.values())

    keys = spark.createDataFrame(
        [("u-hot",), ("u-warm",), ("u-cold",), ("u-new",), ("u-absent",)],
        schema,
    )
    streamed = {
        r["url"]: r["est_count"]
        for r in cms_estimate(keys, folded, "url").collect()
    }
    everything = spark.createDataFrame(
        batch(b1) + batch(b2) + batch(b3), schema
    )
    batch_probe = {
        r["url"]: r["est_count"]
        for r in cms_estimate(
            keys, cms_sketch(everything, "url"), "url"
        ).collect()
    }
    assert streamed == batch_probe
    # CMS never undercounts; with d*w >> 5 keys the estimates are exact
    assert streamed["u-hot"] == 100 and streamed["u-absent"] == 0


def test_cms_sketch_stream_replay_does_not_double_count(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the catalog commit
    and the streaming checkpoint commit re-delivers the batch. The
    additive CMS fold must be idempotent under that replay (r5 ADVICE):
    simulate the crash by wiping the checkpoint after the catalog commit
    — the re-run re-delivers the same files under the same batch id, and
    the stream_batch guard must skip the merge, conserving total mass."""
    from pyspark.sql import functions as F

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.streaming.crawl_stream import (
        cms_sketch_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "cat"))
    schema = "url string"
    rows = [("u-hot",)] * 50 + [("u-cold",)] * 3
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    cms_sketch_stream(spark, src, ckpt, cat, key="url", schema=schema).awaitTermination(120)

    import shutil

    shutil.rmtree(ckpt)  # crash simulation: state committed, checkpoint lost
    cms_sketch_stream(spark, src, ckpt, cat, key="url", schema=schema).awaitTermination(120)

    folded = cat.read(spark, "cms_sketch")
    per_row = [
        r["s"] for r in folded.groupBy("_row").agg(F.sum("_cnt").alias("s")).collect()
    ]
    # without the guard this is 2 * len(rows)
    assert all(s == len(rows) for s in per_row)


def test_budget_stats_stream_matches_batch_after_micro_batches(spark, tmp_path):
    """Streaming quality steering: host-stats folded over 3 micro-batches
    (restart in between) yield EXACTLY the budgets of the one-shot batch
    path over the union. Qualities are dyadic rationals (0.25/0.5/0.75)
    so floating-point sums are exact under any fold order and equality
    is bitwise, not approximate."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.budget import (
        budget_from_stats,
        host_crawl_budget,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.streaming.crawl_stream import (
        budget_stats_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "cat"))
    schema = "doc_id long, host string, quality double, is_dup boolean"

    def rows(lo, n, host, q, dup_every):
        return [
            (lo + i, host, q, dup_every > 0 and i % dup_every == 0)
            for i in range(n)
        ]

    b1 = rows(0, 30, "a:443", 0.75, 0) + rows(100, 10, "b:443", 0.5, 2)
    b2 = rows(200, 25, "a:443", 0.25, 5) + rows(300, 4, "c:80", 0.5, 0)
    b3 = rows(400, 12, "b:443", 0.75, 3)
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    budget_stats_stream(
        spark, src, ckpt, cat, schema=schema
    ).awaitTermination(120)
    spark.createDataFrame(b3, schema).write.mode("append").parquet(src)
    budget_stats_stream(
        spark, src, ckpt, cat, schema=schema
    ).awaitTermination(120)

    folded = cat.read(spark, "host_budget_stats")
    assert folded.count() == 3  # |hosts| rows, not |docs| or |batches|
    streamed = {
        r["host"]: (r["q_mean"], r["dup_rate"], r["budget"])
        for r in budget_from_stats(folded, total_budget=1000).collect()
    }
    batch = {
        r["host"]: (r["q_mean"], r["dup_rate"], r["budget"])
        for r in host_crawl_budget(
            spark.createDataFrame(b1 + b2 + b3, schema), total_budget=1000
        ).collect()
    }
    assert streamed == batch and set(streamed) == {"a:443", "b:443", "c:80"}
