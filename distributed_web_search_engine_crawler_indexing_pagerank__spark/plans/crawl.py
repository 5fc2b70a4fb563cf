"""The north-star plan: PySpark-native URL frontier + fetch scheduler.

Implements the deterministic wave-quantized crawl model spec'd in
``oracle/simulator.py`` (which cites every reference semantic,
``src/jobs/Crawler.java``) as a sequence of DataFrame micro-iterations
over snapshot-versioned tables. Trace-equality vs the oracle is enforced
by ``tests/test_crawl_trace.py``.

Spark-first structure of one wave (all declarative; Catalyst handles
pushdown/broadcast; AQE handles skew):

1. host-state hydrate: frontier's unknown hosts anti-join hosts table,
   robots joined in from the synthetic robots source (the reference's
   once-per-host robots fetch + cache, Crawler.java:707-762).
2. politeness + cap gate: hosts filtered on ``T − last_access ≥ delay``
   and ``fetched_count < cap``; these per-host frames are tiny relative
   to the frontier, so they broadcast onto it (window-over-host
   scheduling per the north_star).
3. per-host pick: ``row_number() over (partition by host order by depth,
   disc_wave, parent_hash, link_idx) = 1`` — BFS depth then first-enqueue
   order; throttled hosts' URLs are simply not selected (= reference
   "throttled stays queued", Crawler.java:193-196,408-420).
4. fetch: selected ⨝ fetch_responses (the no-network stand-in for
   HEAD/GET; a production fetcher slots in behind the same join contract)
   + robots path gate; outcome decided by one column expression.
5. link discovery: outlinks pandas UDF (C10–C13) + ``posexplode``;
   redirect Locations normalized the same way; Bloom-shard pre-pass +
   exact anti-join vs seen; cap filter; priority-min merge into the
   frontier via ``groupBy(url_hash).min(struct(...))``.
6. snapshot commit: frontier overwrite, seen/crawl/trace append, hosts
   overwrite — each with wave id + per-host-shard counters
   (seen/fetched/deferred) in snapshot properties (north_rule lineage).

Scale notes (100 TB / 10^10 frontier): the frontier is hash-partitioned by
host at write time so the per-host window never globally sorts; the seen
ledger is append-only (never rewritten); Bloom shards keep the anti-join
probe local; hot hosts can't skew the fetch stage because selection is
≤1 URL/host/wave by construction (the politeness invariant is also the
skew bound — salting only matters for the *enqueue* stage, where AQE skew
join handles the hot-host link fan-in).
"""

from __future__ import annotations

import math
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import Catalog
from ..functions.udfs import (
    crawl_delay_udf,
    host_key_udf,
    make_robots_allows_udf,
    normalize_redirect_udf,
    outlinks_udf,
    ref_hash_udf,
    url_path_udf,
)
from ..javaport.hasher import ref_hash
from ..javaport.urlnorm import extract_host_key, normalize_seed_url
from ..oracle.simulator import CrawlConfig
from .bloom import BloomShards, shard_of_host

__all__ = ["SparkCrawler", "FRONTIER_SCHEMA", "PRIORITY_COLS"]

PRIORITY_COLS = ["depth", "disc_wave", "parent_hash", "link_idx"]

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", StringType(), False),
        StructField("host", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("disc_wave", IntegerType(), False),
        StructField("parent_hash", StringType(), False),
        StructField("link_idx", IntegerType(), False),
    ]
)

_HOSTS_SCHEMA = (
    "host string, robots_status int, robots_txt string, crawl_delay double, "
    "last_access double, fetched_count int"
)

_REDIRECT_CODES = (301, 302, 303, 307, 308)


class SparkCrawler:
    """Drives the micro-iteration loop over catalog tables.

    ``responses_df``/``robots_df`` are the synthetic web (FIXTURES.md
    §1/§5); in production they are the vectorized HTTP fetch stage and a
    live robots fetcher with the same schemas.
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        responses_df: DataFrame,
        robots_df: DataFrame,
        config: CrawlConfig | None = None,
        n_bloom_shards: int = 16,
        frontier_partitions: int = 32,
    ):
        self.spark = spark
        self.cat = catalog
        self.cfg = config or CrawlConfig()
        self.responses = responses_df
        self.robots = robots_df
        self.bloom = BloomShards(n_shards=n_bloom_shards)
        self.frontier_partitions = frontier_partitions
        self.robots_allows_udf = make_robots_allows_udf(strict=self.cfg.strict_robots)
        self.wave = 0

    # -- setup ---------------------------------------------------------------
    def init_from_seeds(self, seeds: list[str]) -> None:
        """Seed the frontier (Crawler.java:85-127 analogue) and commit wave -1."""
        rows, seen_hashes = [], set()
        for i, raw in enumerate(seeds):
            url = normalize_seed_url(raw)
            if url is None:
                continue
            h = ref_hash(url)
            if h in seen_hashes:
                continue
            seen_hashes.add(h)
            rows.append((url, h, extract_host_key(url), 0, -1, "", i))
        frontier = self.spark.createDataFrame(rows, FRONTIER_SCHEMA)
        self._commit_frontier(frontier, wave=-1)
        empty = self.spark.createDataFrame([], "url_hash string, url string")
        self.cat.write("seen", empty, properties={"wave": -1})
        self.cat.write(
            "hosts", self.spark.createDataFrame([], _HOSTS_SCHEMA), properties={"wave": -1}
        )
        self.cat.write(
            "crawl",
            self.spark.createDataFrame(
                [],
                "url string, url_hash string, host string, response_code int, "
                "content_type string, page binary, length int, depth int, wave int",
            ),
            properties={"wave": -1, "pages": 0},
        )
        self.cat.write(
            "trace",
            self.spark.createDataFrame(
                [],
                "wave int, url string, url_hash string, host string, depth int, outcome string",
            ),
            properties={"wave": -1},
        )
        self.wave = 0

    def resume(self) -> None:
        """Restart from the current snapshots (north_rule resumability):
        wave counter from the frontier snapshot, Bloom shards rebuilt
        exactly from the seen ledger."""
        snap = self.cat.current_snapshot("frontier")
        if snap is None:
            raise RuntimeError("no frontier snapshot to resume from")
        self.wave = int(snap.properties["wave"]) + 1
        seen = self.cat.read(self.spark, "seen")
        seen_h = seen.withColumn("host", host_key_udf(F.col("url")))
        self.bloom.build_from_seen(seen_h)

    def _commit_frontier(self, frontier: DataFrame, wave: int, counters: dict | None = None):
        f = frontier.repartition(self.frontier_partitions, "host")
        self.cat.write(
            "frontier",
            f,
            properties={"wave": wave, **(counters or {})},
        )

    # -- one wave --------------------------------------------------------------
    def step(self) -> dict:
        """One micro-iteration. Returns counters; commits all snapshots."""
        spark, cfg, wave = self.spark, self.cfg, self.wave
        t = wave * cfg.wave_seconds

        frontier = self.cat.read(spark, "frontier")
        hosts = self.cat.read(spark, "hosts")
        seen = self.cat.read(spark, "seen")

        # (1) hydrate host state for hosts newly present in the frontier —
        #     the once-per-host robots fetch + Crawl-delay parse.
        new_hosts = (
            frontier.select("host")
            .distinct()
            .join(hosts.select("host"), "host", "left_anti")
            .join(self.robots, "host", "left")
            .select(
                "host",
                F.coalesce("robots_status", F.lit(404)).alias("robots_status"),
                "robots_txt",
                crawl_delay_udf(
                    F.when(F.col("robots_status") == 200, F.col("robots_txt"))
                ).alias("crawl_delay"),
                F.lit(None).cast(DoubleType()).alias("last_access"),
                F.lit(0).alias("fetched_count"),
            )
        )
        hosts = hosts.unionByName(new_hosts).localCheckpoint(eager=True)

        capped = hosts.where(F.col("fetched_count") >= cfg.max_pages_per_host).select("host")
        eligible = hosts.where(
            (F.col("fetched_count") < cfg.max_pages_per_host)
            & (
                F.col("last_access").isNull()
                | (F.lit(t) - F.col("last_access") >= F.col("crawl_delay"))
            )
        ).select("host")

        # (4 - spec) retire queued URLs of capped hosts straight to seen.
        retired = frontier.join(F.broadcast(capped), "host", "left_semi")
        live = frontier.join(F.broadcast(capped), "host", "left_anti")

        # (3) per-host pick: one URL per eligible host, BFS priority.
        w = Window.partitionBy("host").orderBy(*PRIORITY_COLS)
        selected = (
            live.join(F.broadcast(eligible), "host", "left_semi")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

        # (4) fetch + outcome. Selected is ≤1 row/host — the small side of
        # both joins; Catalyst/AQE broadcasts it into the responses scan.
        sel = (
            selected.join(hosts.select("host", "robots_status", "robots_txt"), "host")
            .withColumn("_path", url_path_udf(F.col("url")))
            .withColumn(
                "_allowed",
                self.robots_allows_udf(
                    F.col("robots_txt"), F.col("robots_status"), F.col("_path")
                ),
            )
        )
        proc = sel.join(self.responses, "url", "left")
        outcome = (
            F.when(~F.col("_allowed"), F.lit("robots_disallowed"))
            .when(F.col("head_status").isNull(), F.lit("unfetchable"))
            .when(
                F.col("head_status").isin(*_REDIRECT_CODES), F.lit("redirect")
            )
            .when(F.col("head_status") != 200, F.concat(F.lit("status_"), F.col("head_status")))
            .when(
                F.col("content_language").isNotNull()
                & ~F.lower(F.col("content_language")).startswith("en"),
                F.lit("non_english"),
            )
            .when(
                ~F.contains(F.lower(F.coalesce(F.col("content_type"), F.lit(""))), F.lit("text/html")),
                F.lit("non_html"),
            )
            .otherwise(F.lit("fetched"))
        )
        proc = proc.withColumn("outcome", outcome).localCheckpoint(eager=True)

        # (5a) saved pages: byte-capped GET body (Crawler.java:312-329).
        saved = (
            proc.where(F.col("outcome") == "fetched")
            .withColumn("page", F.expr(f"substring(body, 1, {cfg.byte_cap})"))
            .select(
                "url",
                "url_hash",
                "host",
                F.lit(200).alias("response_code"),
                "content_type",
                "page",
                F.length("page").cast(IntegerType()).alias("length"),
                "depth",
                F.lit(wave).alias("wave"),
            )
            .localCheckpoint(eager=True)
        )

        # (5b) link discovery: page outlinks + redirect targets.
        links = (
            saved.select(
                F.col("url_hash").alias("parent_hash"),
                F.col("depth").alias("_pdepth"),
                F.posexplode(outlinks_udf(F.col("url"), F.col("page"))).alias(
                    "link_idx", "child_url"
                ),
            )
        )
        redirects = (
            proc.where((F.col("outcome") == "redirect") & F.col("location").isNotNull())
            .select(
                F.col("url_hash").alias("parent_hash"),
                F.col("depth").alias("_pdepth"),
                F.lit(-1).alias("link_idx"),
                normalize_redirect_udf(F.col("url"), F.col("location")).alias("child_url"),
            )
            .where(F.col("child_url").isNotNull())
        )
        fresh = (
            links.unionByName(redirects)
            .select(
                F.col("child_url").alias("url"),
                ref_hash_udf(F.col("child_url")).alias("url_hash"),
                host_key_udf(F.col("child_url")).alias("host"),
                (F.col("_pdepth") + 1).cast(IntegerType()).alias("depth"),
                F.lit(wave).cast(IntegerType()).alias("disc_wave"),
                "parent_hash",
                F.col("link_idx").cast(IntegerType()),
            )
        )

        # (6-state) hosts update before the enqueue cap filter (spec step 7
        # uses end-of-wave counts).
        touched = proc.where(F.col("outcome") != "robots_disallowed").select("host").distinct()
        saves_per_host = saved.groupBy("host").agg(F.count("*").alias("_saves"))
        hosts_new = (
            hosts.join(touched.withColumn("_touch", F.lit(True)), "host", "left")
            .join(saves_per_host, "host", "left")
            .select(
                "host",
                "robots_status",
                "robots_txt",
                "crawl_delay",
                F.when(F.col("_touch"), F.lit(t)).otherwise(F.col("last_access")).alias(
                    "last_access"
                ),
                (F.col("fetched_count") + F.coalesce(F.col("_saves"), F.lit(0)))
                .cast(IntegerType())
                .alias("fetched_count"),
            )
            .localCheckpoint(eager=True)
        )

        # seen additions: all selected (every outcome is terminal) + retired.
        seen_add = (
            selected.select("url_hash", "url", "host")
            .unionByName(retired.select("url_hash", "url", "host"))
            .localCheckpoint(eager=True)
        )
        # (5c) enqueue filter: cap (end-of-wave counts) + unseen. This
        # wave's terminals are not in the Bloom bitmaps yet, so they get an
        # explicit broadcast anti-join (seen_add is ≤1 row/host — tiny);
        # the Bloom pre-pass + exact anti-join covers all prior waves.
        over_cap = hosts_new.where(F.col("fetched_count") >= cfg.max_pages_per_host).select("host")
        fresh = fresh.join(F.broadcast(over_cap), "host", "left_anti")
        fresh = fresh.join(F.broadcast(seen_add.select("url_hash")), "url_hash", "left_anti")
        fresh = self.bloom.filter_unseen(spark, fresh, seen)

        # priority-min merge: dedups fresh vs itself and vs the remaining
        # frontier, keeping the best (depth, disc_wave, parent_hash,
        # link_idx) per url_hash — first-writer-wins (Crawler.java:376-388).
        remaining = live.join(
            selected.select("url_hash").withColumnRenamed("url_hash", "url_hash"),
            "url_hash",
            "left_anti",
        )
        merged = (
            remaining.unionByName(fresh)
            .groupBy("url_hash")
            .agg(
                F.min(F.struct(*PRIORITY_COLS, "url", "host")).alias("_s")
            )
            .select("url_hash", "_s.url", "_s.host", *[f"_s.{c}" for c in PRIORITY_COLS])
            .localCheckpoint(eager=True)
        )

        trace_add = proc.select(
            F.lit(wave).alias("wave"), "url", "url_hash", "host", "depth", "outcome"
        )

        # (6) counters per host shard (north_rule lineage + metrics).
        shard = shard_of_host(F.col("host"), self.bloom.n_shards)
        counters = {
            "fetched_by_shard": _shard_counts(saved, shard),
            "seen_by_shard": _shard_counts(seen_add, shard),
            "deferred_by_shard": _shard_counts(merged, shard),
        }
        n_saved = saved.count()
        n_selected = seen_add.count()

        # update the driver-side Bloom shards with this wave's terminals
        # (≤1/host — small), keeping zero false negatives across waves.
        add_rows = seen_add.select(
            "url_hash", shard_of_host(F.col("host"), self.bloom.n_shards).alias("shard")
        ).collect()
        self.bloom.add((r["url_hash"], r["shard"]) for r in add_rows)

        # commit snapshots
        props = {"wave": wave, "config": asdict(cfg), **counters}
        self._commit_frontier(merged, wave=wave, counters=counters)
        self.cat.write("seen", seen_add.select("url_hash", "url"), mode="append", properties=props)
        self.cat.write("hosts", hosts_new, properties=props)
        self.cat.write("crawl", saved, mode="append", properties={**props, "pages": n_saved})
        self.cat.write("trace", trace_add, mode="append", properties=props)

        self.wave += 1
        return {
            "wave": wave,
            "selected": n_selected,
            "saved": n_saved,
            "frontier": merged.count(),
            **counters,
        }

    # -- driver loop -------------------------------------------------------------
    def total_pages(self) -> int:
        return self.cat.read(self.spark, "crawl").count()

    def run(self, max_waves: int | None = None, verbose: bool = False) -> int:
        """Micro-iterate until target pages, empty frontier, or wave cap.
        Returns the number of waves executed in this call."""
        limit = max_waves if max_waves is not None else self.cfg.max_waves
        executed = 0
        while self.wave < limit:
            if self.total_pages() >= self.cfg.target_pages:
                break
            if self.cat.read(self.spark, "frontier").limit(1).count() == 0:
                break
            stats = self.step()
            executed += 1
            if verbose:
                print(f"wave {stats['wave']}: selected={stats['selected']} saved={stats['saved']} frontier={stats['frontier']}")
            if stats["selected"] == 0 and stats["frontier"] == 0:
                break
        return executed


def _shard_counts(df: DataFrame, shard_col) -> dict[str, int]:
    rows = df.groupBy(shard_col.alias("shard")).agg(F.count("*").alias("n")).collect()
    return {str(r["shard"]): int(r["n"]) for r in rows}
