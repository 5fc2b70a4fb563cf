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
5. page persist + link extraction in ONE body pass: the staged crawl
   parquet materializes each page's ordered crawlable outlinks
   (C10–C13 pandas UDF) next to the capped body, so link discovery is a
   column-pruned scan (never re-reads page bytes): ``posexplode`` +
   JVM-side identity (functions.exprs) + redirect Locations; Bloom-shard
   pre-pass + exact anti-join vs seen; cap filter; priority-min merge
   into the frontier via ``groupBy(url_hash).min(struct(...))``.
6. snapshot commit: frontier overwrite, seen/crawl/trace append (seen
   from per-wave staged dirs — never collected), hosts as an O(touched)
   delta append with latest-wins reads, Bloom shard table folded
   executor-side — each with wave id + per-host-shard counters
   (seen/fetched/deferred) in snapshot properties (north_rule lineage).

Worker-pool discipline (measured, sandbox): a stage must never chain two
Arrow python runners per task — peak worker demand is runners×cores and
a burst past the warm pool forks new workers whose pandas imports
serialize under full CPU load. Every python kernel here sits in its own
stage (outlinks in the body-pass write, robots gate in broadcast builds,
Bloom probe in the flagged materialization); everything else is
whole-stage-codegen column expressions.

Scale notes (100 TB / 10^10 frontier): the frontier is hash-partitioned by
host at write time so the per-host window never globally sorts; the seen
ledger is append-only (never rewritten); the hosts table appends only
touched rows per durable wave (merge-on-read + scheduled compaction);
Bloom shards are a catalog table probed/updated where the candidates
live, with per-task memory O(one shard); hot hosts can't skew the fetch stage because selection is
≤1 URL/host/wave by construction (the politeness invariant is also the
skew bound — salting only matters for the *enqueue* stage, where AQE skew
join handles the hot-host link fan-in).
"""

from __future__ import annotations

import time
from dataclasses import asdict

from pyspark.sql import DataFrame, Observation, SparkSession, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import Catalog
from ..functions.exprs import host_key_col, ref_hash_col, url_path_col
from ..functions.udfs import (
    crawl_delay_udf,
    make_robots_allows_udf,
    normalize_redirect_udf,
    outlinks_udf,
)
from ..javaport.hasher import ref_hash
from ..javaport.urlnorm import extract_host_key, normalize_seed_url
from ..oracle.simulator import CrawlConfig
from .bloom import BloomStore, shard_of_host

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

# Rewrite the hosts table in full after this many incremental (delta)
# commits — bounds the merge-on-read resolution at ~(1 + COMPACT_EVERY)×
# the live host count while keeping per-commit write volume O(touched).
HOSTS_COMPACT_EVERY = 8

# Same schedule for the frontier: durable commits append (upserts +
# consumed-tombstones) = O(wave churn) rows; a full rewrite every K
# delta commits bounds the merge-on-read resolution. At the north star
# the frontier is the largest table in the system — rewriting it per
# durable snapshot (r3) was the remaining O(all-state) write.
FRONTIER_COMPACT_EVERY = 8


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
        checkpoint_interval: int = 1,
        expected_urls: int | None = None,
        host_budgets: DataFrame | None = None,
    ):
        self.spark = spark
        self.cat = catalog
        self.cfg = config or CrawlConfig()
        # opt-in quality steering (operators/budget.py): a (host, budget)
        # frame overrides the global max_pages_per_host cap per host —
        # hosts absent from it keep the global cap. None (the default)
        # preserves reference-trace behavior exactly. Refresh between
        # waves via set_host_budgets (the content→frontier feedback loop).
        self._host_budgets: DataFrame | None = None
        if host_budgets is not None:
            self.set_host_budgets(host_budgets)
        self.responses = responses_df
        self.robots = robots_df
        # capacity planning: pre-size the Bloom shards for the expected
        # URL-seen population (power-of-two bits, ≥10 bits/key with 2×
        # headroom) so no mid-crawl rebuild pauses a wave; ensure_capacity
        # stays as the safety net if the estimate was low.
        bits_per_shard = 1 << 17
        if expected_urls:
            from .bloom import BITS_PER_KEY

            need = 2 * BITS_PER_KEY * expected_urls // n_bloom_shards
            while bits_per_shard < need:
                bits_per_shard *= 2
        # catalog-backed shard-routed Bloom: probes cogroup candidates
        # with shard-local bitmap rows, updates fold additions into the
        # shards executor-side — no all-shards broadcast, no per-wave
        # driver collect (the r2 scale-killer).
        self.bloom = BloomStore(
            catalog, n_shards=n_bloom_shards, bits_per_shard=bits_per_shard
        )
        self.frontier_partitions = frontier_partitions
        self.robots_allows_udf = make_robots_allows_udf(strict=self.cfg.strict_robots)
        self.wave = 0
        # Durable-snapshot cadence: 1 = every wave (maximum durability);
        # K>1 keeps state in executor memory (localCheckpoint) between
        # snapshots and flushes buffered appends at each K-th wave. Waves
        # are deterministic, so a crash mid-interval replays identically
        # from the last durable snapshot — no duplicates (buffered appends
        # were never durable).
        self.checkpoint_interval = max(1, checkpoint_interval)
        self._mem: dict[str, DataFrame] = {}
        self._buf_crawl: list[str] = []  # staged crawl data dirs
        self._buf_trace: list[DataFrame] = []
        self._buf_seen_dirs: list[str] = []  # staged seen data dirs
        # per-wave dirty-host key frames (lazy, lean) — the hosts delta
        # commit joins these against the current hosts state so each
        # durable snapshot appends only O(touched) host rows.
        self._dirty_hosts: list[DataFrame] = []
        # bloom shards touched since the last durable fold (from the
        # per-wave Observation counters) — lets the fold prune its
        # bitmap-side scan and append O(dirty shards) rows
        self._dirty_shards: set[int] = set()
        self._hosts_ver = 0  # monotonic hosts version (latest-wins reads)
        self._hosts_commits_since_compact = 0
        # frontier merge-on-read state: monotonic version + compaction
        # schedule + the wave the current durable interval started at
        # (upsert rows are merged rows whose winning priority carries a
        # disc_wave from this interval; the staged seen additions are the
        # tombstone side — selected ∪ retired is exactly what left the
        # frontier)
        self._frontier_ver = 0
        self._frontier_commits_since_compact = 0
        self._interval_start = 0
        # True while fast-path state is ahead of the durable tables
        self._mem_dirty = False
        # checkpointed proc frames kept alive while fast-path trace
        # projections reference them (released at the durable commit)
        self._keep: list[DataFrame] = []
        self._wave_props: list[dict] = []
        # wall-clock per named step() section, accumulated across waves —
        # the profiler's map of where the per-wave fixed cost lives.
        self.section_secs: dict[str, float] = {}
        self._t_last = 0.0
        # running totals mirrored into snapshot properties so run()'s
        # stop conditions never launch count jobs (north_rule counters)
        self._pages_total = 0
        self._last_frontier_n: int | None = None

    def _tick(self, section: str) -> None:
        now = time.time()
        self.section_secs[section] = self.section_secs.get(section, 0.0) + (
            now - self._t_last
        )
        self._t_last = now

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
        self._write_frontier_full(frontier, {"wave": -1, "frontier_n": len(rows)})
        self._interval_start = 0
        self._last_frontier_n = len(rows)
        self._pages_total = 0
        empty = self.spark.createDataFrame([], "url_hash string, url string")
        self.cat.write("seen", empty, properties={"wave": -1})
        # hydrate seed hosts up front — the hosts table must cover every
        # frontier host (step() relies on this invariant).
        known = self.spark.createDataFrame([], _HOSTS_SCHEMA)
        seed_hosts = self._new_host_rows(frontier.select("host"), known.select("host"))
        self._write_hosts_full(seed_hosts, {"wave": -1})
        self.cat.write(
            "crawl",
            self.spark.createDataFrame(
                [],
                "url string, url_hash string, host string, response_code int, "
                "content_type string, page binary, length int, depth int, wave int, "
                "outlinks array<string>",
            ),
            properties={"wave": -1, "pages": 0, "total_pages": 0},
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
        wave counter from the frontier snapshot; the Bloom shard table is
        REUSED when its snapshot matches the frontier wave (no rebuild —
        it is durable state now), else rebuilt exactly from the seen
        ledger (e.g. a crash between the seen and bloom commits, or a
        pre-BloomStore snapshot)."""
        snap = self.cat.current_snapshot("frontier")
        if snap is None:
            raise RuntimeError("no frontier snapshot to resume from")
        self.wave = int(snap.properties["wave"]) + 1
        crawl_snap = self.cat.current_snapshot("crawl")
        props = crawl_snap.properties if crawl_snap else {}
        self._pages_total = int(
            props["total_pages"]
            if "total_pages" in props
            else self.cat.read(self.spark, "crawl").count()
        )
        self._last_frontier_n = (
            int(snap.properties["frontier_n"])
            if "frontier_n" in snap.properties
            else None
        )
        hosts_snap = self.cat.current_snapshot("hosts")
        if hosts_snap is not None:
            self._hosts_ver = int(hosts_snap.properties.get("ver", 0))
        fsnaps = self.cat.snapshots("frontier")
        self._frontier_ver = int(snap.properties.get("ver", len(fsnaps)))
        since = 0
        for s in reversed(fsnaps):
            if s.properties.get("compacted"):
                break
            since += 1
        self._frontier_commits_since_compact = since
        self._interval_start = self.wave
        seen = self.cat.read(self.spark, "seen")
        seen_h = seen.withColumn("host", host_key_col(F.col("url")))
        bloom_snap = (
            self.cat.current_snapshot("bloom") if self.cat.exists("bloom") else None
        )
        if bloom_snap is not None and bloom_snap.properties.get("wave") == self.wave - 1:
            self.bloom.m = int(bloom_snap.properties.get("m", self.bloom.m))
            self.bloom.n_keys = int(bloom_snap.properties.get("n_keys", 0))
        else:
            self.bloom.build_from_seen(seen_h, properties={"wave": self.wave - 1})
        # size for what the ledger already holds (rebuilds at the grown
        # size only when the default was outgrown)
        self.bloom.ensure_capacity(seen_h)

    # -- hosts state (merge-on-read deltas) ----------------------------------
    #
    # The reference updates ONE `hosts` row per touched host
    # (Crawler.java:676-678); r2 rewrote the whole hosts table every
    # durable wave — O(all hosts) write amplification that dwarfs the
    # wave's real work at 10^7+ hosts. Now each durable commit APPENDS
    # only the hosts touched (or newly hydrated) in the interval, stamped
    # with a monotonic version `_v`; reads resolve latest-wins per host.
    # Every HOSTS_COMPACT_EVERY delta commits the resolved table is
    # rewritten in full (compaction), bounding read-side row count.

    def _write_hosts_full(self, hosts: DataFrame, props: dict) -> None:
        self._hosts_ver += 1
        self.cat.write(
            "hosts",
            hosts.withColumn("_v", F.lit(self._hosts_ver)),
            properties={**props, "ver": self._hosts_ver, "compacted": True},
        )
        self._hosts_commits_since_compact = 0

    def _write_hosts_delta(self, hosts_full: DataFrame, dirty: DataFrame, props: dict) -> None:
        """Append current rows for dirty hosts only; compact on schedule."""
        if self._hosts_commits_since_compact >= HOSTS_COMPACT_EVERY:
            self._write_hosts_full(hosts_full, props)
            return
        self._hosts_ver += 1
        delta = hosts_full.join(dirty.select("host").distinct(), "host", "semi")
        self.cat.write(
            "hosts",
            delta.withColumn("_v", F.lit(self._hosts_ver)),
            mode="append",
            properties={**props, "ver": self._hosts_ver},
        )
        self._hosts_commits_since_compact += 1

    def set_host_budgets(self, budgets: DataFrame | None) -> None:
        """Install (or clear, with None) a per-host page-budget frame
        (host, budget) that overrides ``cfg.max_pages_per_host`` per
        host — the apply side of the quality→frontier feedback loop
        (``operators.budget.host_crawl_budget`` produces the frame from
        the previous interval's crawled content). ``host`` must be the
        POLITENESS KEY (``host:port``, ``functions.exprs.host_key_col``)
        — the same key the hosts/frontier tables use. Hosts absent from
        the frame keep the global cap; budgets take effect from the next
        ``step()``. The frame is persisted: both cap sites join it every
        wave on the host key the schedule already shuffles on."""
        if self._host_budgets is not None:
            try:
                self._host_budgets.unpersist()
            except Exception:
                pass
        if budgets is None:
            self._host_budgets = None
            return
        self._host_budgets = (
            budgets.select(
                "host", F.col("budget").cast(IntegerType()).alias("_budget")
            )
            .persist()
        )

    def _read_hosts(self) -> DataFrame:
        """Latest-wins resolution of the hosts base + delta rows."""
        df = self.cat.read(self.spark, "hosts")
        w = Window.partitionBy("host").orderBy(F.desc("_v"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_v")
        )

    # -- frontier state (merge-on-read deltas) --------------------------------
    #
    # r3 rewrote the WHOLE frontier at every durable snapshot — at the
    # 10^10-row north star that is the largest O(all-state) write in the
    # system, where the reference touches one queue row per URL
    # (src/kvs/KVSClient.java:259-282). Now each durable commit APPENDS
    # only the wave churn: upsert rows (frontier rows whose winning
    # priority struct was discovered this interval — identified by a
    # disc_wave filter on the already-checkpointed merged frame, zero
    # extra jobs and no fresh-frame buffering) plus tombstone rows for
    # the interval's consumed url_hashes (selected ∪ retired == the seen
    # additions, already staged for the Bloom fold). Reads resolve with
    # the SAME priority-min the in-memory merge applies (min is
    # associative, consumption is monotone — a seen url_hash can never
    # re-enter via the Bloom-gated enqueue), then anti-join tombstones.
    # Every FRONTIER_COMPACT_EVERY delta commits — and once at flush() —
    # the resolved table is rewritten in full, bounding read-side rows.
    # No repartition-by-host on the write: plain parquet carries no
    # partitioner metadata Spark SQL could reuse (bucketed/Iceberg
    # tables would change that).

    def _write_frontier_full(self, frontier: DataFrame, props: dict) -> None:
        self._frontier_ver += 1
        fcols = [f.name for f in FRONTIER_SCHEMA.fields]
        self.cat.write(
            "frontier",
            frontier.select(*fcols)
            .withColumn("_v", F.lit(self._frontier_ver))
            .withColumn("_tomb", F.lit(False)),
            properties={**props, "ver": self._frontier_ver, "compacted": True},
        )
        self._frontier_commits_since_compact = 0

    def _write_frontier_delta(
        self, frontier_full: DataFrame, upserts: DataFrame, consumed: DataFrame,
        props: dict,
    ) -> None:
        """Append O(wave churn) rows: upserts + consumed tombstones;
        compact (full rewrite) on schedule."""
        if self._frontier_commits_since_compact >= FRONTIER_COMPACT_EVERY:
            self._write_frontier_full(frontier_full, props)
            return
        self._frontier_ver += 1
        fcols = [f.name for f in FRONTIER_SCHEMA.fields]
        tombs = consumed.select(
            *[
                F.col("url_hash").alias("url_hash")
                if f.name == "url_hash"
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in FRONTIER_SCHEMA.fields
            ]
        ).withColumn("_tomb", F.lit(True))
        delta = upserts.select(*fcols).withColumn("_tomb", F.lit(False)).unionByName(tombs)
        self.cat.write(
            "frontier",
            delta.withColumn("_v", F.lit(self._frontier_ver)).select(
                *fcols, "_v", "_tomb"
            ),
            mode="append",
            properties={**props, "ver": self._frontier_ver},
        )
        self._frontier_commits_since_compact += 1

    def _read_frontier(self) -> DataFrame:
        """Resolve the delta-backed frontier: priority-min over base +
        upsert rows (exactly the in-memory merge), minus tombstoned
        (consumed) url_hashes appended since the last compaction."""
        df = self.cat.read(self.spark, "frontier")
        tombs = df.where(F.col("_tomb")).select("url_hash")
        return (
            df.where(~F.col("_tomb"))
            .groupBy("url_hash")
            .agg(F.min(F.struct(*PRIORITY_COLS, "url", "host")).alias("_s"))
            .select("url_hash", "_s.url", "_s.host", *[f"_s.{c}" for c in PRIORITY_COLS])
            .join(tombs, "url_hash", "left_anti")
        )

    # -- one wave --------------------------------------------------------------
    def _new_host_rows(self, hosts_df: DataFrame, known_hosts: DataFrame) -> DataFrame:
        """Host-state rows (robots fetch + Crawl-delay parse,
        Crawler.java:707-762) for hosts not yet in the hosts table.
        Hydration happens at enqueue time so the schedule path never pays
        for it — robots content is static, so the timing is unobservable."""
        return (
            hosts_df.distinct()
            .join(known_hosts, "host", "left_anti")
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

    def step(self) -> dict:
        """One micro-iteration. Returns counters; commits all snapshots.

        Shuffle/job discipline — the per-wave fixed cost IS the
        throughput ceiling at scale:
        - hosts covering every frontier host is an invariant maintained
          at enqueue time, so the schedule path starts with ONE
          frontier⨝hosts join (both sides keyed by host; Catalyst reuses
          the exchange for the per-host window).
        - selected vs remaining come from a single window pass — no
          anti-join.
        - the fetch join broadcasts the (≤1 row/host) selected set INTO
          the responses scan (inner broadcast join + tiny anti-join for
          unfetchable URLs) — the responses table is never shuffled.
        - counters ride as Observation metrics on the snapshot writes;
          NO per-wave driver round-trip remains — seen additions are
          staged as data files and the Bloom probe/fold is shard-routed
          executor-side (BloomStore).
        """
        spark, cfg, wave = self.spark, self.cfg, self.wave
        t = wave * cfg.wave_seconds
        self._t_last = time.time()

        frontier = self._mem.get("frontier")
        if frontier is None:
            frontier = self._read_frontier()
        hosts_from_mem = "hosts" in self._mem
        hosts = self._mem.get("hosts") or self._read_hosts()
        if not hosts_from_mem:
            hosts = hosts.persist()
        seen = self._seen_view()
        self._tick("read_state")

        fcols = [f.name for f in FRONTIER_SCHEMA.fields]

        # (2)+(3) politeness & cap gate + per-host pick in one pass:
        # join host state, then a single window classifies every row.
        f = frontier.join(
            hosts.select("host", "crawl_delay", "last_access", "fetched_count"), "host"
        )
        if self._host_budgets is not None:
            # per-host budget override (quality steering). Joined on the
            # host key the classify window shuffles on anyway; hosts not
            # in the budget frame keep the global cap.
            f = f.join(self._host_budgets, "host", "left")
            cap_col = F.coalesce(
                F.col("_budget"), F.lit(cfg.max_pages_per_host)
            )
        else:
            cap_col = F.lit(cfg.max_pages_per_host)
        capped_cond = F.col("fetched_count") >= cap_col
        eligible_cond = F.col("last_access").isNull() | (
            F.lit(t) - F.col("last_access") >= F.col("crawl_delay")
        )
        w = Window.partitionBy("host").orderBy(*PRIORITY_COLS)
        # eager: selected/remaining/retired scan this 3× in one job — a
        # lazy cache lets the scans race and recompute the window.
        classified = f.withColumn("_rn", F.row_number().over(w)).localCheckpoint(eager=True)
        self._tick("classify_ckpt")
        retired = classified.where(capped_cond).select(*fcols)
        selected = classified.where(
            ~capped_cond & eligible_cond & (F.col("_rn") == 1)
        ).select(*fcols)
        remaining = classified.where(
            ~capped_cond & ~(eligible_cond & (F.col("_rn") == 1))
        ).select(*fcols)

        # (4) fetch + outcome. selected is ≤1 row/host — broadcast it into
        # the responses scan (inner); unfetchable = tiny broadcast anti.
        #
        # MEMORY DISCIPLINE: page bodies are never cached in executor
        # memory. The outcome/trace/host logic reads only header columns
        # (the columnar reader prunes `body` from those scans entirely);
        # the bodies flow through exactly ONE pass — responses scan →
        # byte-cap → outlinks UDF → staged crawl parquet — and link
        # discovery reads back only the pruned (url_hash, depth,
        # outlinks) columns, never the bytes.
        sel = (
            selected.join(hosts.select("host", "robots_status", "robots_txt"), "host")
            .withColumn(
                "_allowed",
                self.robots_allows_udf(
                    F.col("robots_txt"), F.col("robots_status"), url_path_col(F.col("url"))
                ),
            )
            # drop robots_txt (KBs/row) BEFORE this frame is broadcast —
            # the downstream joins only need the frontier cols + the gate.
            # NOT materialized: its only consumers are broadcast builds
            # inside the proc job; recomputing this ≤1-row/host frame 2×
            # there costs less than a dedicated barrier job per wave.
            .select(*fcols, "_allowed")
        )
        self._tick("sel_build")
        resp_meta_cols = ["head_status", "location", "content_type", "content_language"]
        resp_meta = self.responses.select("url", *resp_meta_cols)  # body pruned
        found_meta = resp_meta.join(F.broadcast(sel), "url")
        missing = sel.join(F.broadcast(found_meta.select("url")), "url", "left_anti")
        for c in resp_meta_cols:
            missing = missing.withColumn(
                c, F.lit(None).cast(dict(self.responses.dtypes)[c])
            )
        proc = found_meta.unionByName(missing.select(*found_meta.columns))
        outcome = (
            F.when(~F.col("_allowed"), F.lit("robots_disallowed"))
            .when(F.col("head_status").isNull(), F.lit("unfetchable"))
            # Content-Language precedes the 3xx/non-200 checks
            # (Crawler.java:243-247): a non-English redirect never
            # enqueues its Location. isNotNull matches Java's null check —
            # an empty-string header is non-English there too.
            .when(
                F.col("content_language").isNotNull()
                & ~F.lower(F.col("content_language")).startswith("en"),
                F.lit("non_english"),
            )
            .when(F.col("head_status").isin(*_REDIRECT_CODES), F.lit("redirect"))
            .when(F.col("head_status") != 200, F.concat(F.lit("status_"), F.col("head_status")))
            .when(
                ~F.contains(
                    F.lower(F.coalesce(F.col("content_type"), F.lit(""))), F.lit("text/html")
                ),
                F.lit("non_html"),
            )
            .otherwise(F.lit("fetched"))
        )
        # eager (lean — no body column): redirects/touched/trace/saved-keys
        # all scan proc; the race-free materialization is tiny.
        proc = proc.withColumn("outcome", outcome).localCheckpoint(eager=True)
        self._tick("proc_ckpt")

        # (5a) saved pages: the ONE body-bearing pass — responses scan ⨝
        # broadcast(fetched keys) → byte-capped GET body
        # (Crawler.java:312-329) → staged crawl parquet (manifest-committed
        # at the durable snapshot; orphaned by a crash — never duplicated).
        fetched_keys = proc.where(F.col("outcome") == "fetched").select(
            "url", "url_hash", "host", "content_type", "depth"
        )
        saved = (
            self.responses.select("url", "body")
            .join(F.broadcast(fetched_keys), "url")
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
                # C10–C13 extracted IN the body pass: the crawl table
                # materializes each page's ordered crawlable outlinks, so
                # link discovery never re-reads page bytes (and the link
                # graph is queryable without re-parsing HTML).
                outlinks_udf(F.col("url"), F.col("page")).alias("outlinks"),
            )
        )
        n_shards = self.bloom.n_shards
        shard = shard_of_host(F.col("host"), n_shards)
        obs_crawl = Observation(f"crawl-{wave}")
        saved_obs = saved.observe(
            obs_crawl, F.count(F.lit(1)).alias("n"), *_shard_metric_exprs(shard, n_shards)
        )
        crawl_dir = self.cat.stage_data("crawl", saved_obs)
        fetched = obs_crawl.get
        self._tick("crawl_write")
        saved_rb = spark.read.parquet(crawl_dir)  # read-back, columns pruned

        # (5b) link discovery: the materialized outlinks column (+ redirect
        # targets). Column-pruned scan — page bytes are not touched again.
        links = saved_rb.select(
            F.col("url_hash").alias("parent_hash"),
            F.col("depth").alias("_pdepth"),
            F.posexplode(F.col("outlinks")).alias("link_idx", "child_url"),
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
                ref_hash_col(F.col("child_url")).alias("url_hash"),
                host_key_col(F.col("child_url")).alias("host"),
                (F.col("_pdepth") + 1).cast(IntegerType()).alias("depth"),
                F.lit(wave).cast(IntegerType()).alias("disc_wave"),
                "parent_hash",
                F.col("link_idx").cast(IntegerType()),
            )
        )

        # (6-state) hosts update first — spec step 7's cap check uses
        # end-of-wave counts. touched/saves are ≤1 row/host → broadcast.
        # robots_disallowed DOES touch last_access (updateLastAccess runs
        # inside the !robotsAllowed branch, Crawler.java:202); only the
        # HEAD-failure path returns before it (:206-225) ⇒ exclude
        # unfetchable alone.
        touched = proc.where(F.col("outcome") != "unfetchable").select("host").distinct()
        saves_per_host = fetched_keys.groupBy("host").agg(F.count("*").alias("_saves"))
        hosts_updated = (
            hosts.join(F.broadcast(touched.withColumn("_touch", F.lit(True))), "host", "left")
            .join(F.broadcast(saves_per_host), "host", "left")
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
        )

        # seen additions: all selected (every outcome is terminal) + retired.
        seen_add = (
            selected.select("url_hash", "url", "host")
            .unionByName(retired.select("url_hash", "url", "host"))
            .persist()
        )

        # (5c) enqueue filter: this wave's terminals (not in the Bloom
        # bitmaps yet) via tiny broadcast anti-join; all prior waves via
        # Bloom pre-pass + exact anti-join; cap via end-of-wave counts.
        if self._host_budgets is not None:
            over_cap = (
                hosts_updated.join(self._host_budgets, "host", "left")
                .where(
                    F.col("fetched_count")
                    >= F.coalesce(
                        F.col("_budget"), F.lit(cfg.max_pages_per_host)
                    )
                )
                .select("host")
            )
        else:
            over_cap = hosts_updated.where(
                F.col("fetched_count") >= cfg.max_pages_per_host
            ).select("host")
        fresh = fresh.join(F.broadcast(over_cap), "host", "left_anti")
        fresh = fresh.join(F.broadcast(seen_add.select("url_hash")), "url_hash", "left_anti")
        # No materialization needed before the probe: outlinks were
        # extracted in the body pass and identity is JVM-side, so this
        # stage holds exactly ONE Python runner (the probe) — worker-pool
        # discipline: a stage must never chain two Arrow runners per task
        # (2×cores simultaneous workers = spawn storm at high core counts).
        # keep ≥10 bits/key before probing: grows shards (power-of-two) and
        # rebuilds exactly from the COMMITTED ledger when the filter would
        # saturate (staged-interval rows stay covered by the probe's
        # pending set, and counted via n_pending — never rebuilt-in, so
        # the durable fold can't double-count them).
        self.bloom.ensure_capacity(
            self.cat.read(spark, "seen").withColumn("host", host_key_col(F.col("url")))
        )
        # shard-routed probe: candidates cogroup with shard-local bitmap
        # rows; seen-additions staged since the last durable snapshot ride
        # in as pending rows (the bitmap table is only folded at durable
        # commits), so nothing is broadcast and nothing hits the driver.
        pending = None
        if self._buf_seen_dirs:
            pending = spark.read.parquet(*self._buf_seen_dirs).withColumn(
                "host", host_key_col(F.col("url"))
            )
        fresh = self.bloom.filter_unseen(spark, fresh, seen, pending=pending).persist()
        self._tick("links_bloom")
        # (flagged inside filter_unseen is already materialized; fresh is a
        # cheap projection over it + the maybe anti-join)

        # enqueue-time host hydration keeps the invariant: hosts table
        # covers every host present in the next frontier. The new rows are
        # checkpointed (lean, ≤ new hosts) so the hosts-delta commit and
        # the full in-memory hosts frame share one materialization.
        new_host_rows = self._new_host_rows(
            fresh.select("host"), hosts_updated.select("host")
        ).localCheckpoint(eager=True)
        hosts_new = hosts_updated.unionByName(new_host_rows)
        # dirty hosts this wave = touched (politeness/caps changed) + new
        # (lazy projections over checkpointed frames — proc is retained
        # until the durable flush)
        self._dirty_hosts.append(
            touched.select("host").unionByName(new_host_rows.select("host"))
        )

        # priority-min merge: dedups fresh vs itself and vs the remaining
        # frontier, keeping the best (depth, disc_wave, parent_hash,
        # link_idx) per url_hash — first-writer-wins (Crawler.java:376-388).
        #
        # PARTITIONING REUSE (r6, guide §2.4): the merge shuffles by HOST
        # and groups by (host, url_hash) — the same groups, since a URL's
        # hash determines its host, and HashPartitioning(host) satisfies
        # the aggregation's ClusteredDistribution([host, url_hash]). The
        # localCheckpoint preserves that output partitioning, so the NEXT
        # wave's frontier⨝hosts join and per-host classify window reuse
        # it instead of re-exchanging the full frontier by host — the
        # frontier (the largest per-wave table) now crosses the network
        # ONCE per wave, not twice. Hot-host concentration is the same
        # skew class the classify window always had.
        merged = (
            remaining.unionByName(fresh)
            .repartition(self.frontier_partitions, "host")
            .groupBy("host", "url_hash")
            .agg(F.min(F.struct(*PRIORITY_COLS, "url", "host")).alias("_s"))
            .select("url_hash", "_s.url", "host", *[f"_s.{c}" for c in PRIORITY_COLS])
            .persist()
        )

        trace_add = proc.select(
            F.lit(wave).alias("wave"), "url", "url_hash", "host", "depth", "outcome"
        )

        # seen additions are STAGED (Iceberg-style data files, committed
        # at the durable snapshot) instead of collected: the r2 design
        # pulled every wave's additions to the driver (toPandas) to feed
        # the driver-resident Bloom bitmaps — at the 10^10-URL north star
        # that is millions of rows per wave through one process. Counters
        # ride as Observation metrics on the staged write; the bitmaps
        # are folded executor-side at the durable commit, and until then
        # the staged rows serve as the probe's pending set.
        n_shards = self.bloom.n_shards
        obs_seen = Observation(f"seen-{wave}")
        seen_staged = seen_add.observe(
            obs_seen, F.count(F.lit(1)).alias("n"), *_shard_metric_exprs(shard, n_shards)
        ).select("url_hash", "url")
        seen_dir = self.cat.stage_data("seen", seen_staged)
        seen_metrics = obs_seen.get
        self._tick("seen_stage")
        # staged-interval additions count as PENDING (folded — and moved
        # into n_keys — at the durable commit); the by-shard counters also
        # tell the fold exactly which shards are dirty this interval.
        self.bloom.n_pending += int(seen_metrics["n"])
        seen_by_shard = _metrics_to_shards(seen_metrics, n_shards)
        self._dirty_shards.update(
            int(s) for s, n in seen_by_shard.items() if int(n) > 0
        )

        # (6) deferred per-shard counters ride as Observation metrics on
        # the frontier's materializing action (crawl counters already
        # resolved on the staged write above).
        obs_frontier = Observation(f"frontier-{wave}")
        merged_obs = merged.observe(
            obs_frontier, F.count(F.lit(1)).alias("n"), *_shard_metric_exprs(shard, n_shards)
        )

        base_props = {"wave": wave, "config": asdict(cfg), "seen_by_shard": seen_by_shard}
        durable = (wave + 1) % self.checkpoint_interval == 0

        prev_mem = dict(self._mem)
        if durable:
            deferred = self._commit_durable(
                crawl_dir, merged_obs, hosts_new, trace_add, seen_dir, base_props,
                obs_frontier,
            )
        else:
            # fast path: next-wave state in executor memory (lean frames
            # only — page bodies already sit in the staged parquet dir);
            # appends buffered until the next durable snapshot.
            merged_m = merged_obs.localCheckpoint(eager=True)
            deferred = obs_frontier.get
            hosts_m = hosts_new.localCheckpoint(eager=True)
            # the trace projection stays LAZY over the checkpointed proc
            # (retained in _keep until the durable flush) — zero extra
            # materialization jobs for trace buffering.
            self._buf_crawl.append(crawl_dir)
            self._buf_trace.append(trace_add)
            self._buf_seen_dirs.append(seen_dir)
            self._mem = {"frontier": merged_m, "hosts": hosts_m}
            self._mem_dirty = True
            self._keep.append(proc)

        self._tick("commit")

        self._pages_total += int(fetched["n"])
        self._last_frontier_n = int(deferred["n"])
        counters = {
            "seen_by_shard": seen_by_shard,
            "fetched_by_shard": _metrics_to_shards(fetched, n_shards),
            "deferred_by_shard": _metrics_to_shards(deferred, n_shards),
            "pages": int(fetched["n"]),
            "total_pages": self._pages_total,
            "frontier_n": self._last_frontier_n,
        }
        if durable:
            # patch the full per-shard counters into the just-committed
            # snapshots (only known once the observations resolve) — the
            # north_rule's per-partition lineage record.
            final_props = {**counters, "waves": self._wave_props + [base_props["wave"]]}
            for table in ("frontier", "crawl", "seen", "hosts", "trace"):
                self.cat.update_properties(table, final_props)
            self._wave_props = []
        else:
            self._wave_props.append(wave)

        released = (hosts, classified, seen_add, fresh, merged) + (
            (proc,) if durable else ()
        )
        for df in released:
            df.unpersist()
        for df in prev_mem.values():
            df.unpersist()
        self._tick("unpersist_props")

        self.wave += 1
        return {
            "wave": wave,
            "selected": int(seen_metrics["n"]),
            "saved": int(fetched["n"]),
            "frontier": int(deferred["n"]),
            **counters,
        }

    def _commit_durable(
        self, crawl_dir, merged_obs, hosts_new, trace_add, seen_dir, base_props,
        obs_frontier,
    ):
        """Commit all snapshots (flushing any fast-path buffers). Crawl
        and seen data dirs were staged per wave — the commit just
        registers them in the manifest (Iceberg-style: stage files,
        commit metadata); hosts appends only the interval's dirty rows;
        the Bloom shard table folds the interval's staged seen additions
        executor-side. Writes are sequential on purpose: concurrent jobs
        burst the Python-UDF worker pool (measured 10-20s worker-init
        per task)."""
        trace_df = trace_add
        for buf in self._buf_trace:
            trace_df = buf.unionByName(trace_df)
        seen_dirs = self._buf_seen_dirs + [seen_dir]

        self.cat.write(
            "crawl",
            None,
            mode="append",
            properties=base_props,
            staged_dirs=self._buf_crawl + [crawl_dir],
        )
        # materialize the next frontier once (resolves the observation,
        # truncates lineage) and keep it as the in-memory state for the
        # next wave — the durable table is only re-read at resume().
        merged_m = merged_obs.localCheckpoint(eager=True)
        deferred = obs_frontier.get
        additions = self.spark.read.parquet(*seen_dirs).withColumn(
            "host", host_key_col(F.col("url"))
        )
        # upserts: merged rows whose winning priority struct was
        # (re)discovered this interval — a cached-scan filter, no shuffle.
        upserts = merged_m.where(F.col("disc_wave") >= self._interval_start)
        self._write_frontier_delta(
            merged_m, upserts, additions.select("url_hash"), base_props
        )
        self.cat.write("seen", None, "append", base_props, staged_dirs=seen_dirs)
        dirty = self._dirty_hosts[0]
        for d in self._dirty_hosts[1:]:
            dirty = dirty.unionByName(d)
        self._write_hosts_delta(hosts_new, dirty, base_props)
        self.cat.write("trace", trace_df, "append", base_props)
        self.bloom.fold_additions(
            additions, properties=base_props, dirty_shards=sorted(self._dirty_shards)
        )
        self._dirty_shards = set()

        for df in self._keep:
            df.unpersist()
        self._buf_crawl, self._buf_trace, self._buf_seen_dirs = [], [], []
        self._dirty_hosts = []
        self._keep = []
        self._mem = {"frontier": merged_m}
        self._mem_dirty = False
        self._interval_start = base_props["wave"] + 1
        return deferred

    def _seen_view(self) -> DataFrame:
        """Durable seen ledger plus fast-path staged additions."""
        seen = self.cat.read(self.spark, "seen")
        if self._buf_seen_dirs:
            seen = seen.unionByName(
                self.spark.read.parquet(*self._buf_seen_dirs)
            )
        return seen

    def flush(self) -> None:
        """Force a durable snapshot of any fast-path in-memory state +
        buffered appends, and compact the delta-backed frontier (run()
        exits with a clean single-version table; mid-run durable commits
        stay O(wave churn)). No-op when already durable and compact."""
        buffered = bool(self._buf_crawl or self._buf_seen_dirs or self._buf_trace)
        dirty = self._mem_dirty or buffered
        if not dirty and not self._mem and self._frontier_commits_since_compact == 0:
            return
        props = {"wave": self.wave - 1, "flushed": True, "waves": self._wave_props,
                 "total_pages": self._pages_total}
        if self._last_frontier_n is not None:
            props["frontier_n"] = self._last_frontier_n
        if self._buf_crawl:
            self.cat.write(
                "crawl", None, mode="append", properties=props,
                staged_dirs=list(self._buf_crawl),
            )
        if self._buf_trace:
            trace_df = self._buf_trace[0]
            for buf in self._buf_trace[1:]:
                trace_df = trace_df.unionByName(buf)
            self.cat.write("trace", trace_df, mode="append", properties=props)
        if self._buf_seen_dirs:
            self.cat.write(
                "seen", None, mode="append", properties=props,
                staged_dirs=list(self._buf_seen_dirs),
            )
            additions = self.spark.read.parquet(*self._buf_seen_dirs).withColumn(
                "host", host_key_col(F.col("url"))
            )
            self.bloom.fold_additions(
                additions, properties=props, dirty_shards=sorted(self._dirty_shards)
            )
        if self._frontier_commits_since_compact > 0 or (dirty and "frontier" in self._mem):
            src = self._mem.get("frontier")
            self._write_frontier_full(
                src if src is not None else self._read_frontier(), props
            )
        if dirty and "hosts" in self._mem and self._dirty_hosts:
            dirty_h = self._dirty_hosts[0]
            for d in self._dirty_hosts[1:]:
                dirty_h = dirty_h.unionByName(d)
            self._write_hosts_delta(self._mem["hosts"], dirty_h, props)
        for df in self._keep + list(self._mem.values()):
            df.unpersist()
        self._buf_crawl, self._buf_trace, self._buf_seen_dirs = [], [], []
        self._mem, self._keep, self._wave_props, self._dirty_hosts = {}, [], [], []
        self._dirty_shards = set()
        self._mem_dirty = False

    # -- driver loop -------------------------------------------------------------
    def total_pages(self) -> int:
        """Cumulative saved pages — from snapshot properties (the running
        counter every commit records), falling back to a count job only
        for snapshots written before the counter existed."""
        snap = self.cat.current_snapshot("crawl")
        if snap is not None and "total_pages" in snap.properties:
            return int(snap.properties["total_pages"])
        return self.cat.read(self.spark, "crawl").count()

    def frontier_size(self) -> int:
        """Frontier row count from snapshot properties (same contract)."""
        if self._last_frontier_n is not None:
            return self._last_frontier_n
        snap = self.cat.current_snapshot("frontier")
        if snap is not None and "frontier_n" in snap.properties:
            return int(snap.properties["frontier_n"])
        return self._read_frontier().count()

    def run(self, max_waves: int | None = None, verbose: bool = False) -> int:
        """Micro-iterate until target pages, empty frontier, or wave cap;
        always leaves durable state (flushes fast-path buffers at exit).
        Returns the number of waves executed in this call.

        Stop conditions read the property-backed counters — zero Spark
        jobs before the first wave (the r2 profiler showed the two guard
        count jobs as a fixed per-run() cost)."""
        limit = max_waves if max_waves is not None else self.cfg.max_waves
        executed = 0
        pages = self.total_pages()
        frontier_n = self.frontier_size()
        while self.wave < limit and pages < self.cfg.target_pages and frontier_n > 0:
            stats = self.step()
            executed += 1
            pages += stats["saved"]
            frontier_n = stats["frontier"]
            if verbose:
                print(
                    f"wave {stats['wave']}: selected={stats['selected']} "
                    f"saved={stats['saved']} frontier={stats['frontier']}"
                )
        self.flush()
        return executed


def _shard_metric_exprs(shard_col, n_shards: int):
    return [
        F.sum((shard_col == i).cast("long")).alias(f"s{i}") for i in range(n_shards)
    ]


def _metrics_to_shards(metrics: dict, n_shards: int) -> dict[str, int]:
    return {
        str(i): int(metrics.get(f"s{i}") or 0)
        for i in range(n_shards)
        if (metrics.get(f"s{i}") or 0)
    }
