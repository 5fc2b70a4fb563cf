"""Structured Streaming skin for the crawl engine (SURVEY.md §1.4).

The crawl itself is batch-iterative by design (each micro-iteration reads
the frontier snapshot — BASELINE.json north_star), matching the
reference's ``while`` loop (``src/jobs/Crawler.java:131-146``). The
optional streaming skin wires the same per-batch logic into
``foreachBatch``: a stream of newly discovered seed URLs (e.g. a
sitemap/WARC feed landing as files) is consumed with ``readStream``, each
micro-batch is canonicalized, deduplicated against the seen ledger, and
appended to the frontier — after which the batch scheduler drains it.

Also provides a windowed crawl-telemetry aggregation over the trace
table as a streaming source: outcome counts per host per event-time
window with a watermark for late data — the standard monitoring feed a
production crawl would run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.udfs import normalize_seed_udf, url_identity_udf

__all__ = [
    "seed_ingest_stream",
    "trace_window_stream",
    "host_counter_stream",
    "hll_sketch_stream",
    "kmv_sketch_stream",
    "cms_sketch_stream",
    "budget_stats_stream",
]


def _batch_already_folded(catalog, table: str, batch_id: int) -> bool:
    """Replay guard for ADDITIVE foreachBatch folds: foreachBatch is
    at-least-once — a crash between the catalog commit and the streaming
    checkpoint commit re-delivers the batch, and a second merge of an
    additive state (summed counters, per-host sums) would double-count
    it. Each fold stamps ``stream_batch`` into the snapshot properties;
    a redelivered batch id ≤ the stamped one has already been folded, so
    the fold returns early — making the additive folds idempotent under
    Spark's replay. (The HLL/KMV folds are max/union-idempotent and
    would survive replay anyway; they share the guard for uniformity.)"""
    if not catalog.exists(table):
        return False
    snap = catalog.current_snapshot(table)
    if snap is None:
        return False
    prev = snap.properties.get("stream_batch")
    return prev is not None and int(prev) >= int(batch_id)


def seed_ingest_stream(
    spark: SparkSession,
    seed_dir: str,
    crawler,
    checkpoint_dir: str,
):
    """readStream over a directory of seed files (one URL per line) →
    foreachBatch: canonicalize, hash, anti-join the seen ledger, and
    append to the frontier table. Returns the StreamingQuery.

    Run with ``.trigger(availableNow=True)`` semantics for tests; in
    production the stream keeps feeding the frontier while the batch
    scheduler loops.
    """
    raw = spark.readStream.format("text").load(seed_dir)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        seeds = (
            batch_df.select(normalize_seed_udf(F.col("value")).alias("url"))
            .where(F.col("url").isNotNull())
            .withColumn("_id", url_identity_udf(F.col("url")))
            .select(
                "url",
                F.col("_id.url_hash").alias("url_hash"),
                F.col("_id.host").alias("host"),
                F.lit(0).cast("int").alias("depth"),
                F.lit(-1).cast("int").alias("disc_wave"),
                F.lit("").alias("parent_hash"),
                F.lit(int(batch_id)).cast("int").alias("link_idx"),
            )
            .dropDuplicates(["url_hash"])
        )
        frontier = crawler._read_frontier()
        seen = crawler.cat.read(crawler.spark, "seen")
        fresh = (
            seeds.join(seen.select("url_hash"), "url_hash", "left_anti")
            .join(frontier.select("url_hash"), "url_hash", "left_anti")
            .localCheckpoint(eager=True)  # consumed by frontier AND hosts
        )
        # O(batch) append: fresh seeds ride in as an upsert DELTA (no
        # tombstones — nothing is consumed here); the resolved union is
        # only computed if the write lands on a compaction boundary.
        merged = frontier.unionByName(fresh.select(*frontier.columns))
        no_consumed = crawler.spark.createDataFrame([], "url_hash string")
        crawler._write_frontier_delta(
            merged, fresh.select(*frontier.columns), no_consumed,
            {"stream_batch": int(batch_id)},
        )
        # Hydrate host state for fresh seed hosts: SparkCrawler.step()
        # starts with an inner frontier⨝hosts join (its maintained
        # invariant is "hosts covers every frontier host"), so seeds on
        # unknown hosts would otherwise be silently dropped on the next
        # wave. Appended as a hosts DELTA (latest-wins reads) — the
        # stream never rewrites the full hosts table either.
        hosts = crawler._read_hosts()
        new_hosts = crawler._new_host_rows(fresh.select("host"), hosts.select("host"))
        crawler._write_hosts_delta(
            hosts.unionByName(new_hosts),
            new_hosts.select("host"),
            {"stream_batch": int(batch_id)},
        )
        fresh.unpersist()

    return (
        raw.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def trace_window_stream(
    spark: SparkSession,
    trace_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
):
    """Streaming crawl telemetry: outcome counts per host per event-time
    window, watermarked for late rows. Source = trace rows landing as
    parquet (wave id mapped to a synthetic event time)."""
    schema = "wave int, url string, url_hash string, host string, depth int, outcome string"
    src = spark.readStream.schema(schema).parquet(trace_dir)
    agg = (
        src.withColumn(
            "event_time",
            (F.lit(0).cast("timestamp") + F.col("wave").cast("long").cast("interval second")),
        )
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "host", "outcome")
        .agg(F.count("*").alias("n"))
        .select("window.start", "window.end", "host", "outcome", "n")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def host_counter_stream(
    spark: SparkSession,
    trace_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Custom STATEFUL streaming operator (``applyInPandasWithState``):
    per-host running crawl counters over the trace stream — events seen,
    pages fetched, last active wave — maintained as typed per-key state
    across micro-batches (the crawl-monitoring analogue of the
    reference's per-host bookkeeping, kept by the engine instead of a
    hand-rolled KVS row per host, ``Crawler.java:676-678``).

    Arbitrary-state semantics rather than a windowed agg: the counter
    never expires (NoTimeout), survives across batches via the state
    store, and each batch emits the updated row for exactly the touched
    hosts (output mode ``update``, landed via foreachBatch appends — the
    parquet sink itself cannot take update mode). State rows are O(one
    host) each and partitioned by the groupBy key, so a 10^7-host crawl
    shards its state across the cluster like any keyed aggregation."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = "wave int, url string, url_hash string, host string, depth int, outcome string"
    src = spark.readStream.schema(schema).parquet(trace_dir)

    out_type = "host string, events long, fetched long, last_wave int"
    state_type = "events long, fetched long, last_wave int"

    def update(key, pdfs, state: GroupState):
        events, fetched, last_wave = state.get if state.exists else (0, 0, -1)
        for pdf in pdfs:
            events += len(pdf)
            fetched += int((pdf["outcome"] == "fetched").sum())
            if len(pdf):
                last_wave = max(last_wave, int(pdf["wave"].max()))
        state.update((events, fetched, last_wave))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "events": [events],
                "fetched": [fetched],
                "last_wave": [last_wave],
            }
        )

    counters = src.groupBy("host").applyInPandasWithState(
        update, out_type, state_type, "update", GroupStateTimeout.NoTimeout
    )

    def sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        counters.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hll_sketch_stream(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    catalog,
    key: str,
    by: list[str],
    schema: str | None = None,
    table: str = "hll_registers",
):
    """Streaming parity for the sketch family (r4 verdict next-round
    #8): ``readStream`` over a directory of parquet/CSV batches →
    ``foreachBatch`` folds each micro-batch's HLL registers into a
    catalog table, mirroring BloomStore.fold_additions' fold shape.
    Registers merge by per-(group, bucket) ``max`` — idempotent and
    associative — so after ANY number of micro-batches the folded table
    equals the batch :func:`~..operators.sketches.hll_registers` over
    the union of all batches, and :func:`~..operators.sketches.
    hll_estimate` over it gives the live dashboard the same
    constant-state distinct count the batch query computes. State is
    |groups| × HLL_M rows regardless of stream length, so the overwrite
    commit is O(groups) — never O(events seen).

    Returns the StreamingQuery (availableNow trigger — call repeatedly
    as new files land, state survives restarts via the catalog table).
    """
    from ..operators.sketches import hll_merge_registers, hll_registers

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.format("parquet").load(src_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if _batch_already_folded(catalog, table, batch_id):
            return
        regs = hll_registers(batch_df, key, by)
        if catalog.exists(table):
            regs = hll_merge_registers(
                catalog.read(batch_df.sparkSession, table), regs, by
            )
        catalog.write(
            table, regs, properties={"stream_batch": int(batch_id)}
        )

    return (
        raw.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def kmv_sketch_stream(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    catalog,
    key: str,
    by: list[str],
    k: int = 64,
    schema: str | None = None,
    table: str = "kmv_signature",
):
    """Streaming KMV: fold each micro-batch's k-smallest-hash signature
    (``kmv_signature``) into a catalog table via ``kmv_merge_signatures``
    — union, dedupe identical hash values, re-cap at k — so
    ``kmv_estimate_from_signature`` over the folded table equals the
    batch ``kmv_distinct`` over the union of every batch ever seen.
    State is ≤ |groups|·k rows regardless of stream length; same
    fold-into-catalog shape as :func:`hll_sketch_stream`."""
    from ..operators.sketches import kmv_merge_signatures, kmv_signature

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.format("parquet").load(src_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if _batch_already_folded(catalog, table, batch_id):
            return
        sig = kmv_signature(batch_df, key, by, k)
        if catalog.exists(table):
            sig = kmv_merge_signatures(
                catalog.read(batch_df.sparkSession, table), sig, by, k
            )
        catalog.write(table, sig, properties={"stream_batch": int(batch_id)})

    return (
        raw.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cms_sketch_stream(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    catalog,
    key: str,
    schema: str | None = None,
    table: str = "cms_sketch",
):
    """Streaming count-min: micro-batches partition the event stream,
    so summing per-batch sketches (``cms_merge``) reproduces the batch
    ``cms_sketch`` over the union exactly — counters are additive over
    disjoint event sets. State is ≤ d·w rows (constant) forever; the
    live dashboard probes it with the same broadcast ``cms_estimate``
    the batch path uses."""
    from ..operators.sketches import cms_merge, cms_sketch

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.format("parquet").load(src_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if _batch_already_folded(catalog, table, batch_id):
            return
        sk = cms_sketch(batch_df, key)
        if catalog.exists(table):
            sk = cms_merge(catalog.read(batch_df.sparkSession, table), sk)
        catalog.write(table, sk, properties={"stream_batch": int(batch_id)})

    return (
        raw.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def budget_stats_stream(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    catalog,
    host_col: str = "host",
    quality_col: str = "quality",
    dup_col: str = "is_dup",
    schema: str | None = None,
    table: str = "host_budget_stats",
):
    """Streaming half of the quality-steering loop: fold each
    micro-batch of scored documents into the per-host additive state
    (``operators.budget.host_stats`` — count, quality sum, dup count;
    pure sums, so the fold equals the batch aggregate over the union of
    every batch). The live scheduler turns the folded state into next-
    wave quotas with ``budget_from_stats`` and applies them via
    ``SparkCrawler.set_host_budgets`` — budgets that tighten as evidence
    about a host accumulates, without ever re-reading past batches.
    State is |hosts| rows regardless of stream length; same
    fold-into-catalog shape as the sketch streams."""
    from ..operators.budget import host_stats, merge_host_stats

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.format("parquet").load(src_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if _batch_already_folded(catalog, table, batch_id):
            return
        st = host_stats(batch_df, host_col, quality_col, dup_col)
        if catalog.exists(table):
            st = merge_host_stats(catalog.read(batch_df.sparkSession, table), st)
        catalog.write(table, st, properties={"stream_batch": int(batch_id)})

    return (
        raw.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
