"""SparkSession factory tuned for the crawl/analytics engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); on a
real cluster the same settings apply per-executor. Everything here is
standard open-source Spark configuration:

- AQE on (runtime re-plan, skew-join splitting) — replaces the reference's
  hand-sized partitioning (``tools/Partitioner.java``).
- Arrow on — every row-level kernel runs as a vectorized pandas UDF
  (BASELINE.json input_hint: "no per-row Python").
- shuffle partitions sized for local runs; AQE coalesces at runtime so a
  1000-executor cluster just raises the initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "megasearch-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    ``cores`` picks ``local[N]``; default is ``$SPARK_GRAFT_CPUS`` or ``*``.
    Under ``spark-submit`` (which sets ``spark.master`` itself — e.g. a
    YARN/k8s cluster via ``--master``) the deployment's master wins:
    hard-coding ``local[N]`` here would silently collapse a cluster run
    onto the driver. An explicit ``cores=`` argument still forces local.

    spark-submit detection: a submitted python app talks to the JVM that
    spark-submit already launched, through the Py4J gateway whose
    address PythonRunner exports as ``PYSPARK_GATEWAY_PORT`` /
    ``PYSPARK_GATEWAY_SECRET`` — the only env contract that actually
    fires on the spark-submit path (``PYSPARK_SUBMIT_ARGS`` is set by
    the interactive ``pyspark`` launcher, NOT by submitted apps). When
    the gateway exists, that JVM's conf already carries the submitted
    ``--master``, so we simply don't call ``.master()`` at all.
    """
    under_submit = (
        "PYSPARK_GATEWAY_PORT" in os.environ
        or "PYSPARK_GATEWAY_SECRET" in os.environ
    )
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    else:
        under_submit = False  # explicit cores= forces local[N]
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = SparkSession.builder.appName(app_name)
    if not under_submit:
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # binary/html columns make Arrow batches memory-heavy: even 1000
        # rows × ~60 KB pages ≈ 60 MB in flight per task measurably
        # GC-thrashes at 32 tasks (A/B on the crawl replay: 256-row
        # batches cut wave wall ~25% vs 1000). 256 × 60 KB ≈ 15 MB/task.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # same reasoning for the vectorized parquet reader, and the
        # empirically critical one: Common-Crawl-ish bodies average
        # ~175 KB, so even 512 rows = ~90 MB of live columnar batch per
        # task — at 8+ tasks the old gen fills and repeat scans collapse
        # (measured: 4s → 30s per scan as GC debt accumulates). 64 rows
        # ≈ 11 MB/task keeps batches young-gen-sized; narrow OLAP scans
        # pay only ~25% on per-batch overhead, negligible absolute.
        .config("spark.sql.parquet.columnarReaderBatchSize", "64")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
