"""Crawl-budget allocation: per-host quality feedback → next-wave quota.

The steering loop a production webtext pipeline runs between crawl waves
(FineWeb/RefinedWeb-style): aggregate what the last wave's content was
WORTH per host (mean quality, duplication rate, volume), turn that into
a weight, and hand each host a share of the next wave's fetch budget —
clamped so no host starves (min_pages) and none monopolizes (max_frac).
Reference tie-in: the crawler's per-host accounting (`Crawler.java`
hosts table / host caps) tracks volume only; this closes the loop from
CONTENT quality back to frontier scheduling. The apply side is
``plans.crawl.SparkCrawler.set_host_budgets``.

Like the sketch family, the operator has a build/merge/estimate
contract so the steering state can fold over a STREAM of crawled
batches: :func:`host_stats` builds the per-host additive state (count,
quality sum, dup count), :func:`merge_host_stats` folds two states
(pure sums — associative and commutative, micro-batches partition the
docs so the fold equals the batch aggregate over the union), and
:func:`budget_from_stats` turns any state into budgets.
:func:`host_crawl_budget` is the one-shot batch composition of the
three.

Scale shape: one hash aggregation collapses the corpus to |hosts| rows
(map-side partials absorb the per-doc fan-in); the global weight sum is
a broadcast scalar join, not a window — nothing after the agg touches
more than |hosts| rows, and the output joins back to the frontier on
host, the key the schedule join already shuffles on. Weight mass is
integerized (round(w·1e6) as BIGINT) before the global sum so shares
are bit-reproducible regardless of partition summation order — same
discipline as q_pagerank_delta's seed mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "host_stats",
    "merge_host_stats",
    "budget_from_stats",
    "host_crawl_budget",
]


def host_stats(
    scored_docs: DataFrame,
    host_col: str = "host",
    quality_col: str = "quality",
    dup_col: str = "is_dup",
) -> DataFrame:
    """→ (host, n_docs, q_sum, dup_cnt): the MERGEABLE per-host state.
    All three columns are plain sums, so states built over any partition
    of the corpus — including streaming micro-batches — fold to exactly
    the state of the union."""
    return scored_docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(quality_col).alias("q_sum"),
        F.sum(F.col(dup_col).cast("long")).alias("dup_cnt"),
    )


def merge_host_stats(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two host-stats states: per-host sums. State stays |hosts|
    rows regardless of how many batches were folded in."""
    return (
        a.unionByName(b)
        .groupBy("host")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("q_sum").alias("q_sum"),
            F.sum("dup_cnt").alias("dup_cnt"),
        )
    )


def budget_from_stats(
    stats: DataFrame,
    total_budget: int,
    min_pages: int = 10,
    max_frac: float = 0.2,
) -> DataFrame:
    """→ (host, n_docs, q_mean, dup_rate, weight, budget) from a
    host-stats state (:func:`host_stats`, possibly stream-folded).

    weight = round(q_mean · (1 − dup_rate) · ln(1 + n_docs), 6):
    quality-weighted, discounted by the fraction of the host's pages
    that were duplicates (a host serving boilerplate earns a smaller
    next wave), log-damped in volume so a huge mediocre host cannot
    outvote a small excellent one. budget = clamp(floor(total · share),
    min_pages, floor(max_frac · total)); clamping is applied after the
    proportional split and budgets are NOT re-normalized — the sum may
    differ from ``total_budget`` by the clamp slack, which the caller's
    scheduler treats as a cap, not a contract.
    """
    per_host = stats.select(
        "host",
        "n_docs",
        F.round(F.col("q_sum") / F.col("n_docs"), 6).alias("q_mean"),
        F.round(F.col("dup_cnt") / F.col("n_docs"), 6).alias("dup_rate"),
    )
    weight = F.round(
        F.col("q_mean")
        * (F.lit(1.0) - F.col("dup_rate"))
        * F.log(F.lit(1.0) + F.col("n_docs")),
        6,
    )
    per_host = per_host.withColumn("weight", weight).withColumn(
        "_w6", F.round(F.col("weight") * F.lit(1e6)).cast("long")
    )
    wsum = per_host.agg(F.sum("_w6").alias("_wsum"))
    cap = int(max_frac * total_budget)
    return per_host.crossJoin(F.broadcast(wsum)).select(
        "host",
        "n_docs",
        "q_mean",
        "dup_rate",
        "weight",
        F.when(F.col("_wsum") <= 0, F.lit(min_pages))
        .otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        F.lit(float(total_budget))
                        * (
                            F.col("_w6").cast("double")
                            / F.col("_wsum").cast("double")
                        )
                    ),
                    F.lit(min_pages),
                ),
                F.lit(cap),
            )
        )
        .cast("long")
        .alias("budget"),
    )


def host_crawl_budget(
    scored_docs: DataFrame,
    total_budget: int,
    host_col: str = "host",
    quality_col: str = "quality",
    dup_col: str = "is_dup",
    min_pages: int = 10,
    max_frac: float = 0.2,
) -> DataFrame:
    """→ (host, n_docs, q_mean, dup_rate, weight, budget): the one-shot
    batch path — ``budget_from_stats(host_stats(scored_docs))``.

    ``scored_docs`` carries one row per document with its host, a
    quality score in [0, 1] (e.g. ``textops.quality_score``), and a
    duplicate flag (e.g. ``dedup.exact_dedup``'s ``is_dup``) — the
    operator composes with the existing scorers instead of re-deriving
    them.
    """
    return budget_from_stats(
        host_stats(scored_docs, host_col, quality_col, dup_col),
        total_budget,
        min_pages=min_pages,
        max_frac=max_frac,
    )
