"""Crawl-budget allocation: per-host quality feedback → next-wave quota.

The steering loop a production webtext pipeline runs between crawl waves
(FineWeb/RefinedWeb-style): aggregate what the last wave's content was
WORTH per host (mean quality, duplication rate, volume), turn that into
a weight, and hand each host a share of the next wave's fetch budget —
clamped so no host starves (min_pages) and none monopolizes (max_frac).
Reference tie-in: the crawler's per-host accounting (`Crawler.java`
hosts table / host caps) tracks volume only; this closes the loop from
CONTENT quality back to frontier scheduling.

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

__all__ = ["host_crawl_budget"]


def host_crawl_budget(
    scored_docs: DataFrame,
    total_budget: int,
    host_col: str = "host",
    quality_col: str = "quality",
    dup_col: str = "is_dup",
    min_pages: int = 10,
    max_frac: float = 0.2,
) -> DataFrame:
    """→ (host, n_docs, q_mean, dup_rate, weight, budget).

    ``scored_docs`` carries one row per document with its host, a
    quality score in [0, 1] (e.g. ``textops.quality_score``), and a
    duplicate flag (e.g. ``dedup.exact_dedup``'s ``is_dup``) — the
    operator composes with the existing scorers instead of re-deriving
    them.

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
    per_host = scored_docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(quality_col), 6).alias("q_mean"),
        F.round(
            F.sum(F.col(dup_col).cast("int")) / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
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
    out = per_host.crossJoin(F.broadcast(wsum)).select(
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
    return out
