"""host_crawl_budget: clamp semantics, degenerate-mass fallback, and the
single-agg + broadcast-scalar plan shape (operators/budget.py)."""

from __future__ import annotations

import math

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.budget import (
    host_crawl_budget,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, host string, quality double, is_dup boolean"
    )


def test_budget_shares_clamp_and_math(spark):
    # host a: high quality, no dups, big volume -> hits the max cap
    # host b: mid quality, half dups -> proportional share
    # host c: tiny weight -> floored up to min_pages
    rows = (
        [(i, "a", 0.9, False) for i in range(50)]
        + [(100 + i, "b", 0.5, i % 2 == 0) for i in range(20)]
        + [(200, "c", 0.01, False)]
    )
    out = {
        r["host"]: r
        for r in host_crawl_budget(
            _mk(spark, rows), total_budget=1000, min_pages=25, max_frac=0.3
        ).collect()
    }
    wa = round(0.9 * 1.0 * math.log(51.0), 6)
    wb = round(0.5 * 0.5 * math.log(21.0), 6)
    wc = round(0.01 * 1.0 * math.log(2.0), 6)
    w6 = {h: round(w * 1e6) for h, w in (("a", wa), ("b", wb), ("c", wc))}
    wsum = sum(w6.values())
    assert out["a"]["weight"] == wa and out["b"]["dup_rate"] == 0.5
    # a's proportional share (~64%) is clamped to the 30% cap
    assert out["a"]["budget"] == 300
    assert out["b"]["budget"] == math.floor(1000.0 * (w6["b"] / wsum))
    # c's proportional share (<2 pages) is floored up to min_pages
    assert out["c"]["budget"] == 25
    # budgets are longs, never exceed cap, never fall below floor
    for r in out.values():
        assert 25 <= r["budget"] <= 300


def test_budget_zero_mass_falls_back_to_min(spark):
    rows = [(1, "a", 0.0, False), (2, "b", 0.0, True)]
    out = host_crawl_budget(
        _mk(spark, rows), total_budget=500, min_pages=7, max_frac=0.5
    ).collect()
    assert {r["budget"] for r in out} == {7}


def test_budget_plan_is_one_agg_plus_broadcast_scalar(spark):
    rows = [(i, f"h{i % 4}", 0.5, False) for i in range(40)]
    df = host_crawl_budget(_mk(spark, rows), total_budget=100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scalar weight-sum joins back via broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # no window over the corpus: per-host stats come from hash aggregation
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
