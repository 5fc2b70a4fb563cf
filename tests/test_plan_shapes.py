"""Physical-plan regression tests: the scale properties the 100-TB design
depends on, asserted from ``explain('formatted')`` output so a refactor
that silently drops them fails CI.

Checked invariants:
- parquet scans carry PushedFilters / pruned ReadSchema (Catalyst reaches
  the source; a scan reading all columns for a 2-column projection is a
  100x regression at 100 TB),
- small-side joins are broadcast (no shuffle of the big side),
- the relational hot path stays inside WholeStageCodegen (no Python
  row-at-a-time ops),
- the frontier anti-join (URL-seen) broadcasts the candidate side.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark import queries as Q


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def executed_plan(df) -> str:
    """final (post-AQE) physical plan string; '*(n)' marks codegen stages.
    Executes the query — intended for the tiny sf0.001 fixtures."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_pushdown_and_pruning(spark, sf_dir):
    df = Q.q_scan_filter_project(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity," in plan
    # column pruning: the 16-column lineitem scan reads only the 4 used
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema
    for col in ("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"):
        assert col in read_schema
    assert "*(" in executed_plan(df)  # whole-stage codegen
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_join_agg_broadcasts_dimension(spark, sf_dir):
    plan = plan_of(Q.q_join_agg(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_frontier_antijoin_is_broadcast(spark, sf_dir):
    plan = plan_of(Q.q_frontier_antijoin(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_tpch_q1_partial_aggregation(spark, sf_dir):
    """map-side combine: HashAggregate appears both before and after the
    key exchange, so the shuffle moves partial states, not rows."""
    df = Q.q_tpch_q1(spark, sf_dir)
    final = executed_plan(df)
    agg_lines = [l for l in final.splitlines() if "HashAggregate" in l]
    assert len(agg_lines) >= 2
    assert any("Exchange" in l for l in final.splitlines())
    assert "*(" in final  # whole-stage codegen


def test_relational_core_has_no_python(spark, sf_dir):
    """every relational-core query stays JVM-side end to end."""
    for name in (
        "q_scan_filter_project",
        "q_distinct",
        "q_groupby_collect",
        "q_agg_fold",
        "q_tpch_q1",
        "q_join_agg",
        "q_intersection",
        "q_top_orders",
        "q_window_sessionize",
    ):
        fn, _ = Q.QUERIES[name]
        plan = plan_of(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    """ANN baseline: the tiny query side is broadcast against the corpus,
    never the reverse (corpus side must stream)."""
    plan = plan_of(Q.QUERIES["q_cosine_topk"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_curation_filters_are_single_scan_no_python(spark, sf_dir):
    """quality_filter / repetition / token_counts / lang_id must stay one
    scan + project: no shuffle Exchange, no Python runner — at 100 TB the
    filter IS the scan."""
    for name in ("q_quality_filter", "q_repetition", "q_token_counts", "q_lang_id"):
        fn, _ = Q.QUERIES[name]
        plan = plan_of(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "Exchange hashpartitioning" not in plan, name


def test_contamination_broadcasts_eval_shingles(spark, sf_dir):
    """decontamination: the small eval-shingle side broadcasts; the
    corpus shingle explode is never shuffled by shingle."""
    plan = plan_of(Q.QUERIES["q_contamination"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_broadcasts_df_and_stays_jvm(spark, sf_dir):
    """BM25: the per-term df frame broadcasts; no Python in the plan —
    the per-query corpus work is one pruned postings scan."""
    plan = plan_of(Q.QUERIES["q_bm25"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dup_spans_no_python_no_pairwise_join(spark, sf_dir):
    """duplicate-span stats: pure column exprs (no Python runner) and no
    occurrence-pairwise self-join — the only joins are occ⨝counts (gram
    annotation) and the final per-doc left join."""
    plan = plan_of(Q.QUERIES["q_dup_spans"][0](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # a pairwise candidate join would join occ to itself on the gram key
    # with an inequality — assert no such shape survived
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_time_rollup_is_single_scan_expand_partial_agg(spark, sf_dir):
    """rollup: one events scan feeds Expand, all grouping-set levels are
    aggregated map-side (partial HashAggregate below the one exchange) —
    no per-level re-scan."""
    plan = plan_of(Q.QUERIES["q_time_rollup"][0](spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert sum("Scan parquet" in l for l in tree.splitlines()) == 1
    assert "Expand" in plan
    agg_lines = [l for l in tree.splitlines() if "HashAggregate" in l]
    exch_lines = [l for l in tree.splitlines() if "Exchange" in l]
    assert len(agg_lines) == 2 and len(exch_lines) == 1  # partial + final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmv_distinct_caps_rows_before_shuffle(spark, sf_dir):
    """KMV sketch: Spark's rank-limit pushdown (WindowGroupLimit) must
    sit BELOW the window's exchange, so each map task ships at most k
    rows per group — the sketch's whole point at 100 TB."""
    plan = plan_of(Q.QUERIES["q_kmv_distinct"][0](spark, sf_dir))
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    wgl = [i for i, l in enumerate(lines) if "WindowGroupLimit" in l]
    exch = [i for i, l in enumerate(lines) if "Exchange" in l]
    # tree prints top-down (scan last): the partial WindowGroupLimit must
    # sit BELOW the window's exchange — i.e. an exchange line falls
    # between the final and partial WindowGroupLimit occurrences
    assert len(wgl) == 2, tree
    assert any(wgl[0] < e < wgl[1] for e in exch), tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hll_distinct_two_level_agg_no_window(spark, sf_dir):
    """HLL sketch: pure two-level hash aggregation — register build
    (group,bucket) then register fold (group). No window, no Python
    eval; map-side partial agg absorbs duplicates before the shuffle."""
    plan = plan_of(Q.QUERIES["q_hll_distinct"][0](spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree, tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    agg_lines = [l for l in tree.splitlines() if "HashAggregate" in l]
    assert len(agg_lines) == 4, tree  # partial+final at each of 2 levels


def test_heavy_hitters_agg_before_window_with_group_limit(spark, sf_dir):
    """Heavy hitters: the count agg must shrink to one row per
    (group,value) BEFORE the ranking window, and WindowGroupLimit must
    cap shipping at k rows per group below the window's exchange."""
    plan = plan_of(Q.QUERIES["q_heavy_hitters"][0](spark, sf_dir))
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    wgl = [i for i, l in enumerate(lines) if "WindowGroupLimit" in l]
    agg = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    assert len(wgl) == 2, tree
    # top-down print: aggregates (partial+final) sit BELOW the window ops
    assert all(a > wgl[1] for a in agg), tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cube_expands_from_single_scan(spark, sf_dir):
    plan = plan_of(Q.QUERIES["q_cube"][0](spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Expand" in tree, tree
    assert sum("Scan parquet" in l for l in tree.splitlines()) == 1, tree
    agg_lines = [l for l in tree.splitlines() if "HashAggregate" in l]
    exch_lines = [l for l in tree.splitlines() if "Exchange" in l]
    assert len(agg_lines) == 2 and len(exch_lines) == 1, tree


def test_winnow_zero_shuffle_all_jvm(spark, sf_dir):
    """Winnowing summary (r6): ZERO exchanges — the w-gram rolling min
    is per-document array algebra inside the row (zip_with cascades, see
    textops._winnow_sel_arrays), so the whole summary is one scan + one
    project; no Window operator, no per-doc shuffle, and the rolling-
    hash pipeline stays JVM-side (no Python eval). (r5 shape: explode +
    one exchange for the per-doc window.)"""
    plan = plan_of(Q.QUERIES["q_winnow"][0](spark, sf_dir))
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    assert sum("Exchange" in l for l in lines) == 0, tree
    assert sum("Scan parquet" in l for l in lines) == 1, tree
    assert not any("Window" in l for l in lines), tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_winnow_pairs_bucketed_join_no_all_pairs(spark, sf_dir):
    """Winnow pair generation must meet on the fingerprint key (bucketed
    equi-join) — never a cartesian/nested-loop all-pairs shape — and
    stay JVM-side end to end."""
    plan = plan_of(Q.QUERIES["q_winnow_pairs"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    tree = plan.split("\n\n")[0]
    assert any("HashJoin" in l or "SortMergeJoin" in l for l in tree.splitlines()), tree
    # the equi-join is keyed on the fingerprint (details section carries
    # the join keys)
    assert any(
        "keys" in l and "fp#" in l for l in plan.splitlines()
    ), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_group_quantiles_preagg_aggregates_before_window(spark, sf_dir):
    """The pre-agg quantile variant must collapse (group, value) counts
    in a hash aggregate BELOW the window's exchange — map-side partials
    absorb repeated values before anything is sorted — with the final
    quantile selection above the window."""
    plan = plan_of(Q.QUERIES["q_group_quantiles_preagg"][0](spark, sf_dir))
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    win = [i for i, l in enumerate(lines) if "Window" in l and "WindowGroupLimit" not in l]
    agg = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    assert win and agg, tree
    # top-down print: the (group,value) count partial+final sit BELOW
    # the window; the quantile-selection agg sits ABOVE it
    assert sum(a > max(win) for a in agg) >= 2, tree
    assert any(a < min(win) for a in agg), tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dup_span_removal_all_jvm_no_pair_fanout(spark, sf_dir):
    """Span-removal rewrite: zero Python eval nodes, no nested-loop /
    cartesian shape anywhere (the fp-stats join is a LINEAR equi-join —
    each fingerprint row meets exactly one stats row), and every join in
    the stitch phase is keyed (hash or sort-merge, never broadcast-NL)."""
    plan = plan_of(Q.QUERIES["q_dup_span_removal"][0](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phrase_search_filters_before_shuffle(spark, sf_dir):
    """Phrase search: the phrase-word predicate sits BELOW the posting
    aggregation's exchange (the shuffle carries only phrase-word rows,
    not the whole exploded corpus), and the whole probe is JVM-side."""
    df = Q.QUERIES["q_phrase_search"][0](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    gen_idx = [i for i, l in enumerate(lines) if "Generate posexplode" in l]
    assert gen_idx, plan
    for gi in gen_idx:
        # the line directly above each explode must be the word filter
        above = "\n".join(lines[max(0, gi - 2):gi])
        assert "Filter" in above and "word" in above, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
