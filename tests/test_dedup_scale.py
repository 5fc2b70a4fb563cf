"""Dedup operators on adversarial inputs.

1. Short/empty documents: an unguarded ``sequence(0, size-n)`` goes
   descending for docs with < n tokens and makes ``slice`` throw — the
   guard must yield zero shingles instead (common on real web text).
2. Hot-shingle skew: a boilerplate shingle shared by every document makes
   the Jaccard self-join quadratic; the ``max_df`` cap must drop it
   before the join while keeping genuinely-similar pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_docs_yield_no_shingles_and_no_crash(spark):
    df = _docs(
        spark,
        [
            (0, ""),
            (1, "one"),
            (2, "two words"),
            (3, "three words here"),
            (4, "a b c d e"),
        ],
    )
    by_doc: dict[int, list[str]] = {}
    for r in dedup.shingles(df).collect():
        by_doc.setdefault(r["doc_id"], []).append(r["sh"])
    assert set(by_doc) == {3, 4}, "docs with <3 tokens must yield no shingles"
    assert by_doc[3] == ["three words here"]
    assert len(by_doc[4]) == 3
    # the full pair pipelines run end-to-end over short docs
    assert dedup.ngram_jaccard_pairs(df, min_jaccard=0.1).count() == 0
    assert dedup.minhash_lsh_pairs(df, min_est=0.1).count() == 0
    assert dedup.minhash_signatures(df).where(F.col("doc_id") < 3).count() == 0


def test_hot_shingle_cap_bounds_candidates(spark):
    n = 60
    rows = [(i, f"common boiler plate unique{i} token{i} word{i}") for i in range(n)]
    # two genuinely identical docs that must survive the cap
    rows += [(1000, "alpha beta gamma delta"), (1001, "alpha beta gamma delta")]
    df = _docs(spark, rows)

    # no cap: the one hot shingle ('common boiler plate', df=60) joins
    # every doc with every other — the quadratic blowup
    uncapped = dedup.ngram_jaccard_pairs(df, min_jaccard=0.0, max_df=None)
    assert uncapped.count() == n * (n - 1) // 2 + 1

    # capped: hot shingle dropped before the join; only the real dup pair
    # survives, with exact Jaccard over its (unfiltered) shingles
    capped = dedup.ngram_jaccard_pairs(df, min_jaccard=0.0, max_df=30)
    got = [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in capped.collect()]
    assert got == [(1000, 1001, 1.0)]


def test_dup_components_transitive(spark):
    """a-b and b-c pairs must land a, b, c in ONE component (min id),
    even though (a, c) was never a candidate pair; disjoint pairs stay
    in separate components; chain longer than 2 still collapses within
    the fixed iteration budget."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.dedup import (
        dup_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22)],
        "vec_a long, vec_b long",
    )
    got = {r["vec_id"]: r["component"] for r in dup_components(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_dup_components_chain_and_star_converge_exactly(spark):
    """The 10⁹-edge design path, exercised at ~¾M edges: a 500k-node
    CHAIN (diameter = n, the worst case where min-label propagation
    would need n rounds — only the alternating large-star/small-star
    contraction converges) plus a 250k-leaf STAR, converging EXACTLY,
    with plan depth bounded by the per-round localCheckpoint (no nested
    join lineage accumulating across rounds)."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.dedup import (
        dup_components,
    )

    n = 500_000
    chain = spark.range(n).select(
        F.col("id").alias("vec_a"), (F.col("id") + 1).alias("vec_b")
    )
    star_base = 10_000_000
    star = spark.range(n // 2).select(
        F.lit(star_base).cast("long").alias("vec_a"),
        (F.col("id") + star_base + 1).alias("vec_b"),
    )
    comp = dup_components(chain.unionByName(star))
    # lineage cut per round: the returned plan joins the final
    # checkpointed star forest, not a round-nested join tree
    plan = comp._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 4, "per-round checkpoint lost — nested lineage"
    got = {
        r["component"]: r["count"]
        for r in comp.groupBy("component").count().collect()
    }
    assert got == {0: n + 1, star_base: n // 2 + 1}
