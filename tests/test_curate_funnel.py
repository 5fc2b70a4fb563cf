"""The composed curation funnel (operators/curate.py): stage semantics
and monotonicity. Cross-engine value equality is covered by the
``q_curate`` registry oracle; these tests pin the invariants the oracle
cannot see (stage containment, eval-set exclusion, canonical keeper)."""

import pytest
from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.curate import (
    curate_funnel,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stages(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    eval_ids = docs.where(F.col("doc_id") % 7 == 0).select("doc_id")
    return (
        docs,
        eval_ids,
        curate_funnel(docs, eval_ids, min_jaccard=0.1, min_overlap=3, quota=5),
    )


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_stages_are_nested_subsets(stages):
    docs, _, st = stages
    q, c, e, n, s = (
        _ids(st["quality"]),
        _ids(st["clean"]),
        _ids(st["exact"]),
        _ids(st["neardup"]),
        _ids(st["sampled"]),
    )
    assert s <= n <= e <= c <= q <= _ids(docs)


def test_heldout_rows_never_survive(stages):
    _, eval_ids, st = stages
    assert not (_ids(st["clean"]) & _ids(eval_ids))


def test_quota_respected_per_lang(stages):
    _, _, st = stages
    counts = st["sampled"].groupBy("lang").count().collect()
    assert counts and all(r["count"] <= 5 for r in counts)


def test_neardup_keeps_component_minimum(stages):
    """Every dropped doc must have a smaller surviving doc in its
    component: rerunning components on the survivors yields singletons
    OR the canonical member of each surviving component is kept."""
    _, _, st = stages
    kept = _ids(st["neardup"])
    exact = _ids(st["exact"])
    dropped = exact - kept
    # each dropped id is > some kept id (its component's canonical)
    assert all(any(k < d for k in kept) for d in dropped)
