"""Unit semantics for the two round-4 additions: Okapi BM25 ranking
(plans/search.py) and exact duplicate-span statistics (operators/dedup.py).
Cross-engine value equality is covered by the q_bm25 / q_dup_spans
registry oracles; these pin hand-computed values and edge cases."""

import math

from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.dedup import (
    duplicate_span_stats,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.search import (
    BM25_B,
    BM25_K1,
    bm25_scores,
)


def test_dup_spans_hand_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # gram "a b c d e" shared with doc 2
            (2, "x a b c d e y"),
            (3, "p q r s t u v"),        # no shared 5-gram
            (4, "w"),                    # shorter than k: no grams at all
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in duplicate_span_stats(docs, k=5).collect()
    }
    assert out[1]["dup_tokens"] == 5 and out[1]["n_tokens"] == 6
    assert abs(out[1]["dup_token_fraction"] - round(5 / 6, 6)) < 1e-9
    assert out[2]["dup_tokens"] == 5 and out[2]["n_tokens"] == 7
    assert out[3]["dup_tokens"] == 0 and out[3]["dup_token_fraction"] == 0.0
    assert out[4]["dup_tokens"] == 0 and out[4]["n_tokens"] == 1


def test_dup_spans_within_doc_repeat(spark):
    """A span repeated INSIDE one document counts (the within-doc
    boilerplate case document-level fingerprints can't see)."""
    docs = spark.createDataFrame(
        [(1, "a b c d e z z a b c d e"), (2, "unrelated text entirely here now")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in duplicate_span_stats(docs, k=5).collect()}
    # positions 0-4 and 7-11 covered -> 10 of 12 tokens
    assert out[1]["dup_tokens"] == 10 and out[1]["n_tokens"] == 12
    assert out[2]["dup_tokens"] == 0


def test_bm25_hand_values(spark):
    # postings: (doc, word, count); doc lengths 4 and 6
    tok = spark.createDataFrame(
        [(1, "data", 3), (1, "other", 1), (2, "data", 1), (2, "pad", 5)],
        "doc_id long, w string, cnt long",
    )
    n_docs = 2
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(tok, ["data"], n_docs).collect()}
    avgdl = (4 + 6) / 2.0
    idf = math.log(1.0 + (n_docs - 2 + 0.5) / (2 + 0.5))
    for doc, cnt, dl in [(1, 3, 4), (2, 1, 6)]:
        expect = idf * (cnt * (BM25_K1 + 1.0)) / (
            cnt + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        )
        assert abs(out[doc] - round(expect, 6)) < 1e-9
    # higher tf at shorter length must outrank
    assert out[1] > out[2]


def test_bm25_missing_terms_rows_absent(spark):
    tok = spark.createDataFrame([(1, "alpha", 2)], "doc_id long, w string, cnt long")
    assert bm25_scores(tok, ["missing"], 1).count() == 0
