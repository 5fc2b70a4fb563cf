"""Positional postings + phrase search (plans/search.py)."""

from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_search_adjacency_and_overlaps(spark):
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.search import (
        phrase_search,
    )

    docs = _docs(
        spark,
        [
            (1, "big table table key"),          # one match at pos 2
            (2, "table table table"),            # overlapping: two matches
            (3, "table key table"),              # words present, never adjacent
            (4, "TABLE   Table\ttable x"),       # case/whitespace normalize
            (5, "no relevant words here"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, "table table").collect()
    }
    assert got == {1: (1, 2), 2: (2, 1), 4: (2, 1)}


def test_phrase_search_trigram_and_first_pos(spark):
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.search import (
        phrase_search,
    )

    docs = _docs(
        spark,
        [
            (1, "fast table value end"),
            (2, "x fast table value y fast table value"),
            (3, "fast value table"),  # permuted: no match
        ],
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, "fast table value").collect()
    }
    assert got == {1: (1, 1), 2: (2, 2)}

    with pytest.raises(ValueError):
        phrase_search(docs, "   ")


def test_positional_postings_shape(spark):
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.search import (
        positional_postings,
    )

    docs = _docs(spark, [(7, "a b a c a")])
    rows = {
        r["word"]: (r["positions"], r["tf"])
        for r in positional_postings(docs).collect()
    }
    assert rows["a"] == ([1, 3, 5], 3)
    assert rows["b"] == ([2], 1)
    assert rows["c"] == ([4], 1)


def test_near_search_slop_semantics(spark):
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.search import (
        near_search,
        phrase_search,
    )

    docs = _docs(
        spark,
        [
            (1, "fast big value"),          # gap 2: slop>=1 matches
            (2, "fast value"),              # adjacent: any slop
            (3, "value fast"),              # wrong order: never
            (4, "fast x y z value"),        # gap 4: slop>=3 only
            (5, "fast value fast big value"),  # two matches at slop>=1
        ],
    )
    s0 = {r["doc_id"]: r["n_matches"] for r in near_search(docs, "fast value", slop=0).collect()}
    s1 = {r["doc_id"]: r["n_matches"] for r in near_search(docs, "fast value", slop=1).collect()}
    s3 = {r["doc_id"]: r["n_matches"] for r in near_search(docs, "fast value", slop=3).collect()}
    assert s0 == {2: 1, 5: 1}
    assert s1 == {1: 1, 2: 1, 5: 2}
    assert s3 == {1: 1, 2: 1, 4: 1, 5: 2}
    # slop=0 is exactly the phrase semantics
    p = {
        (r["doc_id"], r["n_matches"])
        for r in phrase_search(docs, "fast value").collect()
    }
    assert {(d, n) for d, n in s0.items()} == p
