"""Inverted-index job (reference: ``src/jobs/Indexer.java``).

Reference flow (SURVEY.md §2.4 I1–I5): scan pt-crawl → drop pages <100
bytes, truncate HTML at 20 KB (``Indexer.java:22,57-72``) → extract body
text (the byte-exact invariant extractor, :124-151) → tokenize with
stopword/length filters, keep words with per-doc count ≥2 (:214-241) →
df-capped posting lists: per word keep ≤ min(100, ⌊0.15·N⌋) urls
(:17,20,84-89), built through a locking ``appendCapped`` protocol
(``KVSClient.java:345-437``).

Spark-first replacement: one groupBy aggregation replaces the whole
locking protocol — ``collect_list`` + ``slice`` after an explode. The
reference cap keeps *first-arriving* urls in KVS scan order, which is not
reproducible; we define the deterministic equivalent (urls sorted
lexicographically before the cap — SURVEY.md §2.4 I4 note).

Scale: tokens explode ~100× rows, but the aggregation is partial+final
(map-side combine via collect_list is not partial — so we pre-aggregate
distinct (word, url) pairs first, which IS shuffle-reducing) and hot
words are bounded by the df cap. Resume markers (I5) are unnecessary:
the job is a deterministic batch over an immutable snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.udfs import extract_text_index_udf, index_words_udf

__all__ = ["build_index", "MAX_URLS_PER_WORD", "MAX_DOC_FRACTION"]

MAX_URLS_PER_WORD = 100  # Indexer.java:17
MAX_DOC_FRACTION = 0.15  # Indexer.java:20
MIN_PAGE_BYTES = 100  # Indexer.java:65-68
MAX_HTML_BYTES = 20_000  # MAX_HTML_BYTES, Indexer.java:22


def indexable_words(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, word) pairs that the reference would index (I1–I3)."""
    return (
        pages.where(F.length(F.col(html_col)) >= MIN_PAGE_BYTES)
        .select(
            F.col(url_col).alias("url"),
            F.expr(f"substring({html_col}, 1, {MAX_HTML_BYTES})").alias("_html"),
        )
        .select("url", extract_text_index_udf(F.col("_html")).alias("_text"))
        .select("url", F.explode(index_words_udf(F.col("_text"))).alias("word"))
    )


def build_index(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """→ (word, urls array<string>, df long), df-capped per the reference."""
    n_docs = pages.where(F.length(F.col(html_col)) >= MIN_PAGE_BYTES).count()
    cap = int(min(MAX_URLS_PER_WORD, max(1, int(n_docs * MAX_DOC_FRACTION))))
    pairs = indexable_words(pages, url_col, html_col)
    return (
        pairs.groupBy("word")
        .agg(
            F.slice(F.sort_array(F.collect_list("url")), 1, cap).alias("urls"),
            F.count("*").alias("df"),
        )
    )
