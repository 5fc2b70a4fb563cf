"""TF-IDF job (reference: ``src/jobs/TfIdf.java``).

Reference flow (SURVEY.md §2.4 T1): per doc extract text with the TfIdf
regex variant (:323-351), tokenize with the shared stopword/length rules
(:293-312), keep the top-60 terms by raw count (:38,201-202);
``tf = 1+ln(count)`` (:217), ``idf = ln((N+1)/(df+1))`` (:218), keep rows
with ``idf>0 ∧ tfidf>0`` (:219-225). df comes from the inverted index's
``__count`` column with a per-worker memo cache (:272-291) — here it is
simply a join against the index DataFrame; N = corpus size (:113-139).

Spark mapping: ``groupBy(url, word).count()`` → per-doc top-k via
``row_number`` over a host-partitioned window (no global sort) → join the
df table → pure column arithmetic. The reference's top-60 tie order is
its sort's insertion order (not reproducible); ties here break
lexicographically by word — documented deterministic equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.udfs import extract_text_tfidf_udf, token_pairs_udf

__all__ = ["doc_term_counts", "tfidf"]

MAX_TERMS_PER_DOCUMENT = 60  # TfIdf.java:38


def doc_term_counts(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, word, count) using the TfIdf extractor + shared tokenizer."""
    pairs = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            token_pairs_udf(extract_text_tfidf_udf(F.col(html_col)))
        ).alias("_pair"),
    )
    return pairs.select(
        "url",
        F.split(F.col("_pair"), "").getItem(0).alias("word"),
        F.split(F.col("_pair"), "").getItem(1).cast("long").alias("count"),
    )


def tfidf(
    pages: DataFrame,
    index: DataFrame,
    n_docs: int | None = None,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """→ (url, word, tf, idf, tfidf) rows, top-60 terms per doc."""
    if n_docs is None:
        n_docs = pages.count()
    counts = doc_term_counts(pages, url_col, html_col)
    w = Window.partitionBy("url").orderBy(F.col("count").desc(), F.col("word").asc())
    top = counts.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= MAX_TERMS_PER_DOCUMENT
    )
    scored = (
        top.join(index.select("word", "df"), "word")
        .select(
            "url",
            "word",
            (F.lit(1.0) + F.log(F.col("count"))).alias("tf"),
            F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)).alias("idf"),
        )
        .withColumn("tfidf", F.col("tf") * F.col("idf"))
        .where((F.col("idf") > 0) & (F.col("tfidf") > 0))
    )
    return scored
