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
words are bounded by the df cap.

Resume markers (I5, ``Indexer.java:18-54,116-123``): the reference keeps
a progress table so a restarted run skips already-indexed pages. For a
single deterministic batch over an immutable snapshot that is redundant —
but for a LONG extraction over a 100-TB crawl it is not: losing the
driver 90% through means repaying days of UDF work. ``ResumableIndexer``
is the Spark-first shape of the same protocol: the snapshot is cut into
deterministic url-hash chunks, each chunk's (url, word) pairs commit as
one catalog append whose snapshot *properties* carry the done-chunk set —
data and marker move in the same atomic manifest swap (no separate
progress table to drift out of sync, unlike ``PROGRESS_TABLE`` which the
reference updates non-transactionally per page). Finalize runs the cheap
df-cap aggregation over all committed pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.udfs import extract_text_index_udf, index_words_udf

__all__ = [
    "build_index",
    "ResumableIndexer",
    "MAX_URLS_PER_WORD",
    "MAX_DOC_FRACTION",
]

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


def _df_cap(n_docs: int) -> int:
    return int(min(MAX_URLS_PER_WORD, max(1, int(n_docs * MAX_DOC_FRACTION))))


class ResumableIndexer:
    """I5: chunked, marker-resumable index build over an immutable page
    snapshot (see module docstring for the protocol vs Indexer.java).

    The expensive phase — extraction + tokenization UDFs — runs once per
    chunk and is never repaid after a crash; the final df-cap aggregation
    is cheap and re-runs idempotently. Chunking is ``pmod(xxhash64(url),
    n_chunks)`` so membership is deterministic, partition-pruned at the
    pairs read (each chunk is its own append snapshot data dir), and
    independent of row order."""

    PAIRS_TABLE = "index_pairs"
    INDEX_TABLE = "index"

    def __init__(self, spark: SparkSession, catalog, n_chunks: int = 8):
        self.spark = spark
        self.cat = catalog
        self.n_chunks = n_chunks

    def done_chunks(self) -> set[int]:
        snap = self.cat.current_snapshot(self.PAIRS_TABLE) if self.cat.exists(
            self.PAIRS_TABLE
        ) else None
        if snap is None:
            return set()
        return set(snap.properties.get("done_chunks", []))

    def run(
        self, pages: DataFrame, url_col: str = "url", html_col: str = "html"
    ) -> DataFrame:
        """Index ``pages``, skipping chunks already committed by a prior
        (possibly crashed) run; returns the final (word, urls, df) index."""
        chunk_of = F.pmod(F.xxhash64(F.col(url_col)), F.lit(self.n_chunks))
        done = self.done_chunks()
        for chunk in range(self.n_chunks):
            if chunk in done:
                continue
            pairs = indexable_words(
                pages.where(chunk_of == chunk), url_col, html_col
            ).withColumn("chunk", F.lit(chunk))
            self.cat.write(
                self.PAIRS_TABLE,
                pairs,
                mode="append",
                properties={"done_chunks": sorted(done | {chunk})},
            )
            done.add(chunk)
        return self.finalize(pages, html_col=html_col)

    def finalize(self, pages: DataFrame, html_col: str = "html") -> DataFrame:
        """df-cap aggregation over all committed chunk pairs (idempotent;
        overwrites the index table)."""
        missing = set(range(self.n_chunks)) - self.done_chunks()
        if missing:
            raise RuntimeError(f"chunks not yet indexed: {sorted(missing)}")
        n_docs = pages.where(F.length(F.col(html_col)) >= MIN_PAGE_BYTES).count()
        cap = _df_cap(n_docs)
        index = (
            self.cat.read(self.spark, self.PAIRS_TABLE)
            .groupBy("word")
            .agg(
                F.slice(F.sort_array(F.collect_list("url")), 1, cap).alias("urls"),
                F.count("*").alias("df"),
            )
        )
        self.cat.write(self.INDEX_TABLE, index, mode="overwrite")
        return self.cat.read(self.spark, self.INDEX_TABLE)
