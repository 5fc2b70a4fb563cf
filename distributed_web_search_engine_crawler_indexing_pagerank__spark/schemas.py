"""Explicit StructTypes for every engine table.

The reference is schema-free (KVS rows of ``byte[]`` cells,
``src/kvs/Row.java:6-14``); our tables carry real types per SURVEY.md §1.4
and FIXTURES.md. The ``pages`` shape is the authoritative input_hint from
BASELINE.json: ``(url string, warc_ts timestamp, html binary, text string,
lang string)``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Authoritative input shape (BASELINE.json input_hint).
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# URL frontier (reference: pt-crawl-queue, src/jobs/Crawler.java:100-105,388).
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", StringType(), False),  # 40-char ref SHA-1 identity
        StructField("host", StringType(), False),  # host[:port] key
        StructField("depth", IntegerType(), False),  # BFS wave first enqueued
        StructField("discovered_at", LongType(), False),  # first-enqueue seq no.
    ]
)

# URL-seen ledger (reference: pt-crawl-visited, Crawler.java:411-418).
SEEN = StructType(
    [
        StructField("url_hash", StringType(), False),
        StructField("url", StringType(), False),
    ]
)

# Politeness / robots state (reference: `hosts` table, Crawler.java:676-762).
HOSTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("robots_fetched", BooleanType(), False),
        StructField("robots_status", IntegerType(), True),
        StructField("robots_txt", StringType(), True),
        StructField("crawl_delay", DoubleType(), False),
        StructField("last_access", DoubleType(), False),  # virtual seconds; -inf ⇒ never
        StructField("fetched_count", IntegerType(), False),
    ]
)

# Synthetic HTTP behavior — join target for the fetch stage (FIXTURES.md §5).
FETCH_RESPONSES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("head_status", IntegerType(), False),
        StructField("location", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("content_language", StringType(), True),
        StructField("body", BinaryType(), True),
    ]
)

# Crawled-pages output (reference: pt-crawl, Crawler.java:984-1019).
CRAWL = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", StringType(), False),
        StructField("host", StringType(), False),
        StructField("response_code", IntegerType(), False),
        StructField("content_type", StringType(), True),
        StructField("page", BinaryType(), True),
        StructField("length", IntegerType(), False),
        StructField("depth", IntegerType(), False),
        StructField("wave", IntegerType(), False),  # micro-iteration fetched in
    ]
)

# robots.txt catalog for the synthetic web (one row per host).
ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("robots_status", IntegerType(), False),
        StructField("robots_txt", StringType(), True),
    ]
)

# Inverted index (reference: pt-index, chunked columns → one array column).
INDEX = StructType(
    [
        StructField("word", StringType(), False),
        StructField("urls", ArrayType(StringType()), False),
        StructField("df", LongType(), False),
    ]
)
