"""Registry queries must not touch the RDD API during construction.

``DataFrame.rdd`` finalizes the adaptive plan and can execute upstream
stages (the r2 ADVICE finding against ``spread()``); this regression
test patches the property to raise, then CONSTRUCTS every registry
query. Queries that legitimately run driver-side jobs during
construction (iterative training/collect loops) still must not reach
``.rdd`` — actions like collect()/first() go through the JVM dataframe
API, not the Python RDD bridge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from distributed_web_search_engine_crawler_indexing_pagerank__spark.queries import QUERIES


def test_registry_construction_never_touches_rdd(spark, sf_dir, monkeypatch):
    def boom(self):
        raise AssertionError(".rdd touched during query construction")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    for name, (fn, _sql) in QUERIES.items():
        df = fn(spark, sf_dir)  # lazy construction (+ any driver-side setup)
        assert df is not None, name


def test_parse_bytes_accepts_spark_suffixes():
    """spark.sql.files.maxPartitionBytes may be set with size suffixes
    ('128m', '256MB') — spread() must parse them instead of crashing
    (r3 ADVICE low)."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.textops import (
        _parse_bytes,
    )

    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("256MB") == 256 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("not-a-size") == 128 << 20  # safe fallback
