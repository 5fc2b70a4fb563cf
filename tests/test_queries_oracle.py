"""Driver-contract conformance: every queries() entry vs its DuckDB oracle.

Mimics the driver's CORRECTNESS gate: run the Spark DataFrame and the
oracle SQL on the same parquet tables, sort columns by name and rows by
value, and require exact equality (row count + schema width + values).
Rows-only queries (no oracle) are smoke-checked for non-empty stable
output.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        try:
            return _norm_cell(v.item())
        except Exception:
            return v
    return v


def _normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(type(v)), v if v is not None else "") for v in t),
    )
    return cols, data


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(_ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)
    assert sc == dc, f"{name}: column sets differ: {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row counts differ: {len(sr)} vs {len(dr)}"
    assert sr == dr, f"{name}: values differ (first spark={sr[:2]}, oracle={dr[:2]})"


@pytest.mark.parametrize(
    "name", sorted(set(_QUERIES) - set(_ORACLES))
)
def test_rows_only_query_runs(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert len(df.columns) >= 2
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_bench_headline_subset_of_registry():
    import importlib.util as iu

    spec = iu.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = iu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from distributed_web_search_engine_crawler_indexing_pagerank__spark import queries as Q

    missing = [n for n in bench.HEADLINE if n not in Q.QUERIES]
    assert not missing, missing


def test_media_features_jvm_matches_mapinpandas(spark):
    """r6 optimization parity: the JVM fake-decode expressions
    (extract_features_fake_jvm — what q_media_features now runs) must be
    value-identical to the mapInPandas plumbing path (extract_features,
    fake=True — what a real codec deployment would run), feature by
    feature, on the same media frame."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.multimodal import (
        extract_features,
        extract_features_fake_jvm,
        media_from_documents,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(64)
    media = media_from_documents(docs)
    a = {
        r["media_id"]: (r["mime"], r["n_bytes"], tuple(r["feature"]))
        for r in extract_features(media, fake=True).collect()
    }
    b = {
        r["media_id"]: (r["mime"], r["n_bytes"], tuple(r["feature"]))
        for r in extract_features_fake_jvm(media).collect()
    }
    assert a == b and len(a) == 64
