"""SQL registration surface: registered scalar UDFs agree with their
column-API twins, the grouped-agg UDAF is usable in SQL GROUP BY, and
UDTFs run via LATERAL and agree with explode(split(...))."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.functions.registry import (
    register_sql_functions,
)


def test_registered_scalar_udfs_match_column_api(spark):
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.functions.exprs import (
        ref_hash_col,
        host_key_col,
    )

    register_sql_functions(spark)
    urls = [
        ("https://en.wikipedia.org/wiki/Apache_Spark",),
        ("http://example.com:8080/a/b?q=1",),
        ("https://Example.COM/",),
    ]
    df = spark.createDataFrame(urls, "url string")
    df.createOrReplaceTempView("u")
    got = spark.sql(
        "SELECT url, ref_hash(url) AS h, host_key(url) AS hk FROM u"
    ).collect()
    exp = df.select(
        "url",
        ref_hash_col(F.col("url")).alias("h"),
        host_key_col(F.col("url")).alias("hk"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_geo_mean_udaf_in_sql_group_by(spark):
    register_sql_functions(spark)
    rows = [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 27.0), ("b", 9.0)]
    spark.createDataFrame(rows, "g string, v double").createOrReplaceTempView(
        "gm"
    )
    got = {
        r["g"]: r["m"]
        for r in spark.sql(
            "SELECT g, geo_mean(v) AS m FROM gm GROUP BY g"
        ).collect()
    }
    assert math.isclose(got["a"], 4.0, rel_tol=1e-9)
    assert math.isclose(got["b"], 9.0, rel_tol=1e-9)


def test_split_terms_udtf_lateral_matches_explode(spark):
    register_sql_functions(spark)
    rows = [(1, "The quick  brown Fox"), (2, "jumps"), (3, None)]
    spark.createDataFrame(rows, "doc_id int, text string").createOrReplaceTempView(
        "docs_t"
    )
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT d.doc_id, t.pos, t.token "
                "FROM docs_t d, LATERAL split_terms(d.text) t"
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT doc_id, posexplode(split(lower(trim(text)), '\\\\s+')) "
                "AS (pos, token) FROM docs_t WHERE text IS NOT NULL"
            ).collect(),
        )
    )
    assert got == exp and len(got) == 5


def test_url_parts_udtf(spark):
    register_sql_functions(spark)
    got = spark.sql(
        "SELECT * FROM url_parts('https://example.com:8080/a/b')"
    ).first()
    assert tuple(got) == ("https", "example.com:8080", "/a/b")
    got2 = spark.sql("SELECT * FROM url_parts('example.com')").first()
    assert tuple(got2) == (None, "example.com", "/")
