"""salted_join: result-identical to the plain equi-join (inner + left),
actually spreads a hot key across salts, and the shuffle keys include
the salt when the join does shuffle."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.skew import (
    salted_join,
)


def _fixture(spark):
    # key "hot" is 90% of the big side; "absent" has no small-side match
    big = spark.createDataFrame(
        [("hot", i) for i in range(180)]
        + [("cold", i) for i in range(15)]
        + [("absent", i) for i in range(5)],
        "k string, payload int",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unseen", "U")], "k string, attr string"
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, how):
    big, small = _fixture(spark)
    got = sorted(
        map(tuple, salted_join(big, small, on="k", n_salts=8, how=how)
            .select("k", "payload", "attr").collect())
    )
    exp = sorted(
        map(tuple, big.join(small, on="k", how=how)
            .select("k", "payload", "attr").collect())
    )
    assert got == exp


def test_salted_join_spreads_hot_key(spark):
    big, small = _fixture(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    n_buckets = (
        big.where(F.col("k") == "hot")
        .select(salt.alias("s")).distinct().count()
    )
    assert n_buckets >= 6  # 180 rows over 8 salts: all-in-one would be skew


def test_salted_join_rejects_small_side_outer(spark):
    big, small = _fixture(spark)
    with pytest.raises(ValueError):
        salted_join(big, small, on="k", how="right")


def test_salted_join_shuffles_on_key_plus_salt(spark):
    big, small = _fixture(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = salted_join(big, small, on="k", n_salts=8)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "hashpartitioning(_salt" in plan, plan
