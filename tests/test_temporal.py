"""asof_join: semantics vs pandas.merge_asof and the scale-shape invariant
(one keyed exchange + window, NO join operator — the naive per-key range
join Catalyst would build is quadratic in events per key)."""

from __future__ import annotations

import datetime as dt
import io
from contextlib import redirect_stdout

import pandas as pd
from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.temporal import (
    asof_join,
)


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _fixture(spark):
    left = spark.createDataFrame(
        [(u, _ts(s), f"L{u}-{s}") for u, s in
         [(1, 5), (1, 10), (1, 3), (2, 7), (3, 1)]],
        "user_id int, ts timestamp, lpay string",
    )
    right = spark.createDataFrame(
        [(u, _ts(s), f"R{u}-{s}", float(s)) for u, s in
         [(1, 4), (1, 10), (1, 8), (2, 9), (4, 2)]],
        "user_id int, ts timestamp, rpay string, rval double",
    )
    return left, right


def test_asof_matches_pandas_merge_asof(spark):
    left, right = _fixture(spark)
    got = (
        asof_join(left, right, on="ts", by="user_id")
        .orderBy("user_id", "ts")
        .toPandas()
    )
    exp = pd.merge_asof(
        left.toPandas().sort_values("ts"),
        right.toPandas().sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",  # most recent at-or-before, inclusive
        suffixes=("", "_r"),
    ).sort_values(["user_id", "ts"]).reset_index(drop=True)
    assert list(got["lpay"]) == list(exp["lpay"])
    assert list(got["r_rpay"].fillna("-")) == list(exp["rpay"].fillna("-"))
    # exact-ts row matches (inclusive): left (1,10) -> right (1,10)
    row = got[(got.user_id == 1) & (got.ts == _ts(10))].iloc[0]
    assert row["r_rpay"] == "R1-10"
    # key with no right rows at all -> null payload, row kept
    assert got[got.user_id == 3]["r_rpay"].isna().all()


def test_asof_payload_columns_come_from_same_right_row(spark):
    left, right = _fixture(spark)
    got = asof_join(left, right, on="ts", by="user_id").toPandas()
    matched = got[got["r_rpay"].notna()]
    # rval was built as float(seconds of rpay) — rows must agree pairwise
    for _, r in matched.iterrows():
        assert r["r_rpay"].endswith(f"-{int(r['r_rval'])}")


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _fixture(spark)
    got = (
        asof_join(
            left, right, on="ts", by="user_id",
            tolerance=F.expr("INTERVAL 2 SECONDS"),
        )
        .toPandas()
        .set_index(["user_id", "ts"])
    )
    # left (1,5) matched (1,4): 1s old -> kept
    assert got.loc[(1, _ts(5)), "r_rpay"] == "R1-4"
    # left (2,7): nearest right is (2,9) in the future; no match either way
    assert pd.isna(got.loc[(2, _ts(7)), "r_rpay"])
    # left (1,3) matched nothing <= 3 -> still null
    assert pd.isna(got.loc[(1, _ts(3)), "r_rpay"])


def test_asof_plan_has_window_not_join(spark):
    left, right = _fixture(spark)
    df = asof_join(left, right, on="ts", by="user_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
               "CartesianProduct", "ShuffledHashJoin"):
        assert op not in plan, f"asof_join must not plan a {op}"
    # exactly one keyed exchange feeds the window (union is exchange-free);
    # formatted mode prints each node once in the tree ("+- Exchange (n)")
    tree = plan.split("\n\n")[0]
    assert sum("Exchange" in line for line in tree.splitlines()) == 1
    assert "hashpartitioning(user_id" in plan


# --------------------------------------------------------------------------
# range_join
# --------------------------------------------------------------------------

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.temporal import (  # noqa: E402
    range_join,
)


def _range_fixture(spark):
    intervals = spark.createDataFrame(
        [
            ("i1", _ts(10), _ts(70)),     # crosses a 60s bucket boundary
            ("i2", _ts(100), _ts(100)),   # zero-length interval
            ("i3", _ts(200), _ts(500)),   # spans many buckets
            ("i4", _ts(1000), _ts(1010)), # matches nothing
        ],
        "iid string, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [(f"p{s}", _ts(s)) for s in [9, 10, 65, 70, 71, 100, 350, 500]],
        "pid string, p_ts timestamp",
    )
    return points, intervals


def test_range_join_matches_naive_theta_join(spark):
    points, intervals = _range_fixture(spark)
    got = sorted(
        (r.iid, r.pid)
        for r in range_join(
            points, intervals, "p_ts", "start_ts", "end_ts", bucket_width=60
        ).collect()
    )
    exp = sorted(
        (r.iid, r.pid)
        for r in intervals.join(
            points,
            (F.col("start_ts") <= F.col("p_ts"))
            & (F.col("p_ts") <= F.col("end_ts")),
        ).collect()
    )
    assert got == exp
    # spot invariants: inclusive both ends, zero-length hits its point,
    # boundary-crossing interval found across buckets, no dup pairs
    assert ("i1", "p10") in got and ("i1", "p70") in got
    assert ("i1", "p9") not in got and ("i1", "p71") not in got
    assert ("i2", "p100") in got
    assert ("i3", "p350") in got and ("i3", "p500") in got
    assert len(got) == len(set(got))


def test_range_join_plan_is_equi_join_not_nested_loop(spark):
    points, intervals = _range_fixture(spark)
    df = range_join(
        points, intervals, "p_ts", "start_ts", "end_ts", bucket_width=60
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the range condition rides the equi-join as a residual, not a theta plan
    assert any(
        j in plan
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )


# --------------------------------------------------------------------------
# randomized (seeded) equivalence sweeps — denser edge coverage than the
# hand fixtures: duplicate timestamps across keys, empty sides per key,
# interval nesting/overlap, boundary-exact points
# --------------------------------------------------------------------------

import numpy as np
import pandas as pd


def test_asof_join_randomized_vs_pandas(spark):
    rng = np.random.RandomState(7)
    n_l, n_r = 300, 400
    lpdf = pd.DataFrame({
        "user_id": rng.randint(0, 12, n_l),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 5000, n_l), unit="s"),
        "lv": np.arange(n_l),
    })
    rpdf = pd.DataFrame({
        "user_id": rng.randint(0, 15, n_r),  # some keys never on left
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 5000, n_r), unit="s"),
        "rv": np.arange(n_r),
    })
    # unique (key, ts) on the right: the operator's documented
    # determinism precondition (pandas asserts it via allow_exact_matches)
    rpdf = rpdf.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on="ts",
            by="user_id",
        )
        .toPandas()
        .sort_values(["user_id", "ts", "lv"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            lpdf.sort_values("ts", kind="mergesort"),
            rpdf.sort_values("ts", kind="mergesort"),
            on="ts",
            by="user_id",
            direction="backward",
        )
        .sort_values(["user_id", "ts", "lv"])
        .reset_index(drop=True)
    )
    assert list(got["lv"]) == list(exp["lv"])
    pd.testing.assert_series_equal(
        got["r_rv"], exp["rv"], check_names=False, check_dtype=False
    )


def test_range_join_randomized_vs_theta(spark):
    rng = np.random.RandomState(11)
    base = pd.Timestamp("2024-01-01")
    starts = rng.randint(0, 4000, 120)
    ipdf = pd.DataFrame({
        "iid": np.arange(120),
        "start_ts": base + pd.to_timedelta(starts, unit="s"),
        "end_ts": base
        + pd.to_timedelta(starts + rng.randint(0, 900, 120), unit="s"),
    })
    ppdf = pd.DataFrame({
        "pid": np.arange(500),
        "p_ts": base + pd.to_timedelta(rng.randint(0, 5000, 500), unit="s"),
    })
    intervals = spark.createDataFrame(ipdf)
    points = spark.createDataFrame(ppdf)
    for width in (60, 300, 1024):
        got = sorted(
            (r.iid, r.pid)
            for r in range_join(
                points, intervals, "p_ts", "start_ts", "end_ts", width
            ).collect()
        )
        exp = sorted(
            (r.iid, r.pid)
            for r in intervals.join(
                points,
                (F.col("start_ts") <= F.col("p_ts"))
                & (F.col("p_ts") <= F.col("end_ts")),
            ).collect()
        )
        assert got == exp, f"width={width}"
        assert len(got) == len(set(got)), f"width={width}: dup pairs"
