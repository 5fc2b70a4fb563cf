"""Temporal operators: as-of join, bucketed range (interval) join.

Both are named examples of operators Spark's built-in surface lacks;
each is a COMPOSITION of built-ins with the plan you'd want at scale:

- ``asof_join``: the naive plan is a per-key range join that Catalyst
  executes as a per-key cartesian — quadratic in events per key. Here:
  tag both sides, union, one window over (key, ts) carrying the last
  right-row payload forward — a single hash exchange on the key plus an
  in-partition sort, linear in rows, no join operator at all,
  whole-stage codegen throughout.
- ``range_join``: point-in-interval overlap with NO equi key. Catalyst
  plans a bare ``start <= p AND p <= end`` join as
  BroadcastNestedLoopJoin / cartesian — O(points × intervals). Here
  both sides are mapped to fixed-width time buckets (intervals explode
  to the buckets they cover) and the join becomes an equi-join on the
  bucket plus a residual filter — shuffle-partitionable, skew-visible,
  and each (interval, point) pair meets in exactly ONE bucket (the
  point's), so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tolerance: Column | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """→ every ``left`` row + the payload of the most recent ``right``
    row with ``right.on <= left.on`` within the same ``by`` key (null
    payload when no such row exists — left-asof semantics, like pandas
    ``merge_asof``).

    The whole right row rides forward as ONE struct, so all matched
    payload columns come from the SAME right row even when some of its
    fields are null. A right row at exactly ``left.on`` matches
    (inclusive); among right rows sharing (by, on) the physically last
    in the window sort wins — pass unique ``on`` values or pre-dedupe
    for full determinism. ``tolerance`` (a Column whose type matches
    ``left.on - right.on`` arithmetic) nulls matches older than
    ``left.on - tolerance``.

    Output: ``by``, ``on`` (left's), the left payload columns, and each
    right payload column as ``right_prefix + name``.
    """
    lcols = [c for c in left.columns if c not in (on, by)]
    rcols = [c for c in right.columns if c not in (on, by)]
    r_struct = F.struct(
        F.col(on).alias("_on"), *[F.col(c).alias(c) for c in rcols]
    )
    l_tagged = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("_is_l"),
        *lcols,
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        r_struct.alias("_r"),
    )
    # right rows sort before left rows at equal `on` (_is_l 0 < 1) so the
    # at-or-before match is inclusive
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = (
        l_tagged.unionByName(r_tagged)
        .select(
            by, on, "_is_l", *lcols,
            F.last("_r", ignorenulls=True).over(w).alias("_r"),
        )
        .where(F.col("_is_l") == 1)
    )
    match = F.col("_r")
    if tolerance is not None:
        match = F.when(
            F.col("_r").isNotNull()
            & ((F.col(on) - F.col("_r")["_on"]) <= tolerance),
            F.col("_r"),
        )
    return u.select(
        by, on, *lcols,
        *[match[c].alias(right_prefix + c) for c in rcols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """→ every (interval row ⨯ point row) pair with
    ``start_col <= point_col <= end_col`` (inclusive both ends), as all
    interval columns + all point columns. No equi key required.

    ``point_col``/``start_col``/``end_col`` are timestamps;
    ``bucket_width`` is the routing bucket in SECONDS. Pick it near the
    median interval length: each interval fans out to
    ``len/bucket_width + 1`` bucket rows (explosion factor), while a
    too-wide bucket piles unrelated points into one join group. Giant
    outlier intervals fan out proportionally — bound them upstream or
    raise the width. Column names must not collide across the inputs.
    """
    p_bkt = F.floor(F.unix_timestamp(F.col(point_col)) / bucket_width)
    i_lo = F.floor(F.unix_timestamp(F.col(start_col)) / bucket_width)
    i_hi = F.floor(F.unix_timestamp(F.col(end_col)) / bucket_width)
    p = points.select(p_bkt.alias("_bkt"), *points.columns)
    i = intervals.select(
        F.explode(F.sequence(i_lo, i_hi)).alias("_bkt"), *intervals.columns
    )
    return (
        i.join(p, on="_bkt")
        .where(
            (F.col(start_col) <= F.col(point_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bkt")
    )
