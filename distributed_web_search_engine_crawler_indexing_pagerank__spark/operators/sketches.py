"""Distributed sketches: KMV (k-minimum-values) distinct-count.

At 100 TB, exact ``COUNT(DISTINCT key)`` per group shuffles every
distinct key; a sketch caps the per-group state at ``k`` values. KMV is
chosen over HLL here because it is fully DETERMINISTIC given the hash
function — the estimate is a pure function of the input set, so the
DuckDB oracle reproduces it bit-for-bit (our correctness gate hashes
values; an approximate-but-nondeterministic sketch could never pass it).

Estimator (Bar-Yossef et al. 2002): hash each key to u ∈ [0,1); if the
group has ≥ k distinct hashes, the k-th smallest u_k estimates density
⇒ distinct ≈ (k-1)/u_k (unbiased); with < k distinct keys the sketch
holds them all and the count is EXACT. Standard error ≈ 1/sqrt(k-2).

Hash: first 15 hex chars of md5 (60 bits) / 16^15 — the same md5-derived
uniform used by the deterministic sampler (queries.q_sample), computable
identically in Spark (``conv(substr(md5(x),1,15),16,10)``) and DuckDB
(``('0x' || substr(md5(x),1,15))::BIGINT``).

Plan shape: one partial/final hash aggregate pair to dedupe (group, key)
— map-side combine absorbs in-partition repeats — then a k-bounded
window per group. Per-group state after dedup is the k minima only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["kmv_distinct", "KMV_HASH_DENOM"]

# 16^15: first-15-hex-chars md5 value space
KMV_HASH_DENOM = 16 ** 15


def kmv_distinct(
    df: DataFrame,
    key: str,
    by: list[str],
    k: int = 64,
    out_col: str = "est_distinct",
) -> DataFrame:
    """→ one row per ``by`` group: the KMV estimate of
    ``COUNT(DISTINCT key)`` as ``out_col`` (double; exact when the group
    has fewer than ``k`` distinct keys).

    ``key`` is hashed as a string — cast non-strings upstream so the
    oracle's CAST semantics match.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(key)), 1, 15), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(KMV_HASH_DENOM))
    )
    hashed = df.select(*by, u.alias("_u")).distinct()
    w = Window.partitionBy(*by).orderBy("_u")
    topk = hashed.select(
        *by, "_u", F.row_number().over(w).alias("_rk")
    ).where(F.col("_rk") <= k)
    return topk.groupBy(*by).agg(
        F.when(
            F.count("_u") < k, F.count("_u").cast("double")
        )
        .otherwise((k - 1) / F.max("_u"))
        .alias(out_col)
    )
