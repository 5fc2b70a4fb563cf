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

__all__ = [
    "kmv_distinct",
    "kmv_signature",
    "kmv_pair_overlap",
    "hll_distinct",
    "hll_registers",
    "hll_merge_registers",
    "hll_estimate",
    "hll_oracle_sql",
    "cms_sketch",
    "cms_estimate",
    "CMS_D",
    "CMS_W",
    "KMV_HASH_DENOM",
    "HLL_M",
    "HLL_ALPHA",
    "HLL_RHO_CAP",
]

# 16^15: first-15-hex-chars md5 value space
KMV_HASH_DENOM = 16 ** 15

# --- HyperLogLog constants (Flajolet et al. 2007), shared verbatim with
# the generated SQL oracle so the two engines cannot drift -----------------
HLL_M = 64            # registers (p=6 bucket bits from the first 2 hex chars)
HLL_ALPHA = 0.709     # published alpha_64 bias constant
HLL_RHO_CAP = 32      # cap on the leading-zero rank, keeps 2^(CAP-M) integral
# Register sum is computed in EXACT integer arithmetic: each register M
# contributes 2^(CAP-M); the group total (≤ m·2^CAP = 2^38) fits a BIGINT,
# so the sum is addition-order-independent — unlike summing 2^-M doubles,
# whose rounding would depend on Spark's nondeterministic partial-agg order.
_HLL_POW = 2 ** HLL_RHO_CAP
# numerator alpha·m²·2^CAP precomputed HERE and emitted as one double
# literal on both sides, so multiplication order can't differ
_HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(_HLL_POW)


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


_HLL_SMALL = 2.5 * HLL_M  # below this raw estimate, use linear counting


def _hll_rho(tail):
    """Leading-zero rank of the 60-bit tail, computed on the HEX STRING
    with integer arithmetic only — no float log2, whose 1-ulp rounding
    near powers of two could disagree between the JVM and DuckDB's libm.
    rho = 4·(leading '0' hex chars) + (leading zero bits of the first
    non-zero hex digit) + 1, capped at HLL_RHO_CAP."""
    lz = F.length(F.regexp_extract(tail, "^0*", 0))
    # LEAST guard: at lz=15 (all-zero tail) substr would be '' — the
    # WHEN branch ignores d, but both engines must still evaluate it
    d = F.conv(tail.substr(F.least(lz, F.lit(14)) + 1, F.lit(1)), 16, 10).cast(
        "int"
    )
    extra = (
        F.when(d == 1, 3).when(d <= 3, 2).when(d <= 7, 1).otherwise(0)
    )
    return F.when(lz >= 15, F.lit(HLL_RHO_CAP)).otherwise(
        F.least(4 * lz + extra + 1, F.lit(HLL_RHO_CAP))
    )


def hll_distinct(
    df: DataFrame,
    key: str,
    by: list[str],
    out_col: str = "est_distinct",
) -> DataFrame:
    """HyperLogLog distinct-count per ``by`` group — deterministic, so
    exactly oracle-able (``hll_oracle_sql`` is generated from the same
    constants).

    Unlike KMV there is no per-group top-k window: registers are a pure
    two-level ``max`` aggregation (map-side combine absorbs repeats), so
    per-group state is HLL_M longs at ANY cardinality — the cheapest
    sketch here for 100 TB groupings. Duplicates need no pre-distinct:
    ``max`` is idempotent.

    ``key`` is hashed as a string — cast non-strings upstream so the
    oracle's CAST semantics match.
    """
    return hll_estimate(hll_registers(df, key, by), by, out_col)


def hll_registers(df: DataFrame, key: str, by: list[str]) -> DataFrame:
    """→ (by…, _b, _m): the HLL register table — max rho per (group,
    bucket). Registers MERGE by ``max`` (idempotent, commutative,
    associative), so register tables built over any partition of the
    data — including streaming micro-batches — fold to exactly the
    registers of the union: the streaming-parity primitive."""
    hx = F.md5(F.col(key))
    bucket = (F.conv(F.substring(hx, 1, 2), 16, 10).cast("int") % HLL_M).alias(
        "_b"
    )
    tail = F.substring(hx, 3, 15)
    return (
        df.select(*by, bucket, _hll_rho(tail).alias("_rho"))
        .groupBy(*by, "_b")
        .agg(F.max("_rho").alias("_m"))
    )


def hll_merge_registers(a: DataFrame, b: DataFrame, by: list[str]) -> DataFrame:
    """Fold two register tables (same ``by``) into one: per-register max."""
    return (
        a.unionByName(b).groupBy(*by, "_b").agg(F.max("_m").alias("_m"))
    )


def hll_estimate(
    regs: DataFrame, by: list[str], out_col: str = "est_distinct"
) -> DataFrame:
    """Estimate from a register table (:func:`hll_registers` output)."""
    # exact integer register sum: each register adds 2^(CAP-m); empty
    # registers (m=0) add 2^CAP each — order-independent BIGINT math
    agg = regs.groupBy(*by).agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(HLL_RHO_CAP) - F.col("_m")).cast("long")
        ).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    total = (F.col("_s") + (HLL_M - F.col("_nb")) * F.lit(_HLL_POW)).cast(
        "double"
    )
    raw = F.lit(_HLL_NUMER) / total
    v = (HLL_M - F.col("_nb")).cast("double")
    est = F.when(
        (raw <= F.lit(_HLL_SMALL)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(raw)
    return agg.select(*by, F.round(est, 4).alias(out_col))


def hll_oracle_sql(key_sql: str, table: str, by: list[str]) -> str:
    """The DuckDB oracle for :func:`hll_distinct`, generated from the
    SAME constants (HLL_M / HLL_RHO_CAP / alpha numerator) so the two
    engines cannot drift. ``key_sql`` must be a VARCHAR expression."""
    bys = ", ".join(by)
    return f"""
WITH h AS (
  SELECT {bys}, md5({key_sql}) AS hx FROM {table}
), t AS (
  SELECT {bys},
         CAST(('0x' || substr(hx, 1, 2))::BIGINT % {HLL_M} AS INT) AS b,
         substr(hx, 3, 15) AS tail,
         length(regexp_extract(substr(hx, 3, 15), '^0*', 0)) AS lz
  FROM h
), r AS (
  SELECT {bys}, b,
         CASE WHEN lz >= 15 THEN {HLL_RHO_CAP}
              ELSE LEAST(4 * lz
                   + CASE WHEN d = 1 THEN 3 WHEN d <= 3 THEN 2
                          WHEN d <= 7 THEN 1 ELSE 0 END + 1,
                   {HLL_RHO_CAP}) END AS rho
  FROM (SELECT {bys}, b, lz,
               ('0x' || substr(tail, LEAST(lz, 14) + 1, 1))::BIGINT AS d
        FROM t) s
), regs AS (
  SELECT {bys}, b, max(rho) AS m FROM r GROUP BY {bys}, b
), agg AS (
  SELECT {bys},
         sum(CAST(power(2, {HLL_RHO_CAP} - m) AS BIGINT))
           + ({HLL_M} - count(*)) * {_HLL_POW} AS s_total,
         {HLL_M} - count(*) AS v
  FROM regs GROUP BY {bys}
)
SELECT {bys},
       round(CASE WHEN {_HLL_NUMER!r} / CAST(s_total AS DOUBLE) <= {_HLL_SMALL!r}
                       AND v > 0
                  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(v AS DOUBLE))
                  ELSE {_HLL_NUMER!r} / CAST(s_total AS DOUBLE) END,
             4) AS est_distinct
FROM agg
"""


def kmv_signature(
    df: DataFrame, key: str, by: list[str], k: int = 64
) -> DataFrame:
    """Per-group KMV signature: the ``k`` smallest md5-uniform values of
    distinct ``key``s, as rows ``(*by, _u)``. This is the MERGEABLE form
    of the sketch — signatures union (then re-cap at k) across
    partitions, days, or groups, which is what sketch pipelines actually
    ship between stages at 100 TB; :func:`kmv_distinct` is the terminal
    estimate of the same construction."""
    u = (
        F.conv(F.substring(F.md5(F.col(key)), 1, 15), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(KMV_HASH_DENOM))
    )
    hashed = df.select(*by, u.alias("_u")).distinct()
    w = Window.partitionBy(*by).orderBy("_u")
    return (
        hashed.select(*by, "_u", F.row_number().over(w).alias("_rk"))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_pair_overlap(
    df: DataFrame, key: str, group_col: str, k: int = 64
) -> DataFrame:
    """Set algebra on KMV signatures: for every unordered pair of groups
    ``(ga < gb)``, estimate ``|A ∪ B|`` and Jaccard ``|A∩B|/|A∪B|``
    WITHOUT touching the raw sets again — everything below the signature
    build runs on ≤ k rows per group.

    Estimators (Beyer et al., "On synopses for distinct-value estimation
    under multiset operations", SIGMOD'07): take the k smallest values of
    sig(A) ∪ sig(B); union size is the KMV estimate on those, Jaccard is
    the fraction of them present in BOTH signatures. Deterministic
    (md5), so exactly oracle-able.

    The pair frame is broadcast — pairwise comparison is inherently
    O(G²) and meant for a bounded set of named cohorts; for all-pairs
    similarity over millions of groups use minhash LSH instead
    (operators/dedup.py), which buckets instead of enumerating.
    """
    sig = kmv_signature(df, key, [group_col], k).withColumnRenamed(
        group_col, "_g"
    )
    groups = sig.select("_g").distinct()
    pairs = groups.select(F.col("_g").alias("ga")).join(
        groups.select(F.col("_g").alias("gb")), F.col("ga") < F.col("gb")
    )
    marked = F.broadcast(pairs).join(
        sig, (sig["_g"] == F.col("ga")) | (sig["_g"] == F.col("gb"))
    )
    per_val = marked.groupBy("ga", "gb", "_u").agg(
        F.max(F.when(F.col("_g") == F.col("ga"), 1).otherwise(0)).alias(
            "in_a"
        ),
        F.max(F.when(F.col("_g") == F.col("gb"), 1).otherwise(0)).alias(
            "in_b"
        ),
    )
    w = Window.partitionBy("ga", "gb").orderBy("_u")
    top = per_val.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= k
    )
    agg = top.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("_u").alias("_mx"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("_both"),
    )
    return agg.select(
        "ga",
        "gb",
        F.round(
            F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
                (k - 1) / F.col("_mx")
            ),
            4,
        ).alias("est_union"),
        F.round(F.col("_both").cast("double") / F.col("_n"), 4).alias(
            "jaccard_est"
        ),
    )


# --- count-min sketch (Cormode & Muthukrishnan 2005) ----------------------
CMS_D = 3      # hash rows
CMS_W = 1024   # buckets per row


def cms_sketch(df: DataFrame, key: str, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Build a count-min sketch of ``key`` frequencies: ``(row, bucket,
    cnt)`` with d·w rows TOTAL regardless of input size — the frequency
    sketch that ships between stages at 100 TB. Deterministic (md5 with
    a per-row seed prefix), so estimates are exactly reproducible.

    The d-way row fan-out happens via ``explode`` BEFORE the count agg,
    and map-side partial aggregation collapses it to ≤ d·w rows per task
    before the one shuffle."""
    seeds = F.array(*[F.lit(s) for s in range(d)])
    fan = df.select(F.col(key).alias("_k")).select(
        F.explode(seeds).alias("_row"), "_k"
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("_row").cast("string"), F.lit(":"), F.col("_k"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        % w
    ).alias("_bucket")
    return (
        fan.select("_row", bucket)
        .groupBy("_row", "_bucket")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def cms_estimate(
    keys_df: DataFrame,
    sketch: DataFrame,
    key: str,
    d: int = CMS_D,
    w: int = CMS_W,
    out_col: str = "est_count",
) -> DataFrame:
    """Probe the sketch for every row of ``keys_df``: the estimate is
    ``min`` over the d rows of the hashed bucket's counter (an upper
    bound on the true count; collisions only inflate). The sketch is d·w
    rows — explicitly broadcast, so the probe is shuffle-free on the
    keys side beyond the d-way explode + per-key min agg."""
    seeds = F.array(*[F.lit(s) for s in range(d)])
    fan = keys_df.select(F.col(key)).distinct().select(
        key, F.explode(seeds).alias("_row")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("_row").cast("string"), F.lit(":"), F.col(key))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        % w
    ).alias("_bucket")
    probed = fan.select(key, "_row", bucket).join(
        F.broadcast(sketch), ["_row", "_bucket"], "left"
    )
    return probed.groupBy(key).agg(
        F.min(F.coalesce("_cnt", F.lit(0))).alias(out_col)
    )


# --- mergeable-state forms for streaming parity ---------------------------
# Each sketch in the family now has the same three-piece contract the
# HLL gained in round 4: build(batch) -> mergeable state, merge(a, b) ->
# state, estimate(state) -> answer, with merge idempotent-or-additive so
# folding per-micro-batch states into a catalog table yields EXACTLY the
# batch answer over the union of all batches (streaming/crawl_stream.py
# wires each into a foreachBatch fold).


def kmv_merge_signatures(
    a: DataFrame, b: DataFrame, by: list[str], k: int = 64
) -> DataFrame:
    """Fold two KMV signature tables (:func:`kmv_signature` output,
    same ``by``) into one: union, drop duplicate hash values (``_u`` is
    a pure function of the key, so cross-batch repeats collide exactly),
    re-cap at the ``k`` smallest per group. Top-k of a union equals
    top-k of the union of per-subset top-k's, so merge order never
    matters."""
    w = Window.partitionBy(*by).orderBy("_u")
    return (
        a.unionByName(b)
        .distinct()
        .select(*by, "_u", F.row_number().over(w).alias("_rk"))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_estimate_from_signature(
    sig: DataFrame,
    by: list[str],
    k: int = 64,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Terminal KMV estimate from a signature table — identical formula
    to :func:`kmv_distinct` (exact below ``k`` distinct keys, else
    ``(k-1)/max(u)``), so ``estimate(merge(sig(b1), sig(b2)))`` equals
    ``kmv_distinct(b1 ∪ b2)`` row-for-row."""
    return sig.groupBy(*by).agg(
        F.when(F.count("_u") < k, F.count("_u").cast("double"))
        .otherwise((k - 1) / F.max("_u"))
        .alias(out_col)
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two count-min sketches (:func:`cms_sketch` output, same
    d/w): counters are ADDITIVE across disjoint event sets — a stream's
    micro-batches partition the events, so the summed sketch equals the
    batch sketch over the union. State stays ≤ d·w rows."""
    return (
        a.unionByName(b)
        .groupBy("_row", "_bucket")
        .agg(F.sum("_cnt").alias("_cnt"))
    )
