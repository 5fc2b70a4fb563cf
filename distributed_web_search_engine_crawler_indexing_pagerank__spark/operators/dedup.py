"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All built from JVM-side column expressions over MD5 (the one hash both
Spark and the DuckDB oracle compute identically), so every operator here
has an exact cross-engine oracle. Shared constants are imported by
``queries.py`` to generate the matching SQL.

Scale notes:
- exact dedup: one hash + one groupBy — the cheapest pass, always first.
- n-gram Jaccard: shingle explode + self-equi-join on shingle; at 100 TB
  the join is bounded by shingle-frequency skew — cap candidate
  generation per shingle (hot shingles are stopword-like and useless for
  dedup anyway); AQE skew-join handles the residue.
- MinHash+LSH: K hashes × shingles is a map-side expand; the per-(doc,
  seed) min is a partial-aggregating groupBy; band buckets make the
  candidate join linear in near-duplicates rather than quadratic.
- SimHash: 64 bit-sums per doc via one explode + groupBy; bucketing by
  16-bit prefix bounds the Hamming join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textops import tokens_col

__all__ = [
    "SHINGLE_N",
    "MAX_SHINGLE_DF",
    "MINHASH_K",
    "MINHASH_BANDS",
    "SIMHASH_BITS",
    "exact_dedup",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "embedding_near_dups",
]

SHINGLE_N = 3
# hot-shingle document-frequency cap: a shingle present in more documents
# than this is boilerplate (stopword-like), useless for dedup, and — being
# the join key — would make the self-join quadratic in its df. Dropped
# BEFORE the join on both the Spark and SQL-oracle sides.
MAX_SHINGLE_DF = 1000
MINHASH_K = 16
MINHASH_BANDS = 4  # → 4 rows per band
SIMHASH_BITS = 64
SIMHASH_PREFIX_BITS = 16  # bucketing for the Hamming join
SIMHASH_MAX_HAMMING = 8


# --- exact ------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, fp, keeper, is_dup): MD5-fingerprint groups; the minimum
    doc_id in each group is the keeper."""
    from .textops import fingerprint

    fp = fingerprint(df, text_col, id_col)
    w = Window.partitionBy("fp")
    return fp.select(
        id_col,
        "fp",
        F.min(id_col).over(w).alias("keeper"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
    )


# --- shingles / Jaccard -------------------------------------------------------

def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = SHINGLE_N
) -> DataFrame:
    """→ (doc_id, sh): distinct word n-gram shingles per document.
    Documents with fewer than ``n`` tokens yield no shingles (the
    short-doc guard: an unguarded descending sequence would make
    ``slice`` throw on i<0)."""
    toks = tokens_col(F.lower(F.col(text_col)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    min_jaccard: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """→ (doc_a, doc_b, inter, jaccard) for pairs sharing shingles with
    Jaccard ≥ threshold. jaccard rounded to 6 decimals.

    Hot shingles (document frequency > ``max_df``) are dropped before the
    self-join AND before the per-doc sizes, so jaccard stays consistent:
    it is exact Jaccard over the filtered shingle sets. The hot set is
    tiny by construction (each survivor appears in > max_df docs, so
    there are < N/max_df of them) → broadcast anti-join, no shuffle of
    the shingle table."""
    sh = shingles(df, text_col, id_col)
    if max_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df_sh"))
            .where(F.col("df_sh") > max_df)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "sh")
    b = sh.select(F.col(id_col).alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


# --- MinHash + LSH --------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = MINHASH_K
) -> DataFrame:
    """→ (doc_id, seed, sig): per-seed min of md5(seed:shingle) — the
    classic K-permutation MinHash approximated with salted hashes."""
    sh = shingles(df, text_col, id_col)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    return (
        sh.select(id_col, "sh", seeds)
        .withColumn(
            "h", F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("sh")))
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    min_est: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """→ (doc_a, doc_b, est_jaccard): candidates = pairs sharing ≥1 LSH
    band bucket; est_jaccard = matching-signature fraction, rounded 6."""
    sigs = minhash_signatures(df, text_col, id_col, k)
    rows_per_band = k // bands
    banded = sigs.withColumn("band", F.floor(F.col("seed") / rows_per_band))
    band_keys = banded.groupBy(id_col, "band").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "sig"))),
                    lambda s: s["sig"],
                ),
            )
        ).alias("bkey")
    )
    cand = (
        band_keys.select(F.col(id_col).alias("doc_a"), "band", "bkey")
        .join(band_keys.select(F.col(id_col).alias("doc_b"), "band", "bkey"), ["band", "bkey"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("doc_a"), "seed", F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("doc_b"), "seed", F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.sum((F.col("sig_a") == F.col("sig_b")).cast("int")) / F.lit(float(k)), 6
            ).alias("est_jaccard")
        )
    )
    return est.where(F.col("est_jaccard") >= min_est)


# --- SimHash ----------------------------------------------------------------------

def _bit_of_md5(digit_col, bit_in_digit: int):
    """bit value (0/1) of one hex digit, bit 0 = the 8s bit."""
    sets = {
        0: list("89abcdef"),
        1: list("4567cdef"),
        2: list("2367abef"),
        3: list("13579bdf"),
    }
    return F.when(digit_col.isin(sets[bit_in_digit]), 1).otherwise(0)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, simhash): 64-char '0'/'1' string. Bit b is set iff the
    majority of the doc's distinct tokens have bit b of md5(token) set
    (±1 vote per token). Bit b of the hash = bit (b%4, 8s-first) of hex
    digit b//4 — the exact construction the SQL oracle mirrors."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_col(F.lower(F.col(text_col))))).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok")))
    bits = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
        "h",
    ).withColumn("digit", F.substring(F.col("h"), (F.col("b") / 4 + 1).cast("int"), 1))
    vote = sum(
        F.when(
            (F.pmod(F.col("b"), F.lit(4)) == i) & (_bit_of_md5(F.col("digit"), i) == 1),
            1,
        ).otherwise(0)
        for i in range(4)
    )
    per_bit = (
        bits.withColumn("v", (vote * 2 - 1))
        .groupBy(id_col, "b")
        .agg((F.sum("v") > 0).cast("int").alias("bit"))
    )
    return (
        per_bit.groupBy(id_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b", "bit"))),
                    lambda s: s["bit"].cast("string"),
                ),
            ).alias("simhash")
        )
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_a, doc_b, hamming): near-dup pairs with Hamming ≤ max,
    candidate-bounded by equal 16-bit prefix buckets."""
    sh = simhash(df, text_col, id_col)
    pref = sh.withColumn("bucket", F.substring("simhash", 1, SIMHASH_PREFIX_BITS))
    a = pref.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("ha"), "bucket")
    b = pref.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("hb"), "bucket")
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split(F.col("ha"), ""), F.split(F.col("hb"), ""), lambda x, y: x != y
            ),
            lambda v: v,
        )
    )
    return (
        a.join(b, "bucket")
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --- embedding-cosine near-duplicates --------------------------------------

def embedding_near_dups(
    emb: DataFrame,
    min_cos: float = 0.2,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_a, vec_b, cos): pairs with cosine ≥ threshold, candidates
    bounded by equal sign-pattern buckets (near-identical vectors share
    the sign pattern of their leading dims with high probability — the
    same candidate-pruning shape as SimHash, over dense embeddings).
    At scale the bucket equi-join replaces the quadratic all-pairs scan;
    raising ``bits`` tightens candidates geometrically."""
    from .similarity import cosine, sign_bucket

    b = emb.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), bits).alias("bucket")
    )
    left = b.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"), "bucket")
    right = b.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        left.join(right, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= min_cos)
        .select("vec_a", "vec_b", "cos")
    )
