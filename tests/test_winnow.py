"""Winnowing fingerprints: the Schleimer guarantee (any shared substring
of length >= w+k-1 yields a shared fingerprint), selection density, and
partitioning-invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.textops import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    sel = winnow_fingerprints(df)
    return {r["doc_id"]: r for r in sel.collect()}


def _fp_sets(spark, rows):
    """Recompute the full fingerprint SETS (not just the summary) via the
    same operator internals, for overlap assertions."""
    df = spark.createDataFrame(rows, "doc_id string, text string")
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators import textops as T

    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), T.WS_PATTERN, " "),
        1,
        T.WINNOW_MAX_CHARS,
    )
    base = df.select(
        "doc_id", norm.alias("_t"), (F.length(norm) - (T.WINNOW_K - 1)).alias("_n")
    ).where(F.col("_n") >= T.WINNOW_W)
    from pyspark.sql import Window

    grams = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("_p"),
        F.col("_t"),
    ).select(
        "doc_id",
        "_p",
        F.substring(F.md5(F.expr(f"substring(_t, _p, {T.WINNOW_K})")), 1, 12).alias("_h"),
    )
    # hash-only selection (ignore position component) for set overlap
    w = Window.partitionBy("doc_id").orderBy("_p").rowsBetween(-(T.WINNOW_W - 1), 0)
    sel = grams.select("doc_id", "_p", F.min("_h").over(w).alias("_s")).where(
        F.col("_p") >= T.WINNOW_W
    )
    out = {}
    for r in sel.select("doc_id", "_s").distinct().collect():
        out.setdefault(r["doc_id"], set()).add(r["_s"])
    return out


def test_shared_substring_shares_a_fingerprint(spark):
    # guarantee: any common substring of length >= w+k-1 (= 11) chars
    # produces at least one common selected hash
    common = "zqxjvzqxjvwmbf"  # 14 chars, rare letters — no WS collapse
    rows = [
        ("a", "aaaaaaaa" + common + "bbbbbbbbbb"),
        ("b", "cccccccccccc" + common + "dddd"),
        ("c", "eeeeeeeeeeeeeeeeeeeeeeeeeee"),
    ]
    sets = _fp_sets(spark, rows)
    assert sets["a"] & sets["b"], (sets["a"], sets["b"])
    assert not (sets["a"] & sets["c"])


def test_density_and_summary_shape(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    text = "".join(rng.choice(list("abcdefghijklmnop qrstuvwxyz"), 800))
    got = _fps(spark, [("d", text)])["d"]
    assert got["n_grams"] > 700
    # winnowing density ~ 2/(w+1) = 0.4; allow broad band
    frac = got["n_fps"] / got["n_grams"]
    assert 0.15 < frac < 0.6, got
    assert got["fp_lo"] <= got["fp_hi"]


def test_winnow_partitioning_invariant(spark):
    rows = [(f"d{i}", f"text number {i} with some repeated filler words "
             f"and enough length to produce grams {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    a = sorted(map(tuple, winnow_fingerprints(df).collect()))
    b = sorted(map(tuple, winnow_fingerprints(df.repartition(7)).collect()))
    assert a == b and len(a) == 40


def test_winnow_pairs_catch_shared_substring_and_feed_components(spark):
    """The r4 verdict #5 integration: fingerprint-overlap pairs find the
    docs sharing a long substring (at DIFFERENT offsets — the position-
    stripped form), and the pairs feed dup_components into one group;
    the unrelated doc stays out."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.dedup import (
        dup_components,
        winnow_overlap_pairs,
    )

    common = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [
        ("a", "PREFIX-A " + common),
        ("b", "a totally different and much longer prefix here " + common),
        ("c", common + " SUFFIX-C trailing content"),
        ("z", "unrelated text with no shared character runs at all, "
              "padded out to comfortably clear the minimum gram count"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = winnow_overlap_pairs(df, min_jaccard=0.2)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}, got
    comp = dup_components(pairs, id_a="doc_a", id_b="doc_b")
    by_doc = {r[0]: r[1] for r in comp.collect()}
    assert by_doc == {"a": "a", "b": "a", "c": "a"}, by_doc


def test_winnow_pairs_position_invariant(spark):
    """Same substring at different offsets must still pair — the whole
    reason the pair join strips positions off the fingerprints."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    core = "copied paragraph body shared verbatim between both docs " * 2
    rows = [("x", core + "x-only tail"), ("y", "y-only very long head padding before " + core)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = winnow_overlap_pairs(df, min_jaccard=0.1).collect()
    assert len(got) == 1 and got[0]["doc_a"] == "x" and got[0]["doc_b"] == "y"
    assert 0 < got[0]["jaccard"] <= 1
