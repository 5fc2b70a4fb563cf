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


def test_remove_dup_spans_semantics(spark):
    """Span-removal rewrite: the owner (min doc_id) keeps its text, the
    copier's shared region is excised, disjoint docs and too-short docs
    pass through unchanged, and stats are consistent with the rewrite."""
    from pyspark.sql import functions as F

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.textops import (
        remove_dup_spans,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma " + shared + " delta epsilon zeta"),
            (1, "one two three " + shared + " four five six"),
            (2, "completely unrelated text about engines"),
            (3, "tiny"),  # below the winnow minimum: untouched
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_dup_spans(docs).collect()}
    assert set(out) == {0, 1, 2, 3}
    # owner keeps everything
    assert out[0]["n_spans"] == 0 and shared in out[0]["cleaned"]
    # copier: the shared region is (mostly) gone — winnowing guarantees a
    # fingerprint inside any match of length >= w+k-1, so the bulk of the
    # 59-char span is excised; edges may survive at gram granularity
    assert out[1]["n_spans"] >= 1
    assert out[1]["chars_removed"] > len(shared) - 16
    assert "quick brown fox" not in out[1]["cleaned"]
    assert out[1]["cleaned"].startswith("one two three")
    assert out[1]["cleaned"].endswith("four five six")
    # stats reconcile: kept + removed == normalized length
    norm1 = " ".join(("one two three " + shared + " four five six").split())
    assert out[1]["n_kept"] + out[1]["chars_removed"] == len(norm1)
    # untouched docs
    assert out[2]["cleaned"] == "completely unrelated text about engines"
    assert out[3]["cleaned"] == "tiny" and out[3]["n_spans"] == 0


def test_remove_dup_spans_identical_copies_empty_non_owner(spark):
    """Three identical documents: the owner survives intact, every other
    copy is cut to (near) nothing — the keep-first whole-doc limit case."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.operators.textops import (
        remove_dup_spans,
    )

    body = " ".join(f"token{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(i, body) for i in range(3)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in remove_dup_spans(docs).collect()}
    assert out[0]["cleaned"] == body and out[0]["chars_removed"] == 0
    for i in (1, 2):
        # everything from the first selected gram onward is removed;
        # only the pre-first-window prefix can survive
        assert out[i]["n_kept"] < 16
        assert out[i]["chars_removed"] > len(body) - 16
