"""Text-analysis operators for large-scale training-data pipelines.

All pure column expressions (JVM-side, whole-stage codegen — UDF-free):
token counting (whitespace + BPE-ish regex), language ID (marker-word
heuristic), quality scoring (length/alpha/stopword ratios), and document
fingerprinting (normalized-text MD5). Each has an exact ANSI-SQL oracle
(same constants) in ``queries.py``.

At 100 TB these run as a single scan + project per document batch — no
shuffle at all except where a groupBy is the point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "stratified_sample",
    "repetition_stats",
    "quality_filter",
    "WS_PATTERN",
    "BPE_PATTERN",
    "LANG_MARKERS",
    "QUALITY_STOPWORDS",
    "tokens_col",
    "spread",
    "token_counts",
    "lang_id",
    "quality_score",
    "fingerprint",
    "winnow_fingerprints",
    "WINNOW_K",
    "WINNOW_W",
    "WINNOW_MAX_CHARS",
]

WS_PATTERN = r"\s+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# Marker words per language for the n-gram/marker heuristic. Deterministic
# tie-break: (score desc, lang asc).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht"],
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "des"],
}

# Tiny fixed stoplist for the quality heuristic (NOT the reference's
# indexing stoplist — that one lives in javaport.tokenize).
QUALITY_STOPWORDS = ["the", "and", "of", "to", "in", "a", "is"]


def tokens_col(col: Column) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(col), WS_PATTERN)


def _parse_bytes(v: str) -> int:
    """Spark byte-size conf values accept suffixes ('128m', '1g', '256MB')
    — parse them like Spark's JavaUtils.byteStringAs (base 1024); fall
    back to the 128 MB default on anything unrecognized rather than
    crashing every spread()-using operator (r3 ADVICE)."""
    s = str(v).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40, "p": 1 << 50}
    try:
        if s and s[-1].isdigit():
            return int(s)
        num = s.rstrip("b").rstrip()
        if num and num[-1] in units:
            return int(float(num[:-1]) * units[num[-1]])
        return int(float(num))
    except (ValueError, IndexError):
        return 128 << 20


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure at least ``min_parts`` (default: cluster parallelism)
    scan tasks before a CPU-heavy per-row kernel.

    Parquet scans split by file and by ``files.maxPartitionBytes``; a
    tiny single-file input is a one-task scan, which serializes every
    downstream explode/hash regardless of cluster size. The split count
    is ESTIMATED from the leaf relations' file list (``df.inputFiles()``
    — logical-plan metadata, no job, no ``df.rdd`` physical-planning /
    AQE finalization, which could execute upstream stages). Derived
    (non-scan-rooted) inputs report no files and pass through untouched:
    they come out of shuffles already at ``shuffle.partitions``
    parallelism. At real scale scans carry plenty of splits and this is
    a no-op; it only repartitions when the scan genuinely under-splits —
    exactly the case where the shuffled bytes are small."""
    import os

    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df
    max_split = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    splits = 0
    for f in files:
        path = f[len("file:"):] if f.startswith("file:") else f
        try:
            size = os.path.getsize(path)
        except OSError:
            # remote / unstat-able storage: count the file as one split
            # (a lower bound — under-splitting there is the store's job)
            size = 0
        splits += max(1, -(-size // max_split))
        if splits >= target:
            return df
    return df.repartition(target)


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_ws_tokens, n_bpe_tokens, n_chars_norm)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(tokens_col(text)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        F.length(F.trim(text)).alias("n_chars_norm"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, pred_lang, marker_hits): argmax of distinct-token overlap
    with each language's marker list; ties break by language code."""
    toks = F.array_distinct(tokens_col(F.lower(F.col(text_col))))
    scored = df.select(
        F.col(id_col),
        *[
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
            ).alias(f"_s_{lang}")
            for lang, words in sorted(LANG_MARKERS.items())
        ],
    )
    # argmax via array_max over (score, neg-lang) structs: struct ordering
    # gives score desc / lang asc without a window.
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"_s_{lang}").alias("s"),
                    # invert lang for asc tie-break under max()
                    F.lit(-i).alias("inv"),
                    F.lit(lang).alias("lang"),
                )
                for i, lang in enumerate(sorted(LANG_MARKERS))
            ]
        )
    )
    return scored.select(
        id_col,
        best["lang"].alias("pred_lang"),
        best["s"].alias("marker_hits"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, alpha_ratio, stop_ratio, len_score, quality) — all
    rounded to 6 decimals for cross-engine comparability."""
    text = F.trim(F.col(text_col))
    toks = tokens_col(F.lower(text))
    n_tok = F.size(toks)
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")) / F.greatest(
        F.length(text), F.lit(1)
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
        )
    )
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    quality = F.round(
        F.lit(0.4) * alpha + F.lit(0.3) * stop_ratio + F.lit(0.3) * len_score, 6
    )
    return df.select(
        F.col(id_col),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(len_score, 6).alias("len_score"),
        quality.alias("quality"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, fp): MD5 of lowercase whitespace-collapsed text — the
    exact-dedup identity."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), WS_PATTERN, " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def stratified_sample(
    df: DataFrame,
    quota: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, strata): at most ``quota`` rows per stratum, chosen by
    md5(id) order — deterministic, engine-independent quota sampling
    (the per-language cap step of a training-data curation pipeline;
    a seeded ``df.sample`` is RNG/partitioning-dependent, a hash order
    is not). One window over the strata key: the same single-shuffle
    shape as any per-group top-k, so skewed strata behave exactly like
    any hot window key (AQE handles the residue; the quota bounds the
    output per stratum by construction)."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .select(F.col(id_col), F.col(strata_col))
    )


# Composite web-text curation rule thresholds (Gopher/RefinedWeb-style;
# shared with the SQL oracle in queries.py).
QF_MIN_TOKENS = 5
QF_MAX_TOKENS = 100_000
QF_MIN_ALPHA = 0.5
QF_MAX_DUP = 0.3
REP_N = 2


def _bigram_cols(text_col: str):
    """(n_grams, n_distinct, dup_fraction) over word 2-grams — shared by
    repetition_stats and quality_filter (all rounded/guarded the same
    way as the SQL oracle)."""
    toks = tokens_col(F.lower(F.trim(F.col(text_col))))
    grams = F.when(
        F.size(toks) >= REP_N,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - REP_N),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, REP_N)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    uniq = F.size(F.array_distinct(grams))
    dup = F.when(
        total > 0, F.round(F.lit(1.0) - uniq / total, 6)
    ).otherwise(F.lit(0.0))
    return total, uniq, dup


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, n_grams, n_distinct_grams, dup_gram_fraction): repeated
    word-bigram fraction — the standard repetition signal of web-text
    quality rules (a page whose bigrams are mostly duplicates is
    boilerplate/keyword-stuffing). Pure column expressions: one scan, no
    shuffle, no UDF."""
    total, uniq, dup = _bigram_cols(text_col)
    return df.select(
        F.col(id_col),
        total.alias("n_grams"),
        uniq.alias("n_distinct_grams"),
        dup.alias("dup_gram_fraction"),
    )


def quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, n_tokens, alpha_ratio, dup_gram_fraction, keep): the
    composite keep/drop curation rule — token-count window, alphabetic
    ratio floor, repetition ceiling — evaluated in ONE scan+project (no
    joins of the individual metric operators; at 100 TB the filter IS
    the scan). Thresholds are module constants shared with the oracle;
    comparisons run on the 6-decimal-rounded values so the keep bit is
    engine-independent."""
    text = F.trim(F.col(text_col))
    n_tok = F.size(tokens_col(F.lower(text)))
    alpha = F.round(
        F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
        / F.greatest(F.length(text), F.lit(1)),
        6,
    )
    _, _, dup = _bigram_cols(text_col)
    keep = (
        (n_tok >= QF_MIN_TOKENS)
        & (n_tok <= QF_MAX_TOKENS)
        & (alpha >= QF_MIN_ALPHA)
        & (dup <= QF_MAX_DUP)
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        alpha.alias("alpha_ratio"),
        dup.alias("dup_gram_fraction"),
        keep.alias("keep"),
    )


# --- winnowing fingerprints (Schleimer et al., SIGMOD 2003) ---------------
WINNOW_K = 8          # character k-gram length
WINNOW_W = 4          # winnowing window (grams per window)
WINNOW_MAX_CHARS = 1000  # normalize-then-cap: bounds the per-doc explode


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, n_grams, n_fps, fp_lo, fp_hi): winnowing summary — the
    rolling-hash document fingerprint (Schleimer et al. 2003): hash every
    k-char gram of the normalized text, then keep the minimum (hash, pos)
    of each sliding w-gram window. Guarantees any shared substring of
    length ≥ w+k-1 contributes a shared fingerprint, at ~2/(w+1) density
    — the plagiarism/near-dup primitive that md5-of-whole-doc
    (:func:`fingerprint`) and token-span coverage (dedup.dup-spans) both
    miss for partial overlap at character granularity.

    Deterministic (md5 grams; ties broken by position via lexicographic
    min over hash||lpad(pos)), so exactly oracle-able. Scale: the whole
    summary is per-document array algebra over the bounded normalized
    text (``_winnow_sel_arrays``) — ONE scan, ZERO exchanges (the r5
    form exploded O(chars) rows and shuffled them for a per-doc rolling
    window; the winnowing window never crosses documents, so the shuffle
    was pure overhead)."""
    base = _winnow_sel_arrays(df, text_col, id_col)
    fps = F.array_distinct(F.col("_sels"))
    return base.select(
        F.col(id_col),
        F.col("_n").cast("long").alias("n_grams"),
        F.size(fps).cast("long").alias("n_fps"),
        F.array_min(fps).alias("fp_lo"),
        F.array_max(fps).alias("fp_hi"),
    )


def _winnow_sel_arrays(
    df: DataFrame, text_col: str, id_col: str, with_pos: bool = True
) -> DataFrame:
    """Shared winnowing core → (id, _t, _n, _sels: array<string>) where
    ``_sels[i]`` is the window-selected hash||lpad(pos) entry at position
    ``p = W + i`` (the same values the r5 explode+window form produced,
    row-for-row). The rolling min over the w-gram window is computed with
    array higher-order functions INSIDE each row — no explode, no
    exchange, no per-doc sort — and is bounded by WINNOW_MAX_CHARS.
    Downstream per-doc summaries stay map-side; cross-doc consumers
    explode only the selected (~2/(w+1) density) fingerprints.

    EXPRESSION-SHAPE CONSTRAINT (hard-won): every array/string column
    here is referenced only in HOF *argument* position — never inside a
    lambda body. CollapseProject inlines a once-referenced alias into
    the expression that uses it, and an alias inlined into a lambda BODY
    is re-evaluated per element (an early draft with
    ``transform(seq, p -> array_min(slice(_g, p-3, 4)))`` went O(n²)
    per document and burned 12 minutes in one task). Arguments are
    evaluated once per row no matter what the optimizer inlines, so the
    k-gram build and the w-window min are zip_with cascades:
    ``g_{2k}[i] = g_k[i] || g_k[i+k]``, ``min_{2w}[i] = least(min_w[i],
    min_w[i+w])`` — O(L·log) total work, optimizer-proof."""
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), WS_PATTERN, " "),
        1,
        WINNOW_MAX_CHARS,
    )
    base = df.select(
        F.col(id_col),
        norm.alias("_t"),
        (F.length(norm) - (WINNOW_K - 1)).alias("_n"),
    ).where(F.col("_n") >= WINNOW_W)
    big = F.lit(WINNOW_MAX_CHARS)

    # k-char gram strings by length-doubling: levels[p][i] = chars i..i+p-1
    out = base.withColumn("_l1", F.split(F.col("_t"), ""))
    levels = {1: "_l1"}
    p = 1
    while p * 2 <= WINNOW_K:
        out = out.withColumn(
            f"_l{p * 2}",
            F.zip_with(
                F.col(levels[p]),
                F.slice(F.col(levels[p]), p + 1, big),
                lambda x, y: F.concat(x, y),
            ),
        )
        levels[p * 2] = f"_l{p * 2}"
        p *= 2
    # compose k from its binary decomposition (k=8 is one level, but stay
    # general): gram[i] = acc[i] || level_q[i+off]
    powers = [q for q in sorted(levels, reverse=True) if WINNOW_K & q]
    acc, off = F.col(levels[powers[0]]), powers[0]
    for q in powers[1:]:
        acc = F.zip_with(
            acc, F.slice(F.col(levels[q]), off + 1, big), lambda x, y: F.concat(x, y)
        )
        off += q
    grams = F.slice(acc, 1, F.col("_n"))  # exactly the _n k-grams, no null tail

    # hash||lpad(pos) entries; binary transform lambda → only lambda vars
    # in the body (i is 0-based). ``with_pos=False`` drops the position
    # suffix for consumers that strip it anyway (winnow_fp_rows): the
    # window min's HASH is identical either way — the 12-hex prefix
    # compares first, the pos suffix only tie-breaks EQUAL hashes, and a
    # tie's stripped value is that same hash — so the per-doc distinct
    # fingerprint set is unchanged while the cascade compares/carries
    # 12-char strings instead of 18 and skips the lpad/concat.
    if with_pos:
        entry = lambda x, i: F.concat(  # noqa: E731
            F.substring(F.md5(x), 1, 12),
            F.lpad((i + F.lit(1)).cast("string"), 6, "0"),
        )
    else:
        entry = lambda x, i: F.substring(F.md5(x), 1, 12)  # noqa: E731
    out = out.withColumn("_e", F.transform(grams, entry))
    # rolling min over the w-window by the same doubling cascade
    mins = {1: F.col("_e")}
    w = 1
    while w * 2 <= WINNOW_W:
        mins[w * 2] = F.zip_with(
            mins[w], F.slice(mins[w], w + 1, big), lambda x, y: F.least(x, y)
        )
        w *= 2
    wpowers = [q for q in sorted(mins, reverse=True) if WINNOW_W & q]
    macc, moff = mins[wpowers[0]], wpowers[0]
    for q in wpowers[1:]:
        macc = F.zip_with(
            macc, F.slice(mins[q], moff + 1, big), lambda x, y: F.least(x, y)
        )
        moff += q
    # position p = W..n ↔ index p-W+1 in the cascade output
    sels = F.slice(macc, 1, F.col("_n") - (WINNOW_W - 1))
    return out.withColumn("_sels", sels).select(id_col, "_t", "_n", "_sels")


def winnow_fp_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, fp) distinct: the POSITION-STRIPPED winnowing
    fingerprint set per document — the cross-document matching form.
    :func:`winnow_fingerprints` keeps hash||pos (localization); for
    doc-vs-doc overlap the position must come off, since the shared
    substring sits at different offsets in each document (Schleimer et
    al. 2003 §2: the fingerprint is the gram hash, positions travel as
    metadata). Per-doc dedup happens INSIDE the row (array_distinct) so
    only the ~2/(w+1)-density selected fingerprints are ever exploded —
    no corpus-wide distinct shuffle."""
    base = _winnow_sel_arrays(df, text_col, id_col, with_pos=False)
    return base.select(
        F.col(id_col), F.explode(F.array_distinct(F.col("_sels"))).alias("fp")
    )


def remove_dup_spans(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, cleaned, n_spans, chars_removed, n_kept): cut
    cross-document duplicated character spans OUT of each document —
    the exact-substring dedup transform (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better") built on the winnowing
    fingerprints, completing stats-only ``dup_spans``/``winnow`` into an
    actual curation rewrite.

    Semantics: a fingerprint selected in ≥2 documents marks its k-char
    gram as duplicated everywhere EXCEPT the owner (min doc_id) — the
    keep-first convention every dedup path here uses. Per doc, marked
    [pos, pos+k-1] spans merge into islands (gap-and-island windows),
    and the kept gaps concatenate in position order. Surgery operates on
    the winnow-normalized text (lowercased, whitespace-collapsed, capped
    at WINNOW_MAX_CHARS) — the form a training pipeline tokenizes.

    Scale shape: one O(chars) explode bounded per doc, ONE doc-keyed
    exchange reused by the rolling-min, island, and concat windows, and
    a linear fp-stats join (each fingerprint row meets exactly one stats
    row — no pairwise fan-out, unlike the pairs path, so no df cap is
    needed). Everything is JVM expressions; piece order is forced by
    array_sort on (start, piece) structs, not collect order.
    """
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), WS_PATTERN, " "),
        1,
        WINNOW_MAX_CHARS,
    )
    spine = df.select(
        F.col(id_col), norm.alias("_t"), F.length(norm).alias("_len")
    )
    # per-doc dedup inside the row (array_distinct over the selected
    # entries), then explode only the ~2/(w+1)-density fingerprints —
    # no O(chars) explode, no corpus-wide distinct shuffle (the r5 form
    # shuffled every gram position for the rolling window; see
    # _winnow_sel_arrays).
    # materialized ONCE (eager localCheckpoint): the span surgery below
    # consumes fpd through several join/window branches, and with the
    # zero-exchange array core there is no early shuffle whose reuse
    # would dedupe the recomputation — without this, each branch re-ran
    # the whole cascade (measured ~2x the query). The checkpointed frame
    # is the selected-fingerprint rows only (~2/(w+1) of positions).
    fpd = _winnow_sel_arrays(df, text_col, id_col).select(
        F.col(id_col), F.explode(F.array_distinct(F.col("_sels"))).alias("_sel")
    ).select(
        F.col(id_col),
        F.substring("_sel", 1, 12).alias("fp"),
        F.substring("_sel", 13, 6).cast("int").alias("pos"),
    ).localCheckpoint(eager=True)
    st = fpd.groupBy("fp").agg(
        F.count_distinct(F.col(id_col)).alias("nd"),
        F.min(id_col).alias("owner"),
    )
    spans = (
        fpd.join(st, "fp")
        .where((F.col("nd") >= 2) & (F.col(id_col) != F.col("owner")))
        .select(
            id_col,
            F.col("pos").alias("s"),
            (F.col("pos") + WINNOW_K - 1).alias("e"),
        )
    )
    w_ord = Window.partitionBy(id_col).orderBy("s", "e")
    prev_e = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = spans.select(
        id_col,
        "s",
        "e",
        F.when(prev_e.isNull() | (F.col("s") > prev_e + 1), 1)
        .otherwise(0)
        .alias("_ni"),
    )
    islands = (
        marked.withColumn(
            "_isl",
            F.sum("_ni").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "_isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    isl_stats = islands.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("chars_removed"),
        F.max("e").alias("_max_e"),
    )
    w_isl = Window.partitionBy(id_col).orderBy("s")
    mid_head_gaps = islands.select(
        id_col,
        F.coalesce(F.lag("e").over(w_isl) + 1, F.lit(1)).alias("gs"),
        (F.col("s") - 1).alias("ge"),
    )
    tail_gaps = isl_stats.join(spine, id_col).select(
        id_col, (F.col("_max_e") + 1).alias("gs"), F.col("_len").alias("ge")
    )
    pieces = (
        mid_head_gaps.unionByName(tail_gaps)
        .where(F.col("ge") >= F.col("gs"))
        .join(spine, id_col)
        .select(
            id_col,
            "gs",
            F.expr("substring(_t, gs, ge - gs + 1)").alias("piece"),
        )
    )
    stitched = pieces.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("gs", "piece"))),
                lambda x: x["piece"],
            ),
            "",
        ).alias("_stitched")
    )
    return (
        spine.join(isl_stats, id_col, "left")
        .join(stitched, id_col, "left")
        .select(
            id_col,
            F.when(
                F.col("n_spans").isNotNull(),
                F.coalesce(F.col("_stitched"), F.lit("")),
            )
            .otherwise(F.col("_t"))
            .alias("cleaned"),
            F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
            F.coalesce(F.col("chars_removed"), F.lit(0)).alias(
                "chars_removed"
            ),
        )
        .withColumn("n_kept", F.length("cleaned"))
    )
