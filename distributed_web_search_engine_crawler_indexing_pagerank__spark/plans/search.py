"""Query-time scoring pipeline (reference: ``src/frontend/``).

The reference serves a query with N·(W+1) KVS point reads in a serial
loop (SURVEY.md §3.3) — posting lookup per word, then per candidate one
``getRow`` per query word for tfidf and one for pagerank metadata
(``ResultPageHandler.java:101-191``, ``KVSStorage.java:101-193``). Here
the whole thing is one declarative plan: explode postings → conjunctive
AND via match-count (Q4) → join tfidf + pageranks → score expression
(Q5) → title-dedupe window + order/limit (Q6). Point-read storms become
joins (SURVEY.md §4.3).

Score (ResultPageHandler.java:101-191):
``0.45·ln(1+PR) + 0.45·avg(tfidf of matched terms) + 0.07·titleHitFrac +
0.03·urlHitFrac``, × ``(1+0.2·geo)`` when the geo boost fires
(ResultPageHandler.java:156-176), × length penalty ``1/(1+(len−120)/60)``
for urls longer than 120 chars.

Q8 geo boost: the reference resolves (lat, lon) → city via Nominatim
reverse-geocoding with a hardcoded bounding-box fallback
(ResultPageHandler.java:251-385). The external HTTP call is out of scope
(and the reference itself treats any failure as null ⇒ fall through to
the bbox chain), so here the deterministic bbox chain IS the resolver;
the boost itself — lowercase city substring in title/url/snippet → 1.0 —
is exact (computeGeoBoost, ResultPageHandler.java:366-385).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..javaport.tokenize import is_stop_word

__all__ = [
    "tokenize_query",
    "search",
    "spellcheck",
    "autocomplete",
    "infer_city_keyword",
    "geo_boost_col",
    "bm25_scores",
]

PAGE_SIZE = 10  # ResultPageHandler.java:28

# Bounding boxes from inferCityKeywordFromLocation
# (ResultPageHandler.java:331-363) — order preserved: overlapping boxes
# (SF before Oakland) resolve by first match, exactly as the if-chain does.
_CITY_BBOXES: list[tuple[str, float, float, float, float]] = [
    ("New York", 40.3, 41.1, -74.5, -73.3),
    ("Los Angeles", 33.7, 34.4, -119.0, -117.5),
    ("San Francisco", 37.70, 37.83, -122.53, -122.35),
    ("Oakland", 37.70, 37.90, -122.30, -122.10),
    ("San Jose", 37.20, 37.45, -122.05, -121.75),
    ("Philadelphia", 39.8, 40.2, -75.3, -74.8),
]


def infer_city_keyword(lat, lon):
    """Q8 resolver: (lat, lon) columns → city name or NULL — the
    reference's bbox fallback chain (ResultPageHandler.java:331-363;
    strict < / > bounds, first box wins). The Nominatim primary path is
    an external service and null on any failure, so the fallback is the
    deterministic semantics."""
    expr = F.lit(None).cast("string")
    for city, lat_lo, lat_hi, lon_lo, lon_hi in reversed(_CITY_BBOXES):
        expr = F.when(
            (lat > lat_lo) & (lat < lat_hi) & (lon > lon_lo) & (lon < lon_hi),
            F.lit(city),
        ).otherwise(expr)
    return expr


def geo_boost_col(city, title, url, snippet):
    """Q8 boost: 1.0 iff lower(city) is a substring of the lowercased
    title, url, or snippet; else 0.0; 0.0 when city is NULL
    (computeGeoBoost, ResultPageHandler.java:366-385 — keyword lowered at
    the call site, line 71)."""
    kw = F.lower(city)
    hit = (
        F.lower(F.coalesce(title, F.lit(""))).contains(kw)
        | F.lower(F.coalesce(url, F.lit(""))).contains(kw)
        | F.lower(F.coalesce(snippet, F.lit(""))).contains(kw)
    )
    return F.when(city.isNull() | (F.length(kw) == 0), F.lit(0.0)).otherwise(
        F.when(hit, F.lit(1.0)).otherwise(F.lit(0.0))
    )


def tokenize_query(query: str) -> list[str]:
    """Q1: lowercase, split \\s+, drop stopwords (ResultPageHandler:450-461)."""
    return [w for w in query.lower().split() if w and not is_stop_word(w)]


def search(
    query: str,
    index: DataFrame,
    tfidf: DataFrame,
    pageranks: DataFrame,
    page: int = 0,
    page_size: int = PAGE_SIZE,
    lat: float | None = None,
    lon: float | None = None,
) -> DataFrame:
    """→ top results (url, title, snippet, score) for the query.
    When (lat, lon) is given, the Q8 geo boost multiplies matching rows'
    scores by 1.2 (ResultPageHandler.java:175-176)."""
    words = tokenize_query(query)
    if not words:
        return pageranks.select("url", "title", "snippet").limit(0).withColumn(
            "score", F.lit(0.0)
        )
    n_words = len(words)

    postings = index.where(F.col("word").isin(words)).select(
        "word", F.explode("urls").alias("url")
    )
    # Q4: conjunctive AND — candidate iff it matches every query word.
    candidates = (
        postings.groupBy("url")
        .agg(F.countDistinct("word").alias("_matches"))
        .where(F.col("_matches") == n_words)
        .select("url")
    )
    # matched-term tfidf average (KVSStorage.getTfIdf:150-160)
    tf_avg = (
        tfidf.where(F.col("word").isin(words))
        .join(candidates, "url", "left_semi")
        .groupBy("url")
        .agg(F.avg("tfidf").alias("_tfidf_avg"))
    )
    scored = (
        candidates.join(pageranks, "url")
        .join(tf_avg, "url", "left")
        .withColumn("_lower_title", F.lower(F.coalesce(F.col("title"), F.lit(""))))
        .withColumn("_lower_url", F.lower(F.col("url")))
    )
    title_hits = sum(
        F.when(F.col("_lower_title").contains(w), 1).otherwise(0) for w in words
    )
    url_hits = sum(
        F.when(F.col("_lower_url").contains(w), 1).otherwise(0) for w in words
    )
    base = (
        F.lit(0.45) * F.log(F.lit(1.0) + F.col("pagerank"))
        + F.lit(0.45) * F.coalesce(F.col("_tfidf_avg"), F.lit(0.0))
        + F.lit(0.07) * (title_hits / F.lit(n_words))
        + F.lit(0.03) * (url_hits / F.lit(n_words))
    )
    if lat is not None and lon is not None:
        # city is a literal per query — resolved once, constant-folded by
        # Catalyst into the boost predicate (no per-row bbox work).
        city = infer_city_keyword(F.lit(float(lat)), F.lit(float(lon)))
        geo = geo_boost_col(
            city, F.col("title"), F.col("url"), F.col("snippet")
        )
        base = base * (F.lit(1.0) + F.lit(0.2) * geo)
    penalty = F.when(
        F.length("url") > 120,
        F.lit(1.0) / (F.lit(1.0) + (F.length("url") - 120) / F.lit(60.0)),
    ).otherwise(F.lit(1.0))
    scored = scored.withColumn("score", base * penalty)

    # Q6: keep the best row per normalized title, sort, paginate.
    w_dedupe = Window.partitionBy(F.trim(F.col("_lower_title"))).orderBy(
        F.col("score").desc(), F.col("url").asc()
    )
    result = (
        scored.withColumn("_rn", F.row_number().over(w_dedupe))
        .where(F.col("_rn") == 1)
        .select("url", "title", "snippet", "score")
        .orderBy(F.col("score").desc(), F.col("url").asc())
        .offset(page * page_size)
        .limit(page_size)
    )
    return result


def spellcheck(query_word: str, index: DataFrame, max_distance: int = 2) -> str | None:
    """Q2: nearest dictionary word with Levenshtein ≤2
    (SpellChecker.suggestQuery:42-95). Dictionary = index row keys."""
    hit = (
        index.select("word")
        .withColumn("_d", F.levenshtein(F.col("word"), F.lit(query_word)))
        .where(F.col("_d") <= max_distance)
        .orderBy(F.col("_d").asc(), F.col("word").asc())
        .limit(1)
        .collect()
    )
    return hit[0]["word"] if hit else None


def autocomplete(prefix: str, index: DataFrame, limit: int = 8) -> list[str]:
    """Q3: prefix scan of the sorted dictionary, limit 8
    (SpellChecker.suggestPrefix:98-118)."""
    rows = (
        index.select("word")
        .where(F.col("word").startswith(prefix.lower()))
        .orderBy("word")
        .limit(limit)
        .collect()
    )
    return [r["word"] for r in rows]


# --- BM25 ranking (beyond-reference alternative scorer) ----------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    tok: DataFrame,
    query_terms: list[str],
    n_docs: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    doc_lens: DataFrame | None = None,
) -> DataFrame:
    """→ (doc_id, bm25): Okapi BM25 over a (doc_id, w, cnt) postings
    frame — the standard ranking function a user of a search engine
    expects alongside the reference's blended score (plans/search.py Q5);
    idf is Lucene's non-negative variant ``ln(1 + (N − df + ½)/(df + ½))``.

    Scale shape: doc lengths are one partial-aggregated groupBy over the
    postings (reused by every query); ``avgdl`` is a scalar; the
    query-term IN-filter prunes the postings scan BEFORE the df agg and
    the tiny per-term df frame broadcasts — per query the corpus-sized
    work is one pruned scan + one broadcast join, all whole-stage
    codegen, no UDFs."""
    # ``doc_lens`` (doc_id, dl) may be supplied by the caller when the
    # length sum is computable WITHOUT the (doc, word) aggregation —
    # e.g. q_bm25 derives dl = size(filter(tokens)) map-side from the
    # document text, one scan and zero shuffles, instead of exploding
    # and hash-aggregating the whole postings stream (r6; dl values are
    # identical integers, so avgdl and every score double match).
    dl = (
        doc_lens
        if doc_lens is not None
        else tok.groupBy("doc_id").agg(F.sum("cnt").alias("dl"))
    )
    avgdl = float(dl.agg(F.avg("dl")).first()[0])
    qt = tok.where(F.col("w").isin(list(query_terms)))
    dfreq = qt.groupBy("w").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("cnt") * F.lit(k1 + 1.0)) / (
        F.col("cnt") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    return (
        qt.join(F.broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("bm25"))
    )


# --- positional postings + phrase search (beyond-reference) ---------------
# The reference's index stores url lists only (Indexer.java:252-263), so
# its frontend can answer AND queries but not "as a phrase". Positions
# make the index order-aware: one extra array column per posting, and a
# phrase probe becomes pure array algebra — no re-reading documents.


def positional_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (word, doc_id, positions array<int>, tf): the positional
    posting table over whitespace-normalized lowercase tokens. One
    explode + one (doc, word) aggregation; positions are sorted so
    downstream array algebra is deterministic. At index scale this is
    the same plan as the df-capped index build (I4) with one extra
    int-array payload column."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    return (
        docs.select(F.col(id_col), F.posexplode(toks).alias("pos", "word"))
        .where(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(
            F.sort_array(F.collect_list(F.col("pos") + 1)).alias("positions"),
            F.count(F.lit(1)).alias("tf"),
        )
        .select("word", id_col, "positions", "tf")
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_matches, first_pos): documents containing the exact
    token sequence ``phrase``, with occurrence count and the 1-based
    position of the first occurrence.

    Plan: postings are filtered to the phrase's words BEFORE the
    positional aggregation (predicate on the exploded word — only the
    k phrase words survive the shuffle), then a k-way equi-join on the
    doc id brings the k position arrays together and one fold of
    ``array_intersect(transform(acc, x → x+1), p_i)`` computes the
    end-positions of full phrase matches — set algebra entirely in JVM
    higher-order functions, no re-scan of text, no Python. Probe cost
    scales with the phrase words' posting sizes, not the corpus."""
    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("empty phrase")
    post = positional_postings(
        docs.select(
            F.col(id_col),
            F.col(text_col),
        ),
        text_col,
        id_col,
    ).where(F.col("word").isin(words))
    sides = []
    for i, w in enumerate(words):
        sides.append(
            post.where(F.col("word") == w).select(
                F.col(id_col), F.col("positions").alias(f"_p{i}")
            )
        )
    joined = sides[0]
    for i in range(1, len(words)):
        joined = joined.join(sides[i], id_col)
    acc = F.col("_p0")
    for i in range(1, len(words)):
        acc = F.array_intersect(
            F.transform(acc, lambda x: x + 1), F.col(f"_p{i}")
        )
    k = len(words)
    return (
        joined.select(
            id_col,
            F.size(acc).alias("n_matches"),
            (F.array_min(acc) - (k - 1)).alias("first_pos"),
        )
        .where(F.col("n_matches") > 0)
    )


def near_search(
    docs: DataFrame,
    phrase: str,
    slop: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_matches, first_end): ORDERED PROXIMITY search — the
    phrase's words must appear in order with each consecutive pair at
    most ``slop + 1`` positions apart (``slop=0`` degenerates to the
    exact :func:`phrase_search` adjacency). ``n_matches`` counts the
    distinct feasible positions of the LAST word; ``first_end`` is the
    earliest of them.

    Same plan skeleton as phrase_search — postings filtered to the
    query words below the aggregation exchange, k-way doc join — with
    the adjacency fold generalized to a window feasibility fold:
    ``acc_i = filter(p_i, q → exists(acc_{i-1}, p → p < q ≤ p+gap))``,
    nested JVM higher-order functions (exists inside filter), still
    zero Python and posting-bounded."""
    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("empty phrase")
    gap = slop + 1
    post = positional_postings(docs, text_col, id_col).where(
        F.col("word").isin(words)
    )
    sides = []
    for i, w in enumerate(words):
        sides.append(
            post.where(F.col("word") == w).select(
                F.col(id_col), F.col("positions").alias(f"_p{i}")
            )
        )
    joined = sides[0]
    for i in range(1, len(words)):
        joined = joined.join(sides[i], id_col)
    acc = F.col("_p0")
    for i in range(1, len(words)):
        prev = acc  # captured by the closure, which F.filter invokes
        # eagerly THIS iteration (a second lambda param — even a default
        # — would be read as filter's (element, index) binary form)
        acc = F.filter(
            F.col(f"_p{i}"),
            lambda q: F.exists(prev, lambda p: (q > p) & (q <= p + F.lit(gap))),
        )
    return joined.select(
        id_col,
        F.size(acc).alias("n_matches"),
        F.array_min(acc).alias("first_end"),
    ).where(F.col("n_matches") > 0)
