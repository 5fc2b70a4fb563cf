"""Pandas-UDF wrappers of the byte-exact reference kernels.

Each UDF receives Arrow-batched ``pd.Series`` and applies a javaport
kernel per element *inside* the batch — the JVM↔Python boundary is crossed
once per batch, never per row (BASELINE.json input_hint). Reference
semantics cited per function; the kernels themselves are golden-tested
against the reference's compiled output (tests/golden/).

Everything HTML/URL-shaped stays in Python for byte-fidelity (SURVEY.md
§2.6: Java-regex quirks); purely relational logic stays JVM-side in
``pyspark.sql.functions``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..javaport.hasher import ref_hash
from ..javaport.links import extract_links as _pr_extract_links
from ..javaport.links import extract_urls as _extract_urls
from ..javaport.robots import crawl_delay_seconds as _crawl_delay
from ..javaport.robots import robots_allows as _robots_allows_full
from ..javaport.textextract import (
    extract_body_text_for_index as _extract_index,
    extract_body_text_tfidf as _extract_tfidf,
    extract_title as _extract_title,
    generate_snippet as _snippet,
)
from ..javaport.tokenize import index_words as _index_words
from ..javaport.tokenize import tokenize_counts as _tokenize_counts
from ..javaport.urlnorm import (
    extract_host_key as _host_key,
    extract_path as _extract_path,
    is_skippable_href as _is_skippable,
    normalize_and_filter_url as _norm_url,
    normalize_seed_url as _norm_seed,
    should_crawl as _should_crawl,
    unwrap_urldefense as _unwrap,
)

__all__ = [
    "ref_hash_udf",
    "host_key_udf",
    "url_identity_udf",
    "url_path_udf",
    "normalize_seed_udf",
    "normalize_redirect_udf",
    "outlinks_udf",
    "robots_allows_udf",
    "make_robots_allows_udf",
    "crawl_delay_udf",
    "extract_text_index_udf",
    "extract_text_tfidf_udf",
    "title_udf",
    "snippet_udf",
    "pagerank_links_udf",
    "index_words_udf",
    "token_pairs_udf",
    "with_url_identity",
]


def _bytes_to_str(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).decode("utf-8", errors="replace")
    return str(v)


# --- URL identity ---------------------------------------------------------

@pandas_udf(StringType())
def ref_hash_udf(url: pd.Series) -> pd.Series:
    """Reference SHA-1 row-key identity (src/tools/Hasher.java:27-38)."""
    return url.map(lambda u: ref_hash(u) if u is not None else None)


@pandas_udf(StringType())
def host_key_udf(url: pd.Series) -> pd.Series:
    """host[:port] politeness key (src/jobs/Crawler.java:653-661)."""
    return url.map(lambda u: _host_key(u) if u is not None else None)


@pandas_udf(StringType())
def url_path_udf(url: pd.Series) -> pd.Series:
    """Path component used by the robots evaluator (Crawler.java:668-674)."""
    return url.map(lambda u: _extract_path(u) if u is not None else None)


_URL_IDENTITY_TYPE = StructType(
    [
        StructField("url_hash", StringType(), True),
        StructField("host", StringType(), True),
    ]
)


@pandas_udf(_URL_IDENTITY_TYPE)
def url_identity_udf(url: pd.Series) -> pd.DataFrame:
    """SHA-1 identity + host key in ONE Arrow round-trip (the per-link
    hot path ships each URL to Python once, not once per column)."""
    return pd.DataFrame(
        {
            "url_hash": url.map(lambda u: ref_hash(u) if u is not None else None),
            "host": url.map(lambda u: _host_key(u) if u is not None else None),
        }
    )


@pandas_udf(StringType())
def normalize_seed_udf(url: pd.Series) -> pd.Series:
    """Seed canonicalization (Crawler.normalizeSeedUrl, Crawler.java:628-651)."""
    return url.map(_norm_seed)


def _page_outlinks(base_url: str | None, html: str | None) -> list[str]:
    """Full C10–C13 link pipeline for one page, in extraction order.

    extract hrefs (Crawler.extractUrls :444-493) → skip noise schemes
    (:1079-1090) → unwrap urldefense (:1092-1109) → normalize vs base
    (:495-625) → page-local first-occurrence dedup (:348,365-367) →
    blacklist predicate shouldCrawl (:940-982).
    """
    if base_url is None or html is None:
        return []
    seen: set[str] = set()
    out: list[str] = []
    for href in _extract_urls(html):
        if _is_skippable(href):
            continue
        href2 = _unwrap(href)
        norm = _norm_url(base_url, href2)
        if norm is None or norm in seen:
            continue
        seen.add(norm)
        if _should_crawl(norm):
            out.append(norm)
    return out


@pandas_udf(ArrayType(StringType()))
def outlinks_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    """Ordered unique crawlable outlinks per page (see _page_outlinks)."""
    return pd.Series(
        [_page_outlinks(u, _bytes_to_str(h)) for u, h in zip(url, html)]
    )


@pandas_udf(StringType())
def normalize_redirect_udf(base_url: pd.Series, location: pd.Series) -> pd.Series:
    """Redirect Location → frontier candidate or null: normalize vs the
    redirected URL + blacklist filter (Crawler.java:249-259)."""

    def fn(base, loc):
        if base is None or loc is None:
            return None
        norm = _norm_url(base, loc)
        if norm is None or not _should_crawl(norm):
            return None
        return norm

    return pd.Series([fn(b, l) for b, l in zip(base_url, location)])


# --- robots / politeness --------------------------------------------------

def make_robots_allows_udf(strict: bool = False):
    """robots gate UDF (Crawler.java:780-896).

    ``strict=False`` reproduces the reference byte-for-byte — its rule
    evaluator has a dead character check making it allow-all in practice
    (golden-verified; see javaport/robots.py docstring). ``strict=True``
    applies the evidently intended ordered longest-prefix-match semantics
    (our engine's production mode).
    """

    @pandas_udf(BooleanType())
    def robots_allows_udf(
        robots_txt: pd.Series, robots_status: pd.Series, path: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                _robots_allows_full(
                    t,
                    int(s) if s is not None and not pd.isna(s) else 404,
                    p or "/",
                    strict=strict,
                )
                for t, s, p in zip(robots_txt, robots_status, path)
            ]
        )

    return robots_allows_udf


robots_allows_udf = make_robots_allows_udf(strict=False)


@pandas_udf(DoubleType())
def crawl_delay_udf(robots_txt: pd.Series) -> pd.Series:
    """Crawl-delay for our UA group, default 1.0s (Crawler.java:898-938,37)."""
    return robots_txt.map(lambda t: float(_crawl_delay(t)))


# --- text extraction (per-row byte invariant) ------------------------------

@pandas_udf(StringType())
def extract_text_index_udf(html: pd.Series) -> pd.Series:
    """Indexer extractor — THE invariant column (Indexer.java:124-151)."""
    return html.map(lambda h: _extract_index(_bytes_to_str(h)))


@pandas_udf(StringType())
def extract_text_tfidf_udf(html: pd.Series) -> pd.Series:
    """TF-IDF extractor variant (TfIdf.java:323-351)."""
    return html.map(lambda h: _extract_tfidf(_bytes_to_str(h)))


@pandas_udf(StringType())
def title_udf(html: pd.Series) -> pd.Series:
    """<title> ≤120 chars (PageRank.java:504-524)."""
    return html.map(lambda h: _extract_title(_bytes_to_str(h)))


@pandas_udf(StringType())
def snippet_udf(html: pd.Series) -> pd.Series:
    """meta-description → semantic block → body fallback (PageRank.java:527-666)."""
    return html.map(lambda h: _snippet(_bytes_to_str(h)))


@pandas_udf(ArrayType(StringType()))
def pagerank_links_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    """PageRank's own link scanner+normalizer, sorted (PageRank.java:708-816)."""
    return pd.Series(
        [
            sorted(_pr_extract_links(u, _bytes_to_str(h)))
            for u, h in zip(url, html)
        ]
    )


# --- tokenization ----------------------------------------------------------

@pandas_udf(ArrayType(StringType()))
def index_words_udf(text: pd.Series) -> pd.Series:
    """Indexable words (count ≥2, stopword/len-filtered; Indexer.java:214-241)."""
    return text.map(lambda t: sorted(_index_words(t)) if t is not None else [])


@pandas_udf(ArrayType(StringType()))
def token_pairs_udf(text: pd.Series) -> pd.Series:
    """All token occurrences as 'word\\u0001count' pairs (TfIdf.java:293-312)."""
    def fn(t):
        if t is None:
            return []
        return [f"{w}{c}" for w, c in sorted(_tokenize_counts(t).items())]

    return text.map(fn)


# --- composite helpers ------------------------------------------------------

def with_url_identity(df, url_col: str = "url"):
    """Attach url_hash + host columns — the identity triple every crawl
    table keys on (Hasher.java SHA-1 + Crawler.extractHostKey)."""
    return df.withColumn("url_hash", ref_hash_udf(F.col(url_col))).withColumn(
        "host", host_key_udf(F.col(url_col))
    )
