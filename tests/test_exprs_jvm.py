"""JVM column expressions ≡ javaport kernels on canonical URLs.

functions.exprs moves the per-link identity kernel (reference SHA-1 hash,
host politeness key, robots path) from pandas UDFs into whole-stage
codegen. The plan only ever feeds these expressions CANONICAL urls (the
output set of the normalizer UDFs), so equivalence is asserted over the
full synthetic-web link corpus plus hand-picked port/scheme edge cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_web_search_engine_crawler_indexing_pagerank__spark import webgen
from distributed_web_search_engine_crawler_indexing_pagerank__spark.functions.exprs import (
    host_key_col,
    ref_hash_col,
    url_path_col,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.functions.udfs import (
    _page_outlinks,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport.hasher import (
    ref_hash,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport.urlnorm import (
    extract_host_key,
    extract_path,
    normalize_seed_url,
)

EDGE_URLS = [
    "http://a.test/",
    "https://a.test/x",
    "http://a.test:8080/x/y.html",
    "https://b.test:443x/",  # weird but canonical-shaped port text
    "http://h0.test:81/p/0.html",
    "https://sub.domain.test/deep/path/page.html?q=1",
    "http://a.test",  # no path
]


def _corpus_urls() -> list[str]:
    pages, responses, robots = webgen.gen_web_local(7, 12, 10)
    urls: set[str] = set()
    for _, r in responses.iterrows():
        urls.add(r["url"])
        body = r["body"] or b""
        if body:
            urls.update(_page_outlinks(r["url"], body.decode("utf-8", "replace")))
    for s in webgen.seed_urls(7, 12, 10, 12):
        n = normalize_seed_url(s)
        if n:
            urls.add(n)
    return sorted(urls) + EDGE_URLS


def test_byte_token_full_range(spark):
    """The arithmetic alphabet recode ≡ the hasher's signed-byte table
    for every byte value 0..255."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.functions.exprs import (
        _byte_token,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport.hasher import (
        _U2TOKEN,
    )

    df = spark.createDataFrame([(i,) for i in range(256)], "b int")
    got = {r["b"]: r["t"] for r in df.select("b", _byte_token(F.col("b")).alias("t")).collect()}
    for u in range(256):
        assert got[u] == _U2TOKEN[u], u


def test_jvm_identity_matches_javaport(spark):
    urls = _corpus_urls()
    assert len(urls) > 200
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        "url",
        ref_hash_col(F.col("url")).alias("h"),
        host_key_col(F.col("url")).alias("hk"),
        url_path_col(F.col("url")).alias("p"),
    ).collect()
    for r in got:
        assert r["h"] == ref_hash(r["url"]), r["url"]
        assert r["hk"] == extract_host_key(r["url"]), r["url"]
        assert r["p"] == extract_path(r["url"]), r["url"]
