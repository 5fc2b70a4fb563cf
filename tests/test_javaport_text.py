"""Byte-exactness of the text-extractor and robots ports vs golden fixtures."""
from __future__ import annotations

from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport import (
    robots,
    textextract,
)
from golden_util import NULL, SEP, SEP2, as_null, load_cases
from test_javaport_urls import check_all


def test_index_extract():
    check_all("indexextract", textextract.extract_body_text_for_index)


def test_pagerank_body():
    check_all("prbody", textextract.extract_body_text_pagerank)


def test_tfidf_body():
    check_all("tfidfbody", textextract.extract_body_text_tfidf)


def test_title():
    check_all("prtitle", textextract.extract_title)


def test_snippet():
    check_all("prsnippet", textextract.generate_snippet)


def test_robots_rules():
    def fn(robots_txt):
        ua, star = robots.parse_robots_rules_ordered(robots_txt)
        return SEP.join(ua) + SEP2 + SEP.join(star)

    check_all("robotsrules", fn)


def test_crawl_delay():
    check_all("crawldelay", lambda r: as_null(robots.extract_crawl_delay(r)))


def test_reference_quirk_robots_allows_is_allow_all():
    """The reference's robotsAllows skips every rule (dead charAt(1)==' '
    check vs "A:"-built rules) — verify our faithful port does too, and
    that strict mode actually enforces rules."""
    txt = "User-agent: *\nDisallow: /private\nAllow: /private/ok"
    assert robots.robots_allows(txt, 200, "/private/secret") is True  # faithful
    assert robots.robots_allows(txt, 200, "/private/secret", strict=True) is False
    assert robots.robots_allows(txt, 200, "/private/ok/x", strict=True) is True
    assert robots.robots_allows(txt, 200, "/public", strict=True) is True
    # status gates
    assert robots.robots_allows(txt, 404, "/private/x", strict=True) is True
    assert robots.robots_allows(txt, 500, "/private/x", strict=True) is True
    assert robots.robots_allows(None, 200, "/private/x", strict=True) is True


def test_crawl_delay_seconds():
    assert robots.crawl_delay_seconds("User-agent: *\nCrawl-delay: 2.5") == 2.5
    assert robots.crawl_delay_seconds("User-agent: *\nCrawl-delay: zzz") == 1.0
    assert robots.crawl_delay_seconds(None) == 1.0
    # UA group wins over *
    txt = "User-agent: cis5550-crawler\nCrawl-delay: 0.5\nUser-agent: *\nCrawl-delay: 9"
    assert robots.crawl_delay_seconds(txt) == 0.5
