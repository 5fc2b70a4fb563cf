"""Byte-exactness of the URL-layer ports vs reference golden fixtures."""
from __future__ import annotations

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport import (
    hasher,
    links,
    urlnorm,
    urlparser,
)
from golden_util import NULL, SEP, as_null, load_cases


def check_all(name, fn):
    cases = load_cases(name)
    failures = []
    for fields, expected in cases:
        got = fn(*fields)
        if got != expected:
            failures.append((fields, expected, got))
    assert not failures, (
        f"{len(failures)}/{len(cases)} mismatches; first 5: "
        + "\n".join(repr(f) for f in failures[:5])
    )


def test_hash():
    check_all("hash", lambda u: hasher.ref_hash(u))


def test_hash_from_hex_agrees():
    import hashlib

    for s in ["", "a", "http://example.com/", "café"]:
        hx = hashlib.sha1(s.encode()).hexdigest()
        assert hasher.ref_hash_from_hex(hx) == hasher.ref_hash(s)


def test_parseurl():
    def fn(u):
        parts = urlparser.parse_url(u)
        return SEP.join(NULL if p is None else p for p in parts)

    check_all("parseurl", fn)


def test_normalize_and_filter_url():
    check_all("norm", lambda b, u: as_null(urlnorm.normalize_and_filter_url(b, u)))


def test_normalize_seed_url():
    check_all("seednorm", lambda u: as_null(urlnorm.normalize_seed_url(u)))


def test_extract_host_key():
    check_all("hostkey", lambda u: urlnorm.extract_host_key(u))


def test_extract_protocol():
    check_all("protocol", lambda u: urlnorm.extract_protocol(u))


def test_extract_path():
    check_all("path", lambda u: urlnorm.extract_path(u))


def test_hostname():
    check_all("hostname", lambda u: urlnorm.hostname(u))


def test_is_skippable_href():
    check_all("skippable", lambda h: str(urlnorm.is_skippable_href(h)).lower())


def test_unwrap_urldefense():
    check_all("urldefense", lambda u: as_null(urlnorm.unwrap_urldefense(u)))


def test_should_crawl():
    check_all("shouldcrawl", lambda u: str(urlnorm.should_crawl(u)).lower())


def test_extract_urls():
    check_all("extracturls", lambda h: SEP.join(links.extract_urls(h)))


def test_pagerank_normalize_url():
    check_all("prnormurl", lambda b, h: as_null(links.pagerank_normalize_url(h, b)))


def test_pagerank_extract_links():
    def fn(base, html):
        return SEP.join(sorted(links.extract_links(base, html)))

    check_all("prlinks", fn)
