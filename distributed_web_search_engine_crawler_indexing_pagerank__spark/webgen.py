"""Deterministic synthetic pseudo-web generator (FIXTURES.md §1/§5).

No network, no wall clock, no ``random.Random`` sequence state: every
choice derives from a stable blake2b hash of ``(seed, host_idx, page_idx)``
so the local-pandas path and the distributed ``mapInPandas`` path produce
byte-identical tables — required for trace-equality tests (oracle runs the
local path, Spark jobs read the distributed one).

The generated HTML exercises every branch of the reference crawler's link
pipeline (``src/jobs/Crawler.java:352-392,940-982,1079-1109``): absolute /
relative / protocol-relative hrefs, fragments, ``mailto:``/``javascript:``
noise, urldefense wrappers, blacklisted extensions, duplicate links; the
``text`` column is produced by the byte-exact indexer-extractor port (the
per-row invariant of BASELINE.json input_hint).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
from collections.abc import Iterator

import pandas as pd

from .javaport.textextract import extract_body_text_for_index

__all__ = [
    "HostMeta",
    "host_meta",
    "n_pages_for_host",
    "page_url",
    "page_html",
    "gen_web_local",
    "gen_web_spark",
    "seed_urls",
]

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

_WORDS = (
    "spark crawl frontier index rank page web host link fetch robots delay "
    "queue shard bloom filter hash merge scan text token word score query "
    "search engine data table row column batch wave seed depth graph node"
).split()


def _h(*parts: object) -> int:
    raw = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.blake2b(raw, digest_size=8).digest(), "big")


class HostMeta:
    __slots__ = ("idx", "name", "scheme", "port", "n_pages", "robots_status", "robots_txt")

    def __init__(self, idx, name, scheme, port, n_pages, robots_status, robots_txt):
        self.idx = idx
        self.name = name
        self.scheme = scheme
        self.port = port
        self.n_pages = n_pages
        self.robots_status = robots_status
        self.robots_txt = robots_txt

    @property
    def host_key(self) -> str:
        return self.name if self.port is None else f"{self.name}:{self.port}"

    @property
    def origin(self) -> str:
        return f"{self.scheme}://{self.host_key}"


def n_pages_for_host(seed: int, host_idx: int, n_hosts: int, pages_base: int) -> int:
    """Zipf-skewed page counts: host 0 is the hot host (~8× base)."""
    if host_idx == 0:
        return max(1, pages_base * 8)
    jitter = _h(seed, "np", host_idx) % max(1, pages_base)
    return max(1, pages_base // 2 + jitter)


def host_meta(seed: int, host_idx: int, n_hosts: int, pages_base: int) -> HostMeta:
    name = f"h{host_idx:05d}.test"
    scheme = "https" if _h(seed, "sch", host_idx) % 5 == 0 else "http"
    port = 8080 if (host_idx % 13 == 5) else None
    n_pages = n_pages_for_host(seed, host_idx, n_hosts, pages_base)
    if host_idx % 11 == 3:
        robots_status, robots_txt = 404, None
    elif host_idx % 7 == 2:
        delay = 2.0 if host_idx % 14 == 2 else 3.0
        robots_txt = (
            "# synthetic robots\n"
            "User-agent: cis5550-crawler\n"
            f"Crawl-delay: {delay}\n"
            "Disallow: /private/\n"
            "Allow: /private/open\n"
            "\n"
            "User-agent: *\n"
            "Disallow: /\n"
        )
        robots_status = 200
    elif host_idx % 7 == 5:
        robots_txt = "User-agent: *\nDisallow: /private/\n"
        robots_status = 200
    else:
        robots_status, robots_txt = 200, ""
    return HostMeta(host_idx, name, scheme, port, n_pages, robots_status, robots_txt)


def _page_path(seed: int, host_idx: int, page_idx: int) -> str:
    # A slice of each host's pages lives under /private/ to exercise robots.
    if page_idx % 9 == 7:
        return f"/private/p{page_idx}.html"
    if page_idx % 9 == 8:
        return f"/private/open/p{page_idx}.html"
    return f"/p/{page_idx}.html"


def page_url(seed: int, host_idx: int, page_idx: int, n_hosts: int, pages_base: int) -> str:
    hm = host_meta(seed, host_idx, n_hosts, pages_base)
    return hm.origin + _page_path(seed, host_idx, page_idx)


def _target(seed: int, key: int, host_idx: int, n_hosts: int, pages_base: int) -> tuple[int, int]:
    """Pick a deterministic link target. 60% same-host, 40% cross-host."""
    hm_pages = n_pages_for_host
    if _h(seed, "loc", key) % 10 < 6:
        t_host = host_idx
    else:
        t_host = _h(seed, "th", key) % n_hosts
    t_page = _h(seed, "tp", key) % hm_pages(seed, t_host, n_hosts, pages_base)
    return t_host, t_page


def page_html(
    seed: int, host_idx: int, page_idx: int, n_hosts: int, pages_base: int, heft: int = 1
) -> str:
    """Deterministic HTML with title/meta/script/style and a seeded link mix.

    ``heft`` scales body size and link count (heft=1 ≈ 1-2 KB pages for
    unit fixtures; heft≈30-50 ≈ 20-40 KB pages for realistic bench load).
    It does not change which branches/filters are exercised."""
    h = _h(seed, "pg", host_idx, page_idx)
    me = host_meta(seed, host_idx, n_hosts, pages_base)
    n_links = 3 + h % 5 + (4 * min(heft, 10) if heft > 1 else 0)
    anchors: list[str] = []
    for li in range(n_links):
        key = _h(seed, "lk", host_idx, page_idx, li)
        t_host, t_page = _target(seed, key, host_idx, n_hosts, pages_base)
        t_meta = host_meta(seed, t_host, n_hosts, pages_base)
        t_path = _page_path(seed, t_host, t_page)
        style = key % 8
        if style == 0 and t_host == host_idx:
            href = t_path  # rooted relative
        elif style == 1 and t_host == host_idx:
            href = t_path.lstrip("/")  # dir-relative
        elif style == 2:
            href = "//" + t_meta.host_key + t_path  # protocol-relative
        elif style == 3:
            href = t_meta.origin + t_path + "#frag"  # fragment-bearing
        else:
            href = t_meta.origin + t_path  # absolute
        quote = '"' if key % 3 else ""
        anchors.append(f'<a href={quote}{href}{quote}>link {li}</a>')
    # Noise links — each exercises a filter branch.
    if h % 4 == 0:
        anchors.append('<a href="mailto:x@test">mail</a>')
    if h % 4 == 1:
        anchors.append('<a href="javascript:void(0)">js</a>')
    if h % 5 == 0:
        anchors.append(f'<a href="{me.origin}/img/pic{page_idx}.jpg">img</a>')
    if h % 7 == 0:
        inner = page_url(seed, (host_idx + 1) % n_hosts, 0, n_hosts, pages_base)
        anchors.append(
            f'<a href="https://urldefense.com/v3/__{inner}__;!!x!y$">wrapped</a>'
        )
    if h % 6 == 0 and anchors:
        anchors.append(anchors[0])  # duplicate link
    # heft tiles the seeded base words rather than hashing per word —
    # generation stays cheap while extraction cost scales with heft.
    words = [
        _WORDS[_h(seed, "w", host_idx, page_idx, i) % len(_WORDS)]
        for i in range(40 + h % 80)
    ] * heft
    body_text = " ".join(words)
    return (
        "<html><head>"
        f"<title>Page {host_idx}-{page_idx} {_WORDS[h % len(_WORDS)]}</title>"
        f'<meta name="description" content="synthetic page {host_idx}/{page_idx}">'
        "<script>var x = 1; // skip me</script>"
        "<style>.a { color: red; }</style>"
        "</head><body>"
        f"<h1>Host {host_idx} page {page_idx}</h1>"
        f"<p>{body_text}</p>"
        + " ".join(anchors)
        + "</body></html>"
    )


def _response_for(
    seed: int, host_idx: int, page_idx: int, n_hosts: int, pages_base: int, html: str
) -> dict:
    """Synthetic HEAD/GET behavior per url (FIXTURES.md §5)."""
    url = page_url(seed, host_idx, page_idx, n_hosts, pages_base)
    k = _h(seed, "resp", host_idx, page_idx) % 100
    # Seeds (page 0) always succeed so the crawl gets off the ground.
    if page_idx == 0 or k < 78:
        status, location, ctype, clang = 200, None, "text/html; charset=utf-8", "en-US"
    elif k < 84:
        t_host, t_page = _target(seed, _h(seed, "rloc", host_idx, page_idx), host_idx, n_hosts, pages_base)
        location = page_url(seed, t_host, t_page, n_hosts, pages_base)
        status, ctype, clang = (301 if k % 2 else 302), "text/html", "en"
    elif k < 90:
        status, location, ctype, clang = 404, None, "text/html", None
    elif k < 95:
        status, location, ctype, clang = 200, None, "application/pdf", "en"
    else:
        status, location, ctype, clang = 200, None, "text/html", "de"
    return {
        "url": url,
        "head_status": status,
        "location": location,
        "content_type": ctype,
        "content_language": clang,
        "body": html.encode("utf-8") if status == 200 else b"",
    }


def _rows_for_hosts(
    seed: int, host_indices: list[int], n_hosts: int, pages_base: int, heft: int = 1
) -> tuple[list[dict], list[dict], list[dict]]:
    pages, responses, robots = [], [], []
    for hi in host_indices:
        hm = host_meta(seed, hi, n_hosts, pages_base)
        robots.append(
            {"host": hm.host_key, "robots_status": hm.robots_status, "robots_txt": hm.robots_txt}
        )
        for pi in range(hm.n_pages):
            html = page_html(seed, hi, pi, n_hosts, pages_base, heft)
            url = page_url(seed, hi, pi, n_hosts, pages_base)
            resp = _response_for(seed, hi, pi, n_hosts, pages_base, html)
            lang = (resp["content_language"] or "en").split("-")[0]
            pages.append(
                {
                    "url": url,
                    "warc_ts": _EPOCH + _dt.timedelta(seconds=_h(seed, "ts", hi, pi) % 86_400),
                    "html": html.encode("utf-8"),
                    "text": extract_body_text_for_index(html),
                    "lang": lang,
                }
            )
            responses.append(resp)
    return pages, responses, robots


def gen_web_local(
    seed: int, n_hosts: int, pages_base: int, heft: int = 1
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """(pages, fetch_responses, robots) as pandas frames — test scale."""
    pages, responses, robots = _rows_for_hosts(
        seed, list(range(n_hosts)), n_hosts, pages_base, heft
    )
    return pd.DataFrame(pages), pd.DataFrame(responses), pd.DataFrame(robots)


def gen_web_spark(
    spark, seed: int, n_hosts: int, pages_base: int, partitions: int = 32, heft: int = 1
):
    """Distributed generation over ``spark.range(n_hosts)`` — bench scale.

    Returns (pages_df, responses_df, robots_df) with schemas matching
    ``schemas.PAGES`` / ``schemas.FETCH_RESPONSES`` / ``schemas.ROBOTS``.
    Content is byte-identical to ``gen_web_local`` for the same arguments.
    """
    from . import schemas

    hosts = spark.range(0, n_hosts, 1, partitions)

    def _gen(kind: str):
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                idx = [int(i) for i in b["id"]]
                pages, responses, robots = _rows_for_hosts(seed, idx, n_hosts, pages_base, heft)
                out = {"pages": pages, "responses": responses, "robots": robots}[kind]
                if out:
                    yield pd.DataFrame(out)

        return fn

    pages_df = hosts.mapInPandas(_gen("pages"), schema=schemas.PAGES)
    resp_df = hosts.mapInPandas(_gen("responses"), schema=schemas.FETCH_RESPONSES)
    robots_df = hosts.mapInPandas(_gen("robots"), schema=schemas.ROBOTS)
    return pages_df, resp_df, robots_df


def seed_urls(seed: int, n_hosts: int, pages_base: int, n_seeds: int) -> list[str]:
    """First page of the first ``n_seeds`` hosts — the crawl seed list."""
    return [page_url(seed, hi, 0, n_hosts, pages_base) for hi in range(min(n_seeds, n_hosts))]
