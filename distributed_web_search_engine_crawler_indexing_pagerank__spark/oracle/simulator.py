"""Pure-Python golden oracle for the crawl scheduler.

DETERMINISTIC WAVE-QUANTIZED CRAWL MODEL — the shared spec
===========================================================

The reference crawler (``src/jobs/Crawler.java:85-438``) is a wall-clock
BFS: a frontier queue keyed ``hash(url)``, per-host politeness
(``now − lastAccess < crawlDelay`` ⇒ throttled URL *stays queued*,
:193-196,408-420), robots gating (:707-896), visited-at-enqueue dedup
(:376-388), host cap (:33,1043-1047), and terminal bookkeeping
(queue-delete + visited-insert for every outcome except throttled,
:408-431). Wall-clock order is not reproducible, so — per SURVEY.md §7
"what's hard" — both the oracle and the Spark plan implement this exact
deterministic quantization of it; *trace equality between the two* is the
correctness gate (BASELINE.json north_rule: "matching the reference's
crawl ordering and URL-seen set under the same seed list + politeness
budget").

Model (wave t = 0,1,2,…; virtual time T(t) = t·wave_seconds):

1. Seeds: ``normalizeSeedUrl`` each (Crawler.java:628-651), drop nulls,
   first-writer-wins dedup by ref-hash; priority tuple
   ``(depth=0, disc_wave=-1, parent_hash="", link_idx=seed_position)``.
2. Per wave, per host: fetch robots once on first contact
   (:707-762; status ≠200/empty ⇒ allow-all, delay = robots Crawl-delay
   for UA ``cis5550-crawler`` else ``*`` else 1.0 default, :37,898-938).
3. Host eligible in wave t iff ``fetched_count < max_pages_per_host`` and
   ``T(t) − last_access ≥ crawl_delay`` (never-accessed ⇒ eligible).
   Ineligible hosts' URLs stay queued untouched (= reference "throttled").
4. Hosts at the cap retire all their queued URLs to the seen set without
   fetching (enqueue-side cap probe, :376-388, applied to residue).
5. From each eligible host pick exactly ONE url: the minimum priority
   tuple ``(depth, disc_wave, parent_hash, link_idx)`` — BFS depth first,
   then first-enqueue order (SURVEY.md §2.3 priority note).
6. Process each selected url (all network behavior comes from the
   synthetic ``fetch_responses`` table; no live HTTP):
   a. robots disallow for its path ⇒ terminal (seen, no fetch) AND the
      host's ``last_access`` ← T(t) — the reference calls
      ``updateLastAccess`` inside the ``!robotsAllowed`` branch
      (Crawler.java:202), so a disallowed pick still throttles the host.
   b. missing response (= HEAD connect failure) ⇒ terminal with NO
      ``last_access`` update — the reference's HEAD-exception path
      returns before ``updateLastAccess`` (:206-225).
   c. otherwise ``last_access`` ← T(t), then checks in the reference's
      exact order (:243-272): ``Content-Language`` present (non-null,
      INCLUDING empty string) and not ``en*`` ⇒ terminal — checked
      BEFORE redirect/status, so a non-English 3xx never enqueues its
      Location. HEAD 3xx ⇒ terminal; the ``Location`` is normalized
      against the url (:249-259), ``shouldCrawl``-filtered, and enqueued
      with ``depth+1`` and ``link_idx=-1``. Other non-200 ⇒ terminal.
      Content-type without ``text/html`` ⇒ terminal.
   c. 200+html+en ⇒ GET body capped at ``byte_cap`` (:34,312-329), page
      saved to the crawl table, host ``fetched_count`` +=1; outlinks =
      the C10–C13 pipeline in extraction order with page-local
      first-occurrence dedup (:350-392).
7. End-of-wave enqueue, in parent order = selection priority, links in
   page order: a link enters the frontier iff its hash is not in ``seen``,
   not already queued, and its host's ``fetched_count`` (end of wave) is
   under the cap. Priority tuple ``(parent_depth+1, t, parent_hash,
   link_idx)``. Same-wave duplicate discoveries keep the minimum tuple.
8. All selected urls are terminal: removed from the frontier, inserted
   into ``seen``. Stop when crawl table ≥ target_pages, frontier empty,
   or wave = max_waves.

The trace is the fetch schedule: one record per selected url per wave.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..javaport.hasher import ref_hash
from ..javaport.robots import crawl_delay_seconds, robots_allows
from ..javaport.urlnorm import (
    extract_host_key,
    extract_path,
    normalize_and_filter_url,
    normalize_seed_url,
    should_crawl,
)
from ..functions.udfs import _page_outlinks

__all__ = ["CrawlConfig", "OracleCrawler", "FrontierEntry"]


@dataclass
class CrawlConfig:
    """Politeness budget + stop conditions (reference constants cited)."""

    target_pages: int = 50_000  # TARGET_HTML_PAGES, Crawler.java:32
    max_pages_per_host: int = 500  # MAX_PAGES_PER_HOST, Crawler.java:33
    byte_cap: int = 100 * 1024  # MAX_BYTES_PER_PAGE, Crawler.java:34
    default_delay: float = 1.0  # DEFAULT_DELAY, Crawler.java:37
    wave_seconds: float = 1.0
    max_waves: int = 10_000
    # False = reference-exact robots evaluation (allow-all in practice due
    # to the reference's dead-check quirk, golden-verified — see
    # javaport/robots.py). True = intended longest-prefix semantics.
    strict_robots: bool = False


@dataclass(order=True)
class Priority:
    depth: int
    disc_wave: int
    parent_hash: str
    link_idx: int


@dataclass
class FrontierEntry:
    url: str
    url_hash: str
    host: str
    prio: Priority


@dataclass
class HostState:
    crawl_delay: float
    robots_status: int
    robots_txt: str | None
    last_access: float | None = None
    fetched_count: int = 0


class OracleCrawler:
    """Runs the wave model over an in-memory synthetic web.

    ``responses``: url → dict(head_status, location, content_type,
    content_language, body). ``robots``: host_key → (status, txt).
    """

    def __init__(
        self,
        responses: dict[str, dict],
        robots: dict[str, tuple[int, str | None]],
        config: CrawlConfig | None = None,
    ):
        self.responses = responses
        self.robots = robots
        self.cfg = config or CrawlConfig()
        self.frontier: dict[str, FrontierEntry] = {}  # url_hash → entry
        self.seen: dict[str, str] = {}  # url_hash → url
        self.hosts: dict[str, HostState] = {}
        self.crawl: list[dict] = []  # saved pages
        self.trace: list[dict] = []  # fetch schedule
        self.wave = 0

    # -- setup ------------------------------------------------------------
    def add_seeds(self, seeds: list[str]) -> None:
        for i, raw in enumerate(seeds):
            url = normalize_seed_url(raw)
            if url is None:
                continue
            h = ref_hash(url)
            if h in self.frontier or h in self.seen:
                continue
            self.frontier[h] = FrontierEntry(
                url=url, url_hash=h, host=extract_host_key(url), prio=Priority(0, -1, "", i)
            )

    def _host_state(self, host: str) -> HostState:
        st = self.hosts.get(host)
        if st is None:
            status, txt = self.robots.get(host, (404, None))
            st = HostState(
                crawl_delay=crawl_delay_seconds(txt if status == 200 else None),
                robots_status=status,
                robots_txt=txt,
            )
            self.hosts[host] = st
        return st

    def _allows(self, st: HostState, url: str) -> bool:
        return robots_allows(
            st.robots_txt,
            st.robots_status,
            extract_path(url),
            strict=self.cfg.strict_robots,
        )

    # -- one wave ----------------------------------------------------------
    def step(self) -> bool:
        """Run one micro-iteration. Returns False when the crawl is done."""
        if not self.frontier or len(self.crawl) >= self.cfg.target_pages:
            return False
        t = self.wave * self.cfg.wave_seconds
        # group frontier by host
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in self.frontier.values():
            by_host.setdefault(e.host, []).append(e)

        selected: list[FrontierEntry] = []
        retired: list[FrontierEntry] = []
        for host, entries in by_host.items():
            st = self._host_state(host)
            if st.fetched_count >= self.cfg.max_pages_per_host:
                retired.extend(entries)  # spec step 4
                continue
            if st.last_access is not None and (t - st.last_access) < st.crawl_delay:
                continue  # throttled — stays queued (spec step 3)
            selected.append(min(entries, key=lambda e: e.prio))
        selected.sort(key=lambda e: e.prio)

        # process selections (spec step 6)
        enqueue_candidates: list[tuple[Priority, str]] = []  # (prio, url)
        for e in selected:
            st = self.hosts[e.host]
            outcome = self._process(e, st, t, enqueue_candidates)
            self.trace.append(
                {"wave": self.wave, "url": e.url, "url_hash": e.url_hash, "host": e.host,
                 "depth": e.prio.depth, "outcome": outcome}
            )
        # terminal bookkeeping (spec step 8)
        for e in selected:
            del self.frontier[e.url_hash]
            self.seen[e.url_hash] = e.url
        for e in retired:
            del self.frontier[e.url_hash]
            self.seen[e.url_hash] = e.url

        # end-of-wave enqueue (spec step 7)
        for prio, url in enqueue_candidates:
            h = ref_hash(url)
            if h in self.seen:
                continue
            host = extract_host_key(url)
            st = self._host_state(host)
            if st.fetched_count >= self.cfg.max_pages_per_host:
                continue
            existing = self.frontier.get(h)
            if existing is None or prio < existing.prio:
                self.frontier[h] = FrontierEntry(url=url, url_hash=h, host=host, prio=prio)

        self.wave += 1
        return True

    def _process(
        self,
        e: FrontierEntry,
        st: HostState,
        t: float,
        enqueue: list[tuple[Priority, str]],
    ) -> str:
        if not self._allows(st, e.url):
            st.last_access = t  # reference: updateLastAccess inside !robotsAllowed
            return "robots_disallowed"
        resp = self.responses.get(e.url)
        if resp is None:
            return "unfetchable"  # HEAD failure: no last_access update
        st.last_access = t
        # Content-Language first (Crawler.java:243-247 precedes the 3xx /
        # non-200 checks); `is not None` matches Java's null check — an
        # EMPTY string is non-English there too.
        clang = resp.get("content_language")
        if clang is not None and not clang.lower().startswith("en"):
            return "non_english"
        status = int(resp["head_status"])
        if status in (301, 302, 303, 307, 308):
            loc = resp.get("location")
            if loc:
                norm = normalize_and_filter_url(e.url, loc)
                if norm is not None and should_crawl(norm):
                    enqueue.append(
                        (Priority(e.prio.depth + 1, self.wave, e.url_hash, -1), norm)
                    )
            return "redirect"
        if status != 200:
            return f"status_{status}"
        ctype = resp.get("content_type") or ""
        if "text/html" not in ctype.lower():
            return "non_html"
        body = resp.get("body") or b""
        body = body[: self.cfg.byte_cap]
        self.crawl.append(
            {
                "url": e.url,
                "url_hash": e.url_hash,
                "host": e.host,
                "response_code": 200,
                "content_type": ctype,
                "page": body,
                "length": len(body),
                "depth": e.prio.depth,
                "wave": self.wave,
            }
        )
        st.fetched_count += 1
        html = body.decode("utf-8", errors="replace")
        for li, link in enumerate(_page_outlinks(e.url, html)):
            enqueue.append((Priority(e.prio.depth + 1, self.wave, e.url_hash, li), link))
        return "fetched"

    # -- driver -------------------------------------------------------------
    def run(self, max_waves: int | None = None) -> None:
        limit = max_waves if max_waves is not None else self.cfg.max_waves
        while self.wave < limit and self.step():
            pass
