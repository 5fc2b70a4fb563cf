"""Ports of the two <a href> scanners and the PageRank URL resolver.

- ``extract_urls`` — ``src/jobs/Crawler.java:444-493``: index-based scan
  of the lowercased body for ``<a``..``>`` tags with ``href=``; quoted or
  bare values; returns raw hrefs in document order (with duplicates).
- ``extract_links`` — ``src/jobs/PageRank.java:708-783``: similar scan
  plus skip-prefix filtering, java.net.URI-based resolution keeping the
  explicit port, self-link exclusion, and a 30-link cap.
- ``pagerank_normalize_url`` — ``PageRank.java:786-816``: URI.resolve
  emulation. java.net.URI rejects hosts with underscores etc. (getHost()
  == null) — mirrored via urlnorm._java_uri_host validation.
"""
from __future__ import annotations

import posixpath
import re
import urllib.parse

from .jstr import j_trim
from .urlnorm import _java_uri_host

MAX_OUT_LINKS = 30


def extract_urls(body: str | None) -> list[str]:
    """Crawler.extractUrls: raw hrefs in scan order (duplicates kept)."""
    out: list[str] = []
    if not body:
        return out
    lower = body.lower()
    i = 0
    while True:
        i = lower.find("<a", i)
        if i == -1:
            break
        tag_end = lower.find(">", i)
        if tag_end == -1:
            break
        href_pos = lower.find("href=", i)
        if href_pos == -1 or href_pos > tag_end:
            i = tag_end + 1
            continue
        val_start = href_pos + 5
        if val_start >= len(body):
            i = tag_end + 1
            continue
        first = body[val_start]
        if first in ('"', "'"):
            url_start = val_start + 1
            url_end = body.find(first, url_start)
            if url_end == -1 or url_end > tag_end:
                i = tag_end + 1
                continue
        else:
            url_start = val_start
            sp = body.find(" ", url_start)
            gt = body.find(">", url_start)
            url_end = gt if sp == -1 else (sp if gt == -1 else min(sp, gt))
            if url_end == -1 or url_end > tag_end:
                url_end = tag_end
        if url_start >= 0 and url_end > url_start:
            u = j_trim(body[url_start:url_end])
            if u:
                out.append(u)
        i = tag_end + 1
    return out


# ---------------------------------------------------------------------------
# java.net.URI.resolve emulation (RFC 2396 as implemented by the JDK)
# ---------------------------------------------------------------------------

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")


def _split_java_uri(s: str) -> dict:
    """Split into scheme/authority/path/query/fragment (RFC 3986 regex)."""
    m = re.match(
        r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
        s,
    )
    scheme, authority, path, query, fragment = m.groups()
    return {
        "scheme": scheme,
        "authority": authority,
        "path": path or "",
        "query": query,
        "fragment": fragment,
    }


def _java_resolve(base: str, ref: str) -> dict | None:
    """Resolve ``ref`` against ``base`` like java.net.URI.resolve.

    Returns the split result dict, or None where Java would throw. Java
    follows RFC 2396 §5.2 with JDK quirks: an *empty* ref resolves to the
    base minus its fragment... (JDK: returns base itself). Opaque refs
    (scheme + non-// path) are returned as-is.
    """
    b = _split_java_uri(base)
    r = _split_java_uri(ref)

    # ref has scheme -> absolute (Java: child.isAbsolute() -> child)
    if r["scheme"] is not None:
        return r
    # Java URI.resolve: if child fragment only (no scheme/auth/path/query)
    if (
        r["authority"] is None
        and r["path"] == ""
        and r["query"] is None
        and r["fragment"] is not None
    ):
        out = dict(b)
        out["fragment"] = r["fragment"]
        return out
    out = {
        "scheme": b["scheme"],
        "query": r["query"],
        "fragment": r["fragment"],
    }
    if r["authority"] is not None:
        out["authority"] = r["authority"]
        out["path"] = r["path"]
    else:
        out["authority"] = b["authority"]
        if r["path"].startswith("/"):
            out["path"] = r["path"]
        else:
            # merge + normalize (RFC 2396 §5.2 step 6)
            base_path = b["path"]
            idx = base_path.rfind("/")
            merged = (base_path[: idx + 1] if idx >= 0 else "") + r["path"]
            out["path"] = _normalize_path_rfc2396(merged)
    return out


def _normalize_path_rfc2396(path: str) -> str:
    """JDK URI path normalization (remove ./ and seg/../; leading ../ kept)."""
    segs = path.split("/")
    out: list[str] = []
    leading_slash = path.startswith("/")
    for seg in segs:
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] not in ("..", ""):
                out.pop()
            else:
                out.append("..")
        else:
            out.append(seg)
    result = "/".join(out)
    if path.endswith("/.") or path.endswith("/.."):
        # dir-style endings keep a trailing slash after normalization
        if not result.endswith("/"):
            result += "/"
    if leading_slash and not result.startswith("/"):
        result = "/" + result
    return result


def pagerank_normalize_url(link: str | None, base: str | None) -> str | None:
    """Port of PageRank.normalizeUrl (PageRank.java:786-816)."""
    if not link or not base:
        return None
    try:
        # java.net.URI constructor validates characters first
        from .urlnorm import _java_uri_legal

        if not _java_uri_legal(base) or not _java_uri_legal(link):
            return None
        resolved = _java_resolve(base, link)
        if resolved is None:
            return None
        scheme = resolved["scheme"]
        authority = resolved.get("authority")
        path = resolved["path"]
        if scheme is None or authority is None:
            return None
        host, port = _host_port(authority)
        if host is None:
            return None
        if scheme.lower() not in ("http", "https"):
            return None
        if not path:
            path = "/"
        if port == -1:
            port = 443 if scheme.lower() == "https" else 80
        return f"{scheme.lower()}://{host.lower()}:{port}{path}"
    except Exception:
        return None


def _host_port(authority: str) -> tuple[str | None, int]:
    """(getHost(), getPort()) from an authority string, JDK-style."""
    at = authority.find("@")
    hostport = authority[at + 1 :] if at >= 0 else authority
    if hostport.startswith("["):
        close = hostport.find("]")
        if close < 0:
            return None, -1
        host = hostport[: close + 1]
        rest = hostport[close + 1 :]
        if rest.startswith(":") and rest[1:].isdigit():
            return host, int(rest[1:])
        return host, -1
    colon = hostport.find(":")
    if colon >= 0:
        host, port_s = hostport[:colon], hostport[colon + 1 :]
        if port_s == "":
            port = -1
        elif port_s.isdigit():
            port = int(port_s)
        else:
            return None, -1
    else:
        host, port = hostport, -1
    if not host:
        return None, -1
    from .urlnorm import _IPV4, _JAVA_HOSTNAME

    if _IPV4.match(host) or _JAVA_HOSTNAME.match(host):
        return host, port
    return None, -1


_SKIP_PREFIXES_PR = ("#", "mailto:", "javascript:", "tel:", "data:", "ftp:")


def extract_links(source_url: str | None, html: str | None) -> set[str]:
    """Port of PageRank.extractLinks (PageRank.java:708-783).

    Returns the (≤30) normalized outlink set; content deterministic (the
    cap applies in scan order), iteration order is not.
    """
    links: set[str] = set()
    if html is None or source_url is None:
        return links
    lower = html.lower()
    pos = 0
    while True:
        pos = lower.find("<a", pos)
        if pos == -1:
            break
        tag_end = lower.find(">", pos)
        if tag_end == -1:
            break
        href_pos = lower.find("href=", pos)
        if href_pos == -1 or href_pos > tag_end:
            pos = tag_end + 1
            continue
        start = href_pos + 5
        if start >= len(html):
            pos = tag_end + 1
            continue
        first = html[start]
        if first in ('"', "'"):
            url_start = start + 1
            url_end = html.find(first, url_start)
            if url_end == -1 or url_end > tag_end:
                pos = tag_end + 1
                continue
        else:
            url_start = start
            space = html.find(" ", url_start)
            gt = html.find(">", url_start)
            url_end = gt if space == -1 else (space if gt == -1 else min(space, gt))
            if url_end == -1 or url_end > tag_end:
                url_end = tag_end
        if url_start >= url_end:
            pos = tag_end + 1
            continue
        href = j_trim(html[url_start:url_end])
        if not href:
            pos = tag_end + 1
            continue
        lower_href = href.lower()
        if lower_href.startswith(_SKIP_PREFIXES_PR):
            pos = tag_end + 1
            continue
        normalized = pagerank_normalize_url(href, source_url)
        if normalized is not None and normalized != source_url:
            links.add(normalized)
            if len(links) >= MAX_OUT_LINKS:
                break
        pos = tag_end + 1
    return links
