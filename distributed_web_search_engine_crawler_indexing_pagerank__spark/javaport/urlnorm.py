"""Port of the crawler's URL canonicalizer / filters.

Reference functions (``src/jobs/Crawler.java``):

- ``normalizeAndFilterUrl`` (:495-625) — THE canonicalizer; byte-exact
  output is required for URL-seen-set parity.
- ``normalizeSeedUrl`` (:628-651)
- ``extractHostKey`` (:653-661), ``extractProtocol`` (:663-667),
  ``extractPath`` (:669-674)
- ``hostname`` (:1026-1040) — java.net.URI-based host (host-cap key)
- ``isSkippableHref`` (:1079-1090), ``unwrapUrlDefense`` (:1092-1109)
- ``shouldCrawl`` (:940-982) with the ``Urls.java`` blacklists.

One deliberate deviation: the reference's ``while path.contains("/../")``
loop hangs forever on paths like ``/../x`` where the inner
``replaceAll("/[^/]+/\\.\\./", "/")`` cannot make progress (a latent
infinite-loop bug). We break out when a pass makes no change; such URLs
never complete in the reference, so they cannot appear in its crawl trace
either — parity is preserved for all terminating inputs.
"""
from __future__ import annotations

import re
import urllib.parse

from .blacklists import (
    BLACKLISTED_EXTENSIONS,
    BLACKLISTED_HOSTS,
    BLACKLISTED_LANGUAGE,
    BLACKLISTED_SUBSTRINGS,
)
from .jstr import j_trim
from .urlparser import parse_url

_SEG_DOTDOT = re.compile(r"/[^/]+/\.\./")

# Diagnostic flag: set True whenever the /../ loop-guard fires (i.e. the
# reference implementation would infinite-loop on this input). Used by the
# golden-fixture generator to exclude non-terminating inputs.
LAST_BROKE_LOOP = False


def normalize_and_filter_url(base_url: str, url: str | None) -> str | None:
    if url is None:
        return None
    url = j_trim(url)
    if not url:
        return None

    frag = url.find("#")
    if frag >= 0:
        url = url[:frag]
    if not url:
        return None

    lower = url.lower()
    if lower.startswith("mailto:") or lower.startswith("javascript:"):
        return None

    b_proto, b_host, b_port, b_path = parse_url(base_url)
    base_protocol = b_proto.lower() if b_proto is not None else "http"
    base_host = b_host.lower() if b_host is not None else ""
    base_port = b_port if (b_port is not None and b_port != "") else (
        "443" if base_protocol == "https" else "80"
    )
    base_path = b_path if b_path is not None else "/"

    proto = base_protocol
    host = base_host
    port = base_port

    if url.startswith("http://") or url.startswith("https://"):
        p0, p1, p2, p3 = parse_url(url)
        proto = p0.lower() if p0 is not None else "http"
        host = p1.lower() if p1 is not None else ""
        port = p2 if (p2 is not None and p2 != "") else (
            "443" if proto == "https" else "80"
        )
        path = p3 if (p3 is not None and p3 != "") else "/"
    elif url.startswith("//"):
        without = url[2:]
        slash = without.find("/")
        if slash >= 0:
            host = without[:slash].lower()
            path = without[slash:]
        else:
            host = without.lower()
            path = "/"
        proto = base_protocol
        port = "443" if proto == "https" else "80"
    elif url.startswith("/"):
        path = url
    else:
        last_slash = base_path.rfind("/")
        base_dir = base_path[: last_slash + 1] if last_slash >= 0 else "/"
        path = base_dir + url

    if not host:
        return None

    if not path.startswith("/"):
        path = "/" + path

    while "/./" in path:
        path = path.replace("/./", "/")
    while "/../" in path:
        new_path = _SEG_DOTDOT.sub("/", path)
        if new_path == path:
            global LAST_BROKE_LOOP
            LAST_BROKE_LOOP = True
            break  # reference would loop forever here; see module docstring
        path = new_path
    if not path:
        path = "/"

    if proto not in ("http", "https"):
        return None

    if not port:
        port = "443" if proto == "https" else "80"

    is_default = (proto == "https" and port == "443") or (
        proto == "http" and port == "80"
    )
    if is_default:
        return f"{proto}://{host}{path}"
    return f"{proto}://{host}:{port}{path}"


def normalize_seed_url(url: str | None) -> str | None:
    if url is None:
        return None
    frag = url.find("#")
    if frag >= 0:
        url = url[:frag]
    p0, p1, p2, p3 = parse_url(url)
    proto = p0 if p0 is not None else "http"
    host = p1 if p1 is not None else ""
    if not host:
        return None
    port = p2 if (p2 is not None and p2 != "") else (
        "443" if proto == "https" else "80"
    )
    path = p3 if (p3 is not None and p3 != "") else "/"
    if not path.startswith("/"):
        path = "/" + path
    is_default = (proto == "https" and port == "443") or (
        proto == "http" and port == "80"
    )
    if is_default:
        return f"{proto}://{host}{path}"
    return f"{proto}://{host}:{port}{path}"


def extract_host_key(canonical: str) -> str:
    p0, p1, p2, _ = parse_url(canonical)
    proto = p0.lower() if p0 is not None else "http"
    host = p1.lower() if p1 is not None else ""
    port = p2 if (p2 is not None and p2 != "") else (
        "443" if proto == "https" else "80"
    )
    return f"{host}:{port}" if host else ""


def extract_protocol(canonical: str) -> str:
    p0, _, _, _ = parse_url(canonical)
    return p0.lower() if p0 is not None else "http"


def extract_path(canonical: str) -> str:
    _, _, _, p3 = parse_url(canonical)
    path = p3 if (p3 is not None and p3 != "") else "/"
    if not path.startswith("/"):
        path = "/" + path
    return path


# ---------------------------------------------------------------------------
# java.net.URI host emulation (for Crawler.hostname / host-cap keying)
# ---------------------------------------------------------------------------

# Characters java.net.URI accepts un-escaped anywhere in a URI string:
# the RFC 2396 set, plus (a JDK extension) any non-ASCII char that is not a
# space char or ISO control ("other" category in the JDK parser).
_JAVA_URI_LEGAL_ASCII = re.compile(
    r"^(?:[A-Za-z0-9\-_.!~*'();/?:@&=+$,\[\]#]|%[0-9A-Fa-f]{2})*$"
)


def _java_uri_legal(s: str) -> bool:
    ascii_part = "".join(ch for ch in s if ord(ch) < 0x80)
    # rebuild preserving %-escapes: simpler to scan char-wise
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        o = ord(ch)
        if o >= 0x80:
            import unicodedata

            if ch.isspace() or unicodedata.category(ch) in ("Cc", "Cf", "Zs", "Zl", "Zp"):
                return False
            i += 1
            continue
        if ch == "%":
            if i + 2 < n + 1 and re.match(r"%[0-9A-Fa-f]{2}", s[i : i + 3]):
                i += 3
                continue
            return False
        if re.match(r"[A-Za-z0-9\-_.!~*'();/?:@&=+$,\[\]#]", ch):
            i += 1
            continue
        return False
    return True
_JAVA_HOSTNAME = re.compile(
    r"^(?:[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?)"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?)*\.?$"
)
_IPV4 = re.compile(r"^(?:\d{1,3}\.){3}\d{1,3}$")


def _java_uri_host(url: str) -> str | None:
    """Host as java.net.URI.getHost() would return it, else None.

    Raises ValueError where Java's URI.create would throw.
    """
    if not _java_uri_legal(url):
        raise ValueError("illegal character in URI")
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*):", url)
    rest = url[m.end():] if m else url
    if not rest.startswith("//"):
        return None
    if rest == "//":
        # JDK: "Expected authority" when // ends the string
        raise ValueError("expected authority")
    authority = rest[2:]
    for stop in "/?#":
        idx = authority.find(stop)
        if idx >= 0:
            authority = authority[:idx]
    if not authority:
        return None
    at = authority.find("@")
    hostport = authority[at + 1 :] if at >= 0 else authority
    if hostport.startswith("["):
        close = hostport.find("]")
        if close < 0:
            raise ValueError("unclosed IPv6 literal")
        return hostport[: close + 1]
    colon = hostport.find(":")
    if colon >= 0:
        host, port = hostport[:colon], hostport[colon + 1 :]
        if port and not port.isdigit():
            return None  # server-authority parse fails -> registry authority
    else:
        host = hostport
    if not host:
        return None
    if _IPV4.match(host) or _JAVA_HOSTNAME.match(host):
        return host
    return None


def hostname(url: str | None) -> str:
    """Reference ``Crawler.hostname``: lowercase URI host, '' on failure."""
    if url is None or url.strip() == "":
        return ""
    try:
        host = _java_uri_host(url.strip())
        if host is None:
            retry = ("http:" if url.startswith("//") else "http://") + url.strip()
            host = _java_uri_host(retry)
        return host.lower() if host is not None else ""
    except ValueError:
        return ""


# ---------------------------------------------------------------------------
# href filters
# ---------------------------------------------------------------------------

_SKIP_PREFIXES = ("mailto:", "tel:", "javascript:", "data:", "about:", "ftp:")


def is_skippable_href(href: str | None) -> bool:
    if href is None:
        return True
    h = j_trim(href)
    if not h or h.startswith("#"):
        return True
    lower = h.lower()
    return lower.startswith(_SKIP_PREFIXES)


def unwrap_urldefense(url: str | None) -> str | None:
    if url is None:
        return None
    if "urldefense.com" not in url.lower():
        return url
    a = url.find("__")
    if a < 0:
        return None
    b = url.find("__", a + 2)
    if b <= a + 2:
        return None
    inner = url[a + 2 : b]
    try:
        return urllib.parse.unquote(inner, encoding="utf-8", errors="replace")
    except Exception:
        return None


def should_crawl(url: str | None) -> bool:
    if not url:
        return False
    p0, p1, _, p3 = parse_url(url)
    protocol = p0.lower() if p0 is not None else "http"
    host = p1.lower() if p1 is not None else ""
    path = p3 if (p3 is not None and p3 != "") else "/"

    if protocol not in ("http", "https"):
        return False
    if not host:
        return False

    lower_path = path.lower()
    lower_url = url.lower()

    if host in BLACKLISTED_HOSTS:
        return False
    for ext in BLACKLISTED_EXTENSIONS:
        if lower_path.endswith(ext):
            return False
    for s in BLACKLISTED_SUBSTRINGS:
        if s in lower_url:
            return False
    for s in BLACKLISTED_LANGUAGE:
        if s in lower_path:
            return False
    return True
