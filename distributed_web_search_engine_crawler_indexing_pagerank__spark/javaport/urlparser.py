"""Port of the reference URL splitter.

Reference: ``src/tools/URLParser.java:8-31``. Returns a 4-tuple
``(protocol, host, port, path)`` with ``None`` for absent parts, keeping
every quirk:

- the protocol is ``url[0:slashslash-1]`` (assumes a ``:`` right before
  ``//``; a URL like ``x//y`` yields protocol ``x`` minus its last char);
- ``//`` at index 0 (protocol-relative) does NOT split — the whole string
  becomes the path;
- the port is whatever follows the first ``:`` in the authority, with no
  numeric validation (may be empty or junk).
"""
from __future__ import annotations


def parse_url(url: str) -> tuple[str | None, str | None, str | None, str | None]:
    proto = host = port = path = None
    slashslash = url.find("//")
    if slashslash > 0:
        proto = url[: slashslash - 1]
        nextslash = url.find("/", slashslash + 2)
        if nextslash >= 0:
            host = url[slashslash + 2 : nextslash]
            path = url[nextslash:]
        else:
            host = url[slashslash + 2 :]
            path = "/"
        colon = host.find(":")
        if colon > 0:
            port = host[colon + 1 :]
            host = host[:colon]
    else:
        path = url
    return proto, host, port, path
