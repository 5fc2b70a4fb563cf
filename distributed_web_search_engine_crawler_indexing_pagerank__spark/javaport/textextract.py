"""Ports of the three HTML text extractors + title/snippet generators.

The per-row invariant of the whole system (BASELINE.json input_hint):
extracted text must be byte-identical per url vs the reference. Three
deliberately different variants exist in the reference:

- ``extract_body_text_for_index`` — ``src/jobs/Indexer.java:124-151``.
  NOTE the scripts/style patterns are ``(?i)`` but NOT DOTALL, so
  multi-line script/style blocks survive tag-stripping (their text leaks
  into the index). We reproduce that quirk.
- ``extract_body_text_pagerank`` — ``src/jobs/PageRank.java:669-697``:
  ``(?is)`` DOTALL, plus comment/head/nav/header/footer/aside removal and
  a 6-entity decode.
- ``extract_body_text_tfidf`` — ``src/jobs/TfIdf.java:323-351``: DOTALL
  script/style/comments, <body> narrowing, backreferenced
  nav|header|footer|aside removal, 4-entity decode.

Plus title (``PageRank.java:504-524``) and snippet (``:527-666``).

Java regex translation notes (see tests/golden for proof):
- Java default ``.`` excludes \\n \\r \\x85 \\u2028 \\u2029; Python's excludes
  only \\n — we spell the class explicitly (jstr.J_DOT).
- Java ``\\s`` is ASCII-only — we use jstr.J_WS.
- Java ``String.trim`` strips <= U+0020 — jstr.j_trim.
"""
from __future__ import annotations

import re

from .jstr import J_DOT, J_WS, j_trim

# --- Indexer variant (case-insensitive, NOT DOTALL) -----------------------
_IDX_SCRIPT = re.compile(rf"(?i)<script[^>]*>{J_DOT}*?</script>")
_IDX_STYLE = re.compile(rf"(?i)<style[^>]*>{J_DOT}*?</style>")
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(rf"{J_WS}+")


def extract_body_text_for_index(html: str | None) -> str:
    """Byte-exact port of Indexer.extractBodyTextForIndex (Indexer.java:124-151)."""
    if html is None:
        return ""
    html = _IDX_SCRIPT.sub(" ", html)
    html = _IDX_STYLE.sub(" ", html)
    body_start = html.lower().find("<body")
    if body_start != -1:
        closing = html.find(">", body_start)
        if closing != -1 and closing < len(html) - 1:
            body_start = closing + 1
            body_end = html.lower().find("</body>", body_start)
            if body_end != -1:
                html = html[body_start:body_end]
    html = _TAG.sub(" ", html)
    html = html.replace("&nbsp;", " ")
    html = html.replace("&amp;", "&")
    html = html.replace("&lt;", "<")
    html = html.replace("&gt;", ">")
    html = _WS.sub(" ", html)
    return j_trim(html)


# --- PageRank variant ((?is) DOTALL) --------------------------------------
_PR_PATTERNS = [
    re.compile(r"(?is)<script[^>]*>.*?</script>"),
    re.compile(r"(?is)<style[^>]*>.*?</style>"),
    re.compile(r"(?is)<!--.*?-->"),
    re.compile(r"(?is)<head[^>]*>.*?</head>"),
    re.compile(r"(?is)<nav[^>]*>.*?</nav>"),
    re.compile(r"(?is)<header[^>]*>.*?</header>"),
    re.compile(r"(?is)<footer[^>]*>.*?</footer>"),
    re.compile(r"(?is)<aside[^>]*>.*?</aside>"),
]
_PR_TAG = re.compile(r"(?is)<[^>]+>")


def extract_body_text_pagerank(html: str | None) -> str:
    """Byte-exact port of PageRank.extractBodyText (PageRank.java:669-697)."""
    if html is None:
        return ""
    text = html
    for pat in _PR_PATTERNS:
        text = pat.sub(" ", text)
    text = _PR_TAG.sub(" ", text)
    text = text.replace("&nbsp;", " ")
    text = text.replace("&amp;", "&")
    text = text.replace("&lt;", "<")
    text = text.replace("&gt;", ">")
    text = text.replace("&quot;", '"')
    text = text.replace("&#39;", "'")
    text = _WS.sub(" ", text)
    return j_trim(text)


def clean_text(text: str | None) -> str:
    """Port of PageRank.cleanText (PageRank.java:700-705)."""
    if text is None:
        return ""
    t = _TAG.sub(" ", text)
    t = _WS.sub(" ", t)
    return j_trim(t)


def extract_title(html: str | None) -> str:
    """Port of PageRank.extractTitle (PageRank.java:504-524)."""
    if html is None:
        return ""
    lower = html.lower()
    start = lower.find("<title")
    if start == -1:
        return ""
    start = html.find(">", start)
    if start == -1:
        return ""
    start += 1
    end = lower.find("</title>", start)
    if end == -1 or end <= start:
        return ""
    title = j_trim(html[start:end])
    title = clean_text(title)
    if len(title) > 120:
        title = title[:120] + "..."
    return title


def _extract_meta_tag(html: str, lower: str, attribute: str, value: str) -> str | None:
    """Port of PageRank.extractMetaTag (PageRank.java:585-628)."""
    pos = 0
    while True:
        pos = lower.find("<meta", pos)
        if pos == -1:
            break
        tag_end = lower.find(">", pos)
        if tag_end == -1:
            break
        tag_content = html[pos : tag_end + 1]
        tag_lower = tag_content.lower()
        attr_pattern = f'{attribute}="{value}"'
        attr_pattern_single = f"{attribute}='{value}'"
        if attr_pattern in tag_lower or attr_pattern_single in tag_lower:
            content_pos = tag_lower.find("content=")
            if content_pos != -1:
                content_start = content_pos + 8
                if content_start < len(tag_content):
                    quote = tag_content[content_start]
                    if quote in ('"', "'"):
                        content_end = tag_content.find(quote, content_start + 1)
                        if content_end != -1:
                            content = tag_content[content_start + 1 : content_end]
                            content = (
                                content.replace("&nbsp;", " ")
                                .replace("&amp;", "&")
                                .replace("&lt;", "<")
                                .replace("&gt;", ">")
                                .replace("&quot;", '"')
                                .replace("&#39;", "'")
                            )
                            return j_trim(content)
        pos = tag_end + 1
    return None


def _extract_meta_description(html: str | None) -> str | None:
    """Port of PageRank.extractMetaDescription (PageRank.java:559-582)."""
    if html is None:
        return None
    lower = html.lower()
    for attr, val in (
        ("property", "og:description"),
        ("name", "description"),
        ("name", "twitter:description"),
    ):
        desc = _extract_meta_tag(html, lower, attr, val)
        if desc:
            return desc
    return None


def _extract_semantic_content(html: str | None) -> str | None:
    """Port of PageRank.extractSemanticContent (PageRank.java:631-666)."""
    if html is None:
        return None
    lower = html.lower()
    for tag in ("main", "article", "section"):
        start = lower.find(f"<{tag}")
        if start != -1:
            end = lower.find(f"</{tag}>", start)
            if end != -1:
                content_start = html.find(">", start) + 1
                return html[content_start:end]
    return None


def generate_snippet(html: str | None) -> str:
    """Port of PageRank.generateSnippet (PageRank.java:527-556)."""
    meta = _extract_meta_description(html)
    if meta:
        if len(meta) > 200:
            return meta[:200] + "..."
        return meta

    semantic = _extract_semantic_content(html)
    if semantic is not None:
        plain = clean_text(semantic)
    else:
        body = extract_body_text_pagerank(html)
        if len(body) > 300:
            body = body[300:]
        plain = clean_text(body)

    if len(plain) > 200:
        return plain[:200] + "..."
    return plain


# --- TfIdf variant --------------------------------------------------------
_TF_SCRIPT = re.compile(r"(?is)<script[^>]*>.*?</script>")
_TF_STYLE = re.compile(r"(?is)<style[^>]*>.*?</style>")
_TF_COMMENT = re.compile(r"(?is)<!--.*?-->")
_TF_NAVBLOCK = re.compile(r"(?is)<(nav|header|footer|aside)[^>]*>.*?</\1>")


def extract_body_text_tfidf(html: str | None) -> str:
    """Byte-exact port of TfIdf.extractBodyText (TfIdf.java:323-351)."""
    if html is None or html == "":
        return ""
    cleaned = _TF_SCRIPT.sub(" ", html)
    cleaned = _TF_STYLE.sub(" ", cleaned)
    cleaned = _TF_COMMENT.sub(" ", cleaned)

    body_start = cleaned.lower().find("<body")
    if body_start >= 0:
        close = cleaned.find(">", body_start)
        if close >= 0:
            body_end = cleaned.lower().find("</body>", close + 1)
            if body_end > close:
                cleaned = cleaned[close + 1 : body_end]

    cleaned = _TF_NAVBLOCK.sub(" ", cleaned)
    cleaned = _TAG.sub(" ", cleaned)
    cleaned = (
        cleaned.replace("&nbsp;", " ")
        .replace("&amp;", "&")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
    )
    cleaned = _WS.sub(" ", cleaned)
    return j_trim(cleaned)
