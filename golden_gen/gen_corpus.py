#!/usr/bin/env python3
"""Generate input corpora, run the reference implementation on them (via the
GoldenGen reflection harness), and store byte-exact golden fixtures in
tests/golden/.

The corpora are deterministic (seeded). Re-run after editing with:
    cd golden_gen && python gen_corpus.py
"""
from __future__ import annotations

import base64
import pathlib
import random
import subprocess

HERE = pathlib.Path(__file__).resolve().parent
GOLDEN = HERE.parent / "tests" / "golden"
GOLDEN.mkdir(parents=True, exist_ok=True)

rng = random.Random(20260816)


def b64(s: str) -> str:
    if s == "":
        return "-"  # marker for empty string (empty b64 lines would be skipped)
    return base64.b64encode(s.encode("utf-8")).decode("ascii")


def write_inputs(name: str, rows: list[tuple[str, ...]]) -> pathlib.Path:
    p = GOLDEN / f"{name}.in"
    with open(p, "w") as f:
        for row in rows:
            f.write("|".join(b64(x) for x in row) + "\n")
    return p


def run_mode(mode: str, name: str, rows: list[tuple[str, ...]]):
    inp = write_inputs(name, rows)
    out = GOLDEN / f"{name}.out"
    subprocess.run(
        ["java", "-cp", str(HERE / "classes"), "GoldenGen", mode, str(inp), str(out)],
        check=True,
    )
    print(f"{name}: {len(rows)} cases")


# ---------------------------------------------------------------------------
# URL corpora
# ---------------------------------------------------------------------------
SEEDS = [
    "https://en.wikipedia.org/wiki/Main_Page", "https://www.britannica.com/",
    "https://www.bbc.com/news", "https://arxiv.org/", "https://www.github.com/",
    "https://stackoverflow.com/", "https://www.python.org/",
]

URLS = SEEDS + [
    "http://example.com", "http://example.com/", "https://example.com",
    "http://example.com:80/", "https://example.com:443/", "http://example.com:8080/x",
    "https://example.com:80/x", "http://example.com:443/x",
    "HTTP://EXAMPLE.COM/Path", "https://Example.COM:8443/A/B?q=1",
    "http://example.com/a/./b", "http://example.com/a/b/../c",
    "http://example.com/a/b/c/../../d", "http://example.com/../x",
    "http://example.com/a?b=c&d=e", "http://example.com/a#frag",
    "http://example.com/#", "example.com/path", "//example.com/p",
    "ftp://example.com/x", "mailto:a@b.com", "javascript:void(0)",
    "http:///nohost", "http://", "http://host_with_underscore.com/x",
    "http://host.com:notaport/x", "http://host.com:/x",
    "http://sub.domain.example.co.uk/deep/path/file.html",
    "https://www.facebook.com/page", "https://twitter.com/x", "http://localhost/x",
    "http://127.0.0.1:9000/x", "https://cdn.cnn.com/a", "http://t.co/abc",
    "http://example.com/file.jpg", "http://example.com/file.PDF",
    "http://example.com/file.php", "http://example.com/file.aspx",
    "http://example.com/doc.json", "http://example.com/feed.xml",
    "http://example.com/search?q=x", "http://example.com/?q=x",
    "http://example.com/a?query=x", "http://example.com/login",
    "http://example.com/accounts", "http://example.com/cart/view",
    "http://example.com/page?utm_source=x", "http://example.com/p?a=1&utm_b=2",
    "http://example.com/p?gclid=123", "http://example.com/p?fbclid=9",
    "http://example.com/p?ref=home", "http://example.com/p?source=nav",
    "http://example.com/share?u=1", "http://example.com/api/v1/x",
    "http://example.com/graphql", "http://example.com/print/page",
    "http://example.com/p?print", "http://example.com/p;jsessionid=abc",
    "http://example.com/es/page", "http://example.com/de/", "http://example.com/FR/x",
    "http://example.com/calendar", "http://example.com/events/2024",
    "http://example.com/year/2024", "http://example.com/a/month/5",
    "http://example.com/day/1", "  http://example.com/trimme  ",
    "", " ", "#", "#top", "http://example.com/a b c",
    "http://example.com/%20encoded%2Fpath", "http://example.com/unicode/ü",
    "https://www.medium.com/story", "http://doubleclick.net/ad",
    "http://akamaihd.net/asset", "http://example.com/file.tar.gz",
    "http://example.com/x.woff2", "http://example.com/x.HTML",
    "http://example.com/x.htm", "http://example.com/events",
    "http://example.com/", "http://example.com/p?PRINT",
]

BASES = [
    "http://example.com/a/b/c.html", "https://example.com/a/b/",
    "http://example.com/", "http://example.com", "https://host.org:8443/x/y",
    "http://example.com/a?q=1", "relative-base", "https://example.com/a/b/c/d/e",
]
HREFS = [
    "http://other.com/x", "https://other.com:9090/y", "HTTP://OTHER.COM/Z",
    "//cdn.example.com/lib.js", "//cdn.example.com", "/rooted/path",
    "/rooted/../x", "sub/page.html", "../up/one.html", "../../up/two.html",
    "./same/dir.html", "page.html", "page.html#sec", "#fragonly", "",
    "  spaced.html  ", "mailto:x@y.z", "MAILTO:x@y.z", "javascript:alert(1)",
    "tel:+1234", "data:text/plain;base64,AAA", "about:blank", "ftp://f.com/x",
    "http://example.com/a/./b/../c.html", "?onlyquery", "//",
    "http://example.com:80/explicit", "https://example.com:443/explicit",
    "https://example.com:8080/nondefault", "x/y/../../../z.html",
    "/es/page", "/file.png", "urldefense.com/v3/__http://real.com/x__;!!abc$",
    "https://urldefense.com/v3/__https://t.com/p*20q__;JQ!!x$",
    "https://urldefense.com/v3/no-markers", "http://host_u.com/x",
]
# The reference's /../-collapse loop never terminates on paths that reduce
# to a leading "/../" (e.g. base path "/" + href "../x"): replaceAll cannot
# match, the while-loop spins forever. Exclude those pairs — they can never
# appear in a reference crawl trace. Detection uses our port's loop-guard.
import sys
sys.path.insert(0, str(HERE.parent))
from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport import urlnorm as _un


def _terminates(b: str, h: str) -> bool:
    _un.LAST_BROKE_LOOP = False
    _un.normalize_and_filter_url(b, h)
    return not _un.LAST_BROKE_LOOP


norm_pairs = [(b, h) for b in BASES for h in HREFS if _terminates(b, h)]
print(f"norm pairs: {len(norm_pairs)} (excluded {len(BASES)*len(HREFS)-len(norm_pairs)} non-terminating)")

run_mode("hash", "hash", [(u,) for u in URLS] + [(w,) for w in ["", "a", "word", "café", "\x00weird", "x" * 300]] + [(str(i),) for i in range(2000)])
run_mode("parseurl", "parseurl", [(u,) for u in URLS])
run_mode("norm", "norm", norm_pairs)
run_mode("seednorm", "seednorm", [(u,) for u in URLS])
run_mode("hostkey", "hostkey", [(u,) for u in URLS if u.strip()])
run_mode("protocol", "protocol", [(u,) for u in URLS if u.strip()])
run_mode("path", "path", [(u,) for u in URLS if u.strip()])
run_mode("hostname", "hostname", [(u,) for u in URLS])
run_mode("skippable", "skippable", [(h,) for h in HREFS + URLS])
run_mode("urldefense", "urldefense", [(h,) for h in HREFS + [
    "https://urldefense.com/v3/__http://inner.com/a*20b__;JQ!!sig$",
    "https://urldefense.com/v3/__bad", "urldefense.com__x__y__z",
    "URLDEFENSE.COM/__http://c.com__;", "http://plain.com/x",
]])
run_mode("shouldcrawl", "shouldcrawl", [(u,) for u in URLS if u])

# ---------------------------------------------------------------------------
# HTML corpora
# ---------------------------------------------------------------------------
HTMLS = [
    "",
    "plain text no tags",
    "<html><body>Hello World</body></html>",
    "<html><head><title>My Title</title></head><body>Body text here</body></html>",
    "<body>no html wrapper</body>",
    "<BODY CLASS='x'>attr body</BODY>",
    "<body>unclosed body text",
    "text before <body>inside</body> text after",
    "<script>var x = 1;</script>visible",
    "<script>\nmultiline\nscript\n</script>visible",  # non-DOTALL quirk: survives in Indexer
    "<SCRIPT type='text/js'>inline</SCRIPT>after",
    "<style>.a { color: red }</style>styled",
    "<style>\n.multi { x }\n</style>styled",
    "<!-- comment -->text",
    "<!-- multi\nline\ncomment -->text",
    "<nav>navigation</nav>content",
    "<nav class='top'>nav\nlines</nav>content",
    "<header>head</header><footer>foot</footer>mid",
    "<aside>side</aside>main",
    "<nav><header>nested</header></nav>out",  # backreference behavior
    "a &amp; b &lt;c&gt; &nbsp; d &quot;e&quot; &#39;f&#39;",
    "words  with\t\tmany   \n\n spaces",
    "<main>main content here</main><body>body stuff</body>",
    "<article>article text</article>",
    "<section>section text</section>",
    "<main>outer <article>inner</article></main>",
    '<meta property="og:description" content="OG description text">body',
    "<meta name='description' content='std description'>body",
    '<meta name="twitter:description" content="tw desc">body',
    '<META PROPERTY="OG:DESCRIPTION" CONTENT="upper og">body',
    '<meta property="og:description" content=\'single quoted og\'>x',
    '<meta name="description" content="with &amp; entity">x',
    '<meta name="description" content=unquoted>x',
    '<meta name="keywords" content="not a description">fallback body text ' + "y " * 200,
    "<title>Short</title><body>b</body>",
    "<title>" + "T" * 150 + "</title><body>b</body>",
    "<title>Multi word <b>bold</b> title</title>",
    "<title>unclosed title <body>b</body>",
    "<TITLE>CAPS</TITLE>",
    "<title></title>empty",
    "body " + "word " * 400,  # long body → snippet 300-skip + 200-cap path
    "<body>" + "x" * 250 + " tail of the body text here more words</body>",
    "<html><head><title>T</title><script>s</script></head><body><nav>n</nav><p>para &amp; stuff</p></body></html>",
    "<head>in head</head>after head",
    "<head>\nmulti\n</head>after",
    "<div>a<div>b</div>c</div>",
    "<p>≤unicode≥ çontent</p>",
    "<body>first</body><body>second</body>",
    "<main>m1</main><main>m2</main>",
    "<article>a</article><section>s</section><main>m</main>",
    "<script>no close",
    "<style>no close",
    "tag soup < not a tag > text",
    "<b>bold<i>italic</i></b>",
    "<script>a</script><script>b</script>c",
]
# seeded fuzz html
TAGS = ["script", "style", "body", "nav", "header", "footer", "aside", "main",
        "article", "section", "title", "div", "p", "a", "b", "head", "meta"]
WORDS = ["alpha", "beta", "Gamma", "DELTA", "&amp;", "&nbsp;", "&lt;", "x&gt;y",
         "&quot;", "&#39;", "tab\there", "line\nbreak", "many   spaces"]
for i in range(60):
    parts = []
    for _ in range(rng.randint(3, 25)):
        r = rng.random()
        if r < 0.35:
            t = rng.choice(TAGS)
            inner = " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 6)))
            if rng.random() < 0.15:
                parts.append(f"<{t}>{inner}")  # unclosed
            else:
                parts.append(f"<{t}>{inner}</{t}>")
        elif r < 0.5:
            parts.append(f"<!-- {rng.choice(WORDS)} -->")
        else:
            parts.append(rng.choice(WORDS))
    HTMLS.append(" ".join(parts))

run_mode("indexextract", "indexextract", [(h,) for h in HTMLS])
run_mode("prtitle", "prtitle", [(h,) for h in HTMLS])
run_mode("prsnippet", "prsnippet", [(h,) for h in HTMLS])
run_mode("prbody", "prbody", [(h,) for h in HTMLS])
run_mode("tfidfbody", "tfidfbody", [(h,) for h in HTMLS])

# ---------------------------------------------------------------------------
# link-extraction corpora
# ---------------------------------------------------------------------------
LINK_HTMLS = [
    '<a href="http://x.com/a">A</a>',
    "<a href='http://x.com/b'>B</a>",
    "<a href=http://x.com/bare>bare</a>",
    "<a href=http://x.com/bare2 class=y>bare</a>",
    '<A HREF="HTTP://X.COM/CAPS">C</A>',
    '<a class="z" href="/rooted">r</a>',
    '<a href="rel/path.html">rel</a>',
    '<a href="../up.html">up</a>',
    '<a href="#frag">f</a>',
    '<a href="">empty</a>',
    '<a href="mailto:x@y.z">m</a><a href="tel:123">t</a>',
    '<a href="javascript:void(0)">j</a>',
    '<a href="data:text/plain,x">d</a><a href="ftp://f.co/x">f</a>',
    '<a href="about:blank">a</a>',
    '<a>no href</a><a href="http://x.com/c">C</a>',
    '<a href="http://x.com/1">1</a><a href="http://x.com/2">2</a><a href="http://x.com/1">dup</a>',
    '<a\nhref="http://x.com/newline">n</a>',
    '<a href="http://x.com/unclosed',
    '<a href="http://x.com/beyond"',
    'text <a href = "http://x.com/spaced">s</a>',  # "href=" with spaces -> not found pattern
    '<a data-href="http://x.com/data">d</a>',      # href= appears inside data-href=
    '<a href="http://x.com/a?q=1&r=2">q</a>',
    '<a href="//proto.rel/x">pr</a>',
    '<a href=\'http://x.com/sq"dq\'>mix</a>',
    "<abbr href='http://x.com/abbr'>not-anchor-but-<a-prefix</abbr>",
    "".join(f'<a href="http://many.com/p{i}">l{i}</a>' for i in range(40)),  # >30 cap
    '<a href="http://self.com/page">self</a>',
]
BASES_L = ["http://base.com/dir/page.html", "http://self.com/page", "https://base.com:8080/x/"]
run_mode("extracturls", "extracturls", [(h,) for h in LINK_HTMLS])
run_mode("prlinks", "prlinks", [(b, h) for b in BASES_L for h in LINK_HTMLS])
run_mode("prnormurl", "prnormurl", [(b, h) for b in BASES_L for h in [
    "http://abs.com/x", "/rooted", "rel.html", "../up.html", "./dot.html",
    "//proto.rel/x", "?q=1", "", "x/../../z", "http://host_u.com/x",
    "HTTPS://CAPS.COM/P", "http://abs.com:8080/x", "ftp://no.com/x",
    "c:opaque", "weird spaces path",
]])

# ---------------------------------------------------------------------------
# robots corpora
# ---------------------------------------------------------------------------
ROBOTS = [
    "",
    "User-agent: *\nDisallow: /private",
    "User-agent: *\nDisallow: /private\nAllow: /private/ok",
    "User-agent: cis5550-crawler\nDisallow: /nope\n\nUser-agent: *\nDisallow: /other",
    "User-Agent: CIS5550-CRAWLER\nDisallow: /case",
    "User-agent: googlebot\nDisallow: /google-only",
    "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x",
    "User-agent: cis5550-crawler\nCrawl-delay: 0.5\nUser-agent: *\nCrawl-delay: 9",
    "User-agent: *\nCrawl-delay: notanumber",
    "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 7",
    "# comment\nUser-agent: *\n# another\nDisallow: /c\n",
    "User-agent: *\r\nDisallow: /crlf\r\n",
    "User-agent: *\nDisallow:\n",
    "User-agent: *\nDisallow: \n",
    "User-agent: *\nAllow: /\nDisallow: /all",
    "User-agent: *\nDisallow: /a\nDisallow: /a/b\nAllow: /a/b/c",
    "Disallow: /before-any-group",
    "User-agent: *\nSitemap: http://x.com/sitemap.xml\nDisallow: /s",
    "user-agent: *\ndisallow: /lowerkeys",
    "User-agent: *\nDisallow: /q?x=1",
    "User-agent: other\nUser-agent: *\nDisallow: /second-group",
    "no colons here\nUser-agent: *\nDisallow: /after-junk",
    "User-agent: *\nAllow: /wp-admin/admin-ajax.php\nDisallow: /wp-admin/",
    ": leading colon\nUser-agent: *\nDisallow: /lead",
]
run_mode("robotsrules", "robotsrules", [(r,) for r in ROBOTS])
run_mode("crawldelay", "crawldelay", [(r,) for r in ROBOTS])

print("all golden fixtures written to", GOLDEN)
