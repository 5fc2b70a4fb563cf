"""Port of the robots.txt evaluator.

Reference (``src/jobs/Crawler.java``):
- ``parseRobotsRulesOrdered`` (:853-896) — ordered Allow/Disallow rules,
  grouped by exact-match User-agent vs ``*`` (group 3 = other agents,
  rules dropped).
- ``robotsAllows`` (:780-849) — longest-prefix-match wins; allow when no
  rule matches; UA group preferred over ``*`` group when non-empty.
  The status-code gates (:786-803): 404 / <=0 / non-2xx / empty body =>
  allow-all.
- ``extractCrawlDelay`` (:898-938) — first Crawl-delay directive of the
  matching group; UA group wins; must parse as a double.

Rules are encoded exactly like the reference: ``"A:<prefix>"`` /
``"D:<prefix>"`` strings, because robotsAllows re-parses them with
position arithmetic (rule[0] kind, rule[1] must be ' ' — i.e. only rules
whose value started with a space after the colon+trim... see below).

Quirk kept: robotsAllows checks ``rule.charAt(1) != ' '`` — but rules are
built as ``"A:" + val`` so char(1) is ':' never ' '. Wait: charAt(1) of
"A:/x" is ':' — the reference's check ``rule.charAt(1) != ' '`` would skip
EVERY rule... unless val itself makes it. Actually: prefix = substring(2)
strips "A:" leaving val. The charAt(1)==' ' check compares ':' vs ' ' and
is False for all "X:" rules => *every rule is skipped* => robotsAllows
always returns True?? No: charAt(1) is ':' and the test is
``if (rule.charAt(1) != ' ') continue;`` — ':' != ' ' is true, so continue
fires and ALL rules are skipped. See test_robots.py::test_reference_quirk
for the golden-backed verification of the actual behavior.
"""
from __future__ import annotations

UA = "cis5550-crawler"
DEFAULT_DELAY = 1.0


def parse_robots_rules_ordered(
    robots: str | None, ua: str = UA
) -> tuple[list[str], list[str]]:
    """Returns (rules_for_ua, rules_for_star) as "A:<val>"/"D:<val>" strings."""
    rules_ua: list[str] = []
    rules_star: list[str] = []
    if robots is None:
        return rules_ua, rules_star
    group = 0
    for raw in robots.replace("\r", "").split("\n"):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        colon = line.find(":")
        if colon <= 0:
            continue
        key = line[:colon].strip().lower()
        val = line[colon + 1 :].strip()
        if key == "user-agent":
            v_lower = val.lower()
            if v_lower == ua.lower():
                group = 1
            elif v_lower == "*":
                group = 2
            else:
                group = 3
        elif key == "allow":
            if group == 1:
                rules_ua.append("A:" + val)
            elif group == 2:
                rules_star.append("A:" + val)
        elif key == "disallow":
            if group == 1:
                rules_ua.append("D:" + val)
            elif group == 2:
                rules_star.append("D:" + val)
    return rules_ua, rules_star


def robots_allows_rules(rules: list[str], path: str) -> bool:
    """The rule-evaluation core of robotsAllows (Crawler.java:823-848).

    Keeps the reference's dead-check quirk: a rule only counts if its
    second char is ' ' — since rules are "A:..."/"D:...", char(1) is
    always ':', so no rule ever matches and the function returns True.
    This makes the reference's robots evaluation allow-all in practice;
    we preserve exactly that for trace parity (verified by golden tests),
    and additionally expose robots_allows_strict() implementing the
    evidently *intended* longest-prefix semantics for our engine's
    optional strict mode.
    """
    is_allow = True
    longest: str | None = None
    for rule in rules:
        if rule is None or len(rule) < 3:
            continue
        kind = rule[0]
        if rule[1] != " ":
            continue
        prefix = rule[2:]
        if not prefix:
            continue
        if path.startswith(prefix):
            if longest is None or len(prefix) > len(longest):
                longest = prefix
                is_allow = kind == "A"
    return longest is None or is_allow


def robots_allows_strict_rules(rules: list[str], path: str) -> bool:
    """Longest-prefix-match evaluation as evidently intended (rule
    separator ':' instead of the dead ' ' check)."""
    is_allow = True
    longest: str | None = None
    for rule in rules:
        if rule is None or len(rule) < 3:
            continue
        kind = rule[0]
        if rule[1] != ":":
            continue
        prefix = rule[2:]
        if not prefix:
            continue
        if path.startswith(prefix):
            if longest is None or len(prefix) > len(longest):
                longest = prefix
                is_allow = kind == "A"
    return longest is None or is_allow


def robots_allows(
    robots_txt: str | None,
    robots_status: int,
    path: str,
    ua: str = UA,
    strict: bool = False,
) -> bool:
    """Full robotsAllows gate (Crawler.java:780-849) against in-memory
    host state instead of a KVS row. ``strict=False`` reproduces the
    reference byte-for-byte (allow-all, see robots_allows_rules);
    ``strict=True`` evaluates rules as intended."""
    if robots_status == 404 or robots_status <= 0:
        return True
    if robots_status < 200 or robots_status >= 300:
        return True
    if not robots_txt:
        return True
    if not path.startswith("/"):
        idx = path.find("/", path.find("://") + 3)
        path = path[idx:] if idx >= 0 else "/"
    rules_ua, rules_star = parse_robots_rules_ordered(robots_txt, ua)
    rules = rules_star if not rules_ua else rules_ua
    if not rules:
        return True
    if strict:
        return robots_allows_strict_rules(rules, path)
    return robots_allows_rules(rules, path)


def extract_crawl_delay(robots: str | None, ua: str = UA) -> str | None:
    """Port of extractCrawlDelay (Crawler.java:898-938); returns the raw
    string (caller parses) or None."""
    if robots is None:
        return None
    group = 0
    first_target: str | None = None
    first_star: str | None = None
    for raw in robots.replace("\r", "").split("\n"):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        colon = line.find(":")
        if colon <= 0:
            continue
        key = line[:colon].strip().lower()
        val = line[colon + 1 :].strip()
        if key == "user-agent":
            v_lower = val.lower()
            if v_lower == ua.lower():
                group = 1
            elif v_lower == "*":
                group = 2
            else:
                group = 3
            continue
        if key == "crawl-delay":
            if group == 1 and first_target is None:
                first_target = val
            elif group == 2 and first_star is None:
                first_star = val
    chosen = first_target if first_target is not None else first_star
    if chosen is None:
        return None
    try:
        float(chosen)  # Java Double.parseDouble validation
    except ValueError:
        return None
    return chosen


def crawl_delay_seconds(robots_txt: str | None, ua: str = UA) -> float:
    """Parsed crawl delay with the reference default (Crawler.java:37,695-705)."""
    raw = extract_crawl_delay(robots_txt, ua)
    if raw is None:
        return DEFAULT_DELAY
    try:
        return float(raw)
    except ValueError:
        return DEFAULT_DELAY
