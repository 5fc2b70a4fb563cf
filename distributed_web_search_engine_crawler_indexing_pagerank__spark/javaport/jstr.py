"""Java string-semantics helpers.

Python and Java string APIs differ in corner cases that matter for
byte-exact parity (see SURVEY.md §7 "What's hard"):

- ``String.trim()`` strips code points <= U+0020 (not Unicode whitespace).
- Java regex ``\\s`` is ASCII ``[ \\t\\n\\x0B\\f\\r]`` (no UNICODE_CHARACTER_CLASS).
- Java regex ``.`` (without DOTALL) excludes \\n \\r \\u0085 \\u2028 \\u2029;
  Python's excludes only \\n.
- ``String.split(regex)`` drops *trailing* empty strings.

All helpers are pure and loop-free where possible so they vectorize well
under pandas ``Series.map``.
"""
from __future__ import annotations

import re

# Java default-mode `.`: anything but the five line terminators.
J_DOT = r"[^\n\r  ]"
# Java `\s` without UNICODE_CHARACTER_CLASS.
J_WS = r"[ \t\n\x0B\f\r]"

_TRIM_CHARS = "".join(chr(c) for c in range(0x21))


def j_trim(s: str) -> str:
    """Java String.trim(): strip leading/trailing chars <= U+0020."""
    return s.strip(_TRIM_CHARS)


def j_is_blank(s: str | None) -> bool:
    """Java String.isBlank(): true if empty or only Unicode whitespace."""
    return s is None or len(s.strip()) == 0 or all(ch.isspace() for ch in s)


def j_split(pattern: str, s: str) -> list[str]:
    """Java String.split(regex): split, dropping trailing empty strings."""
    parts = re.split(pattern, s)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def j_sub(pattern: str, repl: str, s: str, flags: int = 0) -> str:
    """Java String.replaceAll with a literal (non-backreference) replacement."""
    return re.sub(pattern, repl.replace("\\", "\\\\"), s, flags=flags)
