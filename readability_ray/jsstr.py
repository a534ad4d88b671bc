"""JavaScript-compatible string semantics.

The reference engine (mizchi/readability) runs on V8: its ``trim()`` /
``\\s`` regex class / ``replace`` semantics differ from Python defaults
in ways that are visible in extracted output bytes.  Everything in this
module mirrors ECMAScript semantics explicitly (see SURVEY.md para 7.4).

Reference behaviors mirrored here:
- JS WhiteSpace+LineTerminator class (used by ``String.prototype.trim``
  and the ``\\s`` regex class): TAB VT FF SP NBSP ZWNBSP, Unicode Zs,
  LF CR LS PS.
- ``REGEXPS.normalize`` = ``/\\s{2,}/g`` (reference src/constants.ts:33).
- ``REGEXPS.commas`` split counting (reference src/constants.ts:30).
"""

from __future__ import annotations

import re

# ECMAScript WhiteSpace (+LineTerminator) set: what JS `\\s` and trim() use.
JS_WS_CHARS = (
    "\t\n\x0b\x0c\r \u00a0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000\ufeff"
)
_JS_WS_CLASS = "[" + JS_WS_CHARS + "]"

JS_TRIM_RE = re.compile("^" + _JS_WS_CLASS + "+|" + _JS_WS_CLASS + "+$")
JS_NORMALIZE_RE = re.compile(_JS_WS_CLASS + "{2,}")  # /\\s{2,}/g
JS_WS_RE = re.compile(_JS_WS_CLASS)
JS_WS_END_RE = re.compile(_JS_WS_CLASS + "$")  # /\\s$/
JS_WS_START_RE = re.compile("^" + _JS_WS_CLASS)  # /^\\s/
JS_WS_SET = frozenset(JS_WS_CHARS)  # O(1) membership for /\\s$/ checks

# Commas as used in Latin, Sindhi, Chinese and various other scripts
# (reference src/constants.ts:30).
COMMAS_RE = re.compile("[\u002c\u060c\ufe50\ufe10\ufe11\u2e41\u2e34\u2e32\uff0c]")


def js_trim(s: str) -> str:
    """``String.prototype.trim`` (JS whitespace class, not Python's).

    ``str.strip(chars)`` removes leading/trailing characters from the
    set — identical semantics to the anchored regex, at C speed.
    """
    return s.strip(JS_WS_CHARS)


def js_normalize_spaces(s: str) -> str:
    """``text.replace(REGEXPS.normalize, " ")``."""
    return JS_NORMALIZE_RE.sub(" ", s)


def split_count(regex: re.Pattern, s: str) -> int:
    """``s.split(regex).length`` for a /g regex: number of split parts."""
    return len(regex.split(s))


def js_len(s: str) -> int:
    """``String.prototype.length`` — UTF-16 code units, not code points."""
    if s.isascii():
        return len(s)
    return len(s.encode("utf-16-le")) // 2


def js_substring(s: str, start: int, end: int | None = None) -> str:
    """``String.prototype.substring`` with UTF-16 indices."""
    if s.isascii() or len(s) == js_len(s):
        return s[start:end]
    units = s.encode("utf-16-le")
    sliced = units[start * 2: None if end is None else end * 2]
    return sliced.decode("utf-16-le", errors="ignore")


def js_parse_float(s: str) -> float:
    """``parseFloat`` — leading-prefix parse, NaN on failure."""
    import re as _re
    m = _re.match(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s.strip())
    if not m:
        return float("nan")
    return float(m.group(0))


def js_num_to_str(v) -> str:
    """JS Number → string (integers without decimal point)."""
    import math as _math
    if isinstance(v, float):
        if _math.isnan(v):
            return "NaN"
        if _math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    return str(v)
