"""HTML entity decoding with htmlparser2/WHATWG semantics.

The reference parses HTML via htmlparser2 v10 with ``decodeEntities``
on (its default), which uses the `entities` package implementing the
WHATWG character-reference algorithm.  Two behaviors matter for
byte-identity (reference src/parsers/htmlparser2.ts:35-129):

1. **Text mode** ("legacy"): named references decode with a trailing
   ``;`` always, and without ``;`` only for the legacy set; each decoded
   reference is emitted as a *separate* ``ontext`` event, so
   ``a&amp;b`` produces THREE text nodes ("a", "&", "b").  That split is
   visible in markdown join spacing (reference src/format/markdown.ts:27-56),
   so ``decode_text_segments`` returns a segment list, one entry per
   decoded reference, literals merged.
2. **Attribute mode**: same, plus a legacy (no-``;``) match is NOT
   decoded when followed by ``=`` or an ASCII alphanumeric.

Numeric references follow the WHATWG replacement table (C1 controls →
Windows-1252, surrogates/overflow → U+FFFD).

The named-reference table is Python's stdlib ``html.entities.html5``
(same WHATWG table; keys without ``;`` are exactly the legacy set).
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5

# WHATWG numeric character reference replacements (C1 → Windows-1252 etc.)
_NUMERIC_REPLACEMENTS = {
    0x00: 0xFFFD, 0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E,
    0x85: 0x2026, 0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030,
    0x8A: 0x0160, 0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018,
    0x92: 0x2019, 0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013,
    0x97: 0x2014, 0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A,
    0x9C: 0x0153, 0x9E: 0x017E, 0x9F: 0x0178,
}

_MAX_NAME_LEN = max(len(k) for k in _HTML5)

# Candidate reference after '&': numeric, or a name run (letters+digits).
_REF_RE = re.compile(
    r"#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[a-zA-Z][a-zA-Z0-9]*;?")

_ALNUM_EQ = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789=")


def _decode_numeric(body: str) -> str:
    if body[1] in "xX":
        num = int(body[2:].rstrip(";"), 16)
    else:
        num = int(body[1:].rstrip(";"), 10)
    num = _NUMERIC_REPLACEMENTS.get(num, num)
    if 0xD800 <= num <= 0xDFFF or num > 0x10FFFF:
        num = 0xFFFD
    return chr(num)


def _match_named(name_part: str):
    """Longest-prefix match into the WHATWG table.

    Returns (decoded, consumed_chars) or None.  ``name_part`` may end
    with ';'.  Keys without ';' in the table are the legacy set.
    """
    # Try longest first (mirrors the entities package's trie longest-match)
    limit = min(len(name_part), _MAX_NAME_LEN)
    for end in range(limit, 0, -1):
        candidate = name_part[:end]
        hit = _HTML5.get(candidate)
        if hit is not None:
            return hit, end
    return None


def _decode_ref(body: str, in_attribute: bool, following: str):
    """Decode one candidate reference body (without '&').

    Returns (decoded_string, consumed_including_amp) or None if the
    run is not a valid reference (stays literal).
    """
    if body.startswith("#"):
        stripped = body
        if len(body.rstrip(";")) <= 1 or (body[1] in "xX" and len(body.rstrip(";")) <= 2):
            return None  # "&#" / "&#x" with no digits
        return _decode_numeric(stripped), 1 + len(body)
    hit = _match_named(body)
    if hit is None:
        return None
    decoded, consumed = hit
    matched = body[:consumed]
    if not matched.endswith(";"):
        if in_attribute:
            nxt = body[consumed:consumed + 1] or following[:1]
            if nxt and nxt in _ALNUM_EQ:
                return None  # attribute rule: &name followed by [=a-zA-Z0-9]
    return decoded, 1 + consumed


def decode_text_segments(s: str) -> list[str]:
    """Decode entities in text/RCDATA, one segment per emitted event.

    Literal runs (including failed references) merge into single
    segments; each decoded reference yields one segment PER CODEPOINT
    (htmlparser2 emits ``ontextentity`` per code point).
    """
    if "&" not in s:
        return [s] if s else []
    segments: list[str] = []
    buf: list[str] = []
    pos = 0
    n = len(s)
    while True:
        amp = s.find("&", pos)
        if amp == -1:
            buf.append(s[pos:])
            break
        buf.append(s[pos:amp])
        m = _REF_RE.match(s, amp + 1)
        result = None
        if m:
            result = _decode_ref(m.group(0), False, "")
        if result is None:
            buf.append("&")
            pos = amp + 1
            continue
        decoded, consumed = result
        literal = "".join(buf)
        if literal:
            segments.append(literal)
        buf = []
        # one event per code point
        segments.extend(decoded)
        pos = amp + consumed
        if pos >= n:
            break
    literal = "".join(buf)
    if literal:
        segments.append(literal)
    return segments


def decode_attribute(s: str) -> str:
    """Decode entities in an attribute value (attribute-mode rules)."""
    if "&" not in s:
        return s
    out: list[str] = []
    pos = 0
    while True:
        amp = s.find("&", pos)
        if amp == -1:
            out.append(s[pos:])
            break
        out.append(s[pos:amp])
        m = _REF_RE.match(s, amp + 1)
        result = None
        if m:
            result = _decode_ref(m.group(0), True, s[m.end():])
        if result is None:
            out.append("&")
            pos = amp + 1
            continue
        decoded, consumed = result
        out.append(decoded)
        pos = amp + consumed
        if pos >= len(s):
            break
    return "".join(out)
