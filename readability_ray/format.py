"""Output formatters: cleaned HTML, plain text, node count.

Re-derivation of reference src/format/format.ts.  ``stringify`` +
``format_document`` produce the `extracted_text` column — the
byte-identical invariant target (BASELINE.json input_hint).
"""

from __future__ import annotations

import re

from .vdom import ELEMENT, TEXT
from .jsstr import js_trim

# Self-closing tags (reference src/format/format.ts:35-50)
_SELF_CLOSING = frozenset([
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
])

# Block elements (reference src/format/format.ts:102-136)
BLOCK_ELEMENTS = frozenset([
    "address", "article", "aside", "blockquote", "details", "dialog", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "li",
    "main", "nav", "ol", "p", "pre", "section", "table", "ul",
])

_NEWLINES_RE = re.compile(r"\n{2,}")
_LEADING_NL_RE = re.compile(r"^\n+")
_TRAILING_NL_RE = re.compile(r"\n+$")


def escape_html(s: str) -> str:
    """reference src/format/format.ts:89-97.

    The reference's replacement strings are themselves decoded literals
    (verified byte-level against the source): ``&``→``&``, ``<``→``<``,
    ``>``→``>``, ``"``→``"`` are identity replaces; only NBSP→``&nbsp;``
    and ``'``→``&#039;`` actually transform.
    """
    return s.replace("\xa0", "&nbsp;").replace("'", "&#039;")


def to_html(element) -> str:
    """Cleaned HTML: span tags unwrapped, class attributes dropped
    (reference src/format/format.ts:15-81)."""
    if element is None:
        return ""
    if element.nodeType == TEXT:
        return escape_html(element.text)
    tag = element.tag
    if tag == "span":
        return "".join(
            escape_html(c.text) if c.nodeType == TEXT else to_html(c)
            for c in element.children)
    attrs = " ".join(
        f'{k}="{escape_html(v)}"' for k, v in element.attrs.items()
        if k != "class")
    if tag in _SELF_CLOSING and not element.children:
        return f"<{tag} {attrs}/>" if attrs else f"<{tag}/>"
    start_tag = f"<{tag} {attrs}>" if attrs else f"<{tag}>"
    child_content = "".join(
        escape_html(c.text) if c.nodeType == TEXT else to_html(c)
        for c in element.children)
    return f"{start_tag}{child_content}</{tag}>"


def stringify(element) -> str:
    """Readable plain text (reference src/format/format.ts:147-194):
    block elements add newlines, text nodes are trimmed and joined with
    a trailing space, one trailing space removed per element, and
    consecutive newlines merged at every level."""
    if element is None:
        return ""
    tag = element.tag
    if tag == "br":
        return "\n"
    if tag == "hr":
        return "\n----------\n"
    is_block = tag in BLOCK_ELEMENTS
    parts: list[str] = []
    if is_block:
        parts.append("\n")
    for child in element.children:
        if child.nodeType == TEXT:
            text = js_trim(child.text)
            if text:
                parts.append(text + " ")
        else:
            parts.append(stringify(child))
    result = "".join(parts)
    if result.endswith(" "):
        result = result[:-1]  # /  $/ — exactly one trailing space
    if is_block:
        result += "\n"
    return _NEWLINES_RE.sub("\n", result)


def format_document(text: str) -> str:
    """reference src/format/format.ts:203-209."""
    text = _NEWLINES_RE.sub("\n", text)
    text = _LEADING_NL_RE.sub("", text)
    text = _TRAILING_NL_RE.sub("", text)
    return js_trim(text)


def extract_text_content(element) -> str:
    """Raw concatenated text, no normalization
    (reference src/format/format.ts:217-229)."""
    if element is None:
        return ""
    out: list[str] = []
    stack = list(reversed(element.children))
    while stack:
        node = stack.pop()
        if node.nodeType == TEXT:
            out.append(node.text)
        else:
            stack.extend(reversed(node.children))
    return "".join(out)


def count_nodes(element) -> int:
    """Subtree node count, text nodes count 1
    (reference src/format/format.ts:237-254)."""
    if element is None:
        return 0
    count = 0
    stack = [element]
    while stack:
        node = stack.pop()
        count += 1
        if node.nodeType == ELEMENT:
            stack.extend(node.children)
    return count
