"""GFM Markdown renderer (reference src/format/markdown.ts).

Byte-level notes (verified against the raw TS source):
- ``escapeMarkdown``'s "entity decoding" replacement chain consists of
  decoded literals — ``&``→``&`` etc. are identity replaces; only
  ``&#039;``→``'`` and ``&nbsp;``→`` `` transform — then
  ``([*_`\\[\\]\\\\])`` is backslash-escaped.
- the join spacer (markdown.ts:27-56) adds a single space between parts
  only when neither side touches whitespace and the next part doesn't
  start with ``.,!?;:)``  — this interacts with the parser emitting
  separate text nodes around entities.
"""

from __future__ import annotations

import re

from .jsstr import JS_WS_SET, js_trim
from .vdom import ELEMENT, TEXT

_ESCAPE_RE = re.compile(r"([*_`\[\]\\])")
_SPACE_TAB_RE = re.compile(r"[ \t]+")
_PUNCT = frozenset(".,!?;:)")
_BACKTICK_RUN_RE = re.compile(r"`+")
_ONLY_BACKTICKS_RE = re.compile(r"^`+$")
_LANG_RE = re.compile(r"language-([a-zA-Z0-9_-]+)")
_NL_RUN_RE = re.compile(r"\n+")
_TRAILING_NL_RE = re.compile(r"\n+$")
_MD_BLOCKS_RE = re.compile(r"\n{3,}")

# JS \s class for the pre-block edge cleanup (markdown.ts:215)
from .jsstr import JS_WS_CHARS
_PRE_EDGE_RE = re.compile(
    "^[" + JS_WS_CHARS + "]*\n|[" + JS_WS_CHARS + "]+$")

_BLOCK_TAGS = frozenset([
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "pre",
    "blockquote", "hr", "table", "div",
])
_INLINE_TAGS = frozenset(
    ["a", "strong", "b", "em", "i", "code", "img", "br", "span"])

_IGNORED_TAGS = frozenset([
    "script", "style", "nav", "aside", "header", "footer", "form", "button",
    "iframe", "object", "embed", "applet", "link", "meta", "title", "svg",
])

_HEADING_PREFIX = {"h1": "#", "h2": "##", "h3": "###",
                   "h4": "####", "h5": "#####", "h6": "######"}


def escape_markdown(text: str) -> str:
    """reference src/format/markdown.ts:9-20."""
    decoded = text.replace("&#039;", "'").replace("&nbsp;", " ")
    return _ESCAPE_RE.sub(r"\\\1", decoded)


def join_markdown_parts(parts: list[str]) -> str:
    """reference src/format/markdown.ts:27-56."""
    result = ""
    for part in parts:
        if not part or js_trim(part) == "":
            continue
        if result == "":
            result = part
        else:
            # /\s$/ and /^\s/ are single-char-class tests: O(1)
            # membership instead of re.search scanning the whole
            # accumulated string (which made long paragraphs O(n^2))
            ends_ws = result[-1] in JS_WS_SET
            starts_ws = part[0] in JS_WS_SET
            if not ends_ws and not starts_ws:
                if part[0] not in _PUNCT:
                    result += " "
            result += part
    return result


def _get_all_text_content(node) -> str:
    """reference src/format/markdown.ts:192-203."""
    if node.nodeType == TEXT:
        return node.text
    return "".join(_get_all_text_content(c) for c in node.children)


def convert_node(node, parent_tag: str | None = None, depth: int = 0,
                 is_first_child: bool = False) -> str:
    """reference src/format/markdown.ts:66-438."""
    if node.nodeType == TEXT:
        if parent_tag in ("pre", "code"):
            return node.text
        text = _SPACE_TAB_RE.sub(" ", node.text)
        if not text:
            return ""
        return escape_markdown(text)

    element = node
    tag = element.tag
    is_block = tag in _BLOCK_TAGS

    children_results: list[str] = []
    child_depth = depth + 1 if tag in ("ul", "ol", "blockquote") else depth
    for index, child in enumerate(element.children):
        children_results.append(
            convert_node(child, tag, child_depth, index == 0))

    children_markdown = join_markdown_parts(children_results)
    trimmed_children = js_trim(children_markdown)

    if tag in _HEADING_PREFIX:
        return f"{_HEADING_PREFIX[tag]} {trimmed_children}\n\n"

    if tag == "p":
        if not trimmed_children:
            return ""
        return f"{trimmed_children}\n\n"

    if tag in ("strong", "b"):
        return f"**{children_markdown}**"
    if tag in ("em", "i"):
        return f"*{children_markdown}*"

    if tag == "code":
        if parent_tag != "pre":
            code_content = children_markdown
            sequences = _BACKTICK_RUN_RE.findall(code_content)
            longest = max((len(s) for s in sequences), default=0)
            delimiter = "`" * (longest + 1)
            if _ONLY_BACKTICKS_RE.match(code_content) \
                    and len(code_content) >= len(delimiter):
                delimiter = "`" * (len(code_content) + 1)
            starts_or_ends = (code_content.startswith("`")
                              or code_content.endswith("`"))
            only_backticks = bool(_ONLY_BACKTICKS_RE.match(code_content))
            empty_or_ws = not js_trim(code_content)
            needs_padding = starts_or_ends or only_backticks or empty_or_ws
            final_content = f" {code_content} " if needs_padding else code_content
            return f"{delimiter}{final_content}{delimiter}"
        return children_markdown

    if tag == "pre":
        code_child = next(
            (c for c in element.children
             if c.nodeType == ELEMENT and c.tag == "code"), None)
        raw = _get_all_text_content(code_child or element)
        lang = ""
        class_attr = (code_child.attrs.get("class", "")
                      if code_child is not None else "")
        match = _LANG_RE.search(class_attr)
        if match:
            lang = match.group(1)
        cleaned = _PRE_EDGE_RE.sub("", raw)
        if lang in ("markdown", "md"):
            return f"````{lang}\n{cleaned}\n````"
        return f"```{lang}\n{cleaned}\n```"

    if tag == "blockquote":
        content = js_trim(children_markdown)
        if not content:
            return ""
        lines = content.split("\n")
        quoted = [">" if js_trim(line) == "" else f"> {line}" for line in lines]
        return "\n".join(quoted) + "\n\n"

    if tag in ("ul", "ol"):
        list_items = []
        li_children = [c for c in element.children
                       if c.nodeType == ELEMENT and c.tag == "li"]
        for index, child in enumerate(li_children):
            item = convert_node(child, tag, depth + 1, index == 0)
            if js_trim(item) != "":
                list_items.append(item)
        if not list_items:
            return ""
        list_content = "\n".join(list_items)
        list_indent = "  " * max(0, depth - 1)
        if list_indent:
            list_content = "\n".join(
                f"{list_indent}{line}" if js_trim(line) else line
                for line in list_content.split("\n"))
        return list_content + "\n\n"

    if tag == "li":
        marker = "1." if parent_tag == "ol" else "-"
        main_parts: list[str] = []
        nested_parts: list[str] = []
        for child in element.children:
            if child.nodeType == ELEMENT and child.tag in ("ul", "ol"):
                nested = convert_node(child, tag, depth + 1)
                if nested:
                    nested_parts.append(_TRAILING_NL_RE.sub("", nested))
            else:
                main_parts.append(convert_node(child, tag, depth))
        main_content = js_trim(join_markdown_parts(main_parts))
        result = f"{marker} {main_content}"
        if nested_parts:
            if main_content:
                result += "\n"
            result += "\n".join(nested_parts)
        return result

    if tag == "a":
        href = element.attrs.get("href", "")
        link_content = js_trim(_NL_RUN_RE.sub(" ", children_markdown))
        if (len(element.children) == 1
                and element.children[0].nodeType == ELEMENT
                and element.children[0].tag == "img"):
            img = element.children[0]
            alt = img.attrs.get("alt", "")
            src = img.attrs.get("src", "")
            display = alt if js_trim(alt) else src
            return f"[{display}]({href})"
        return f"[{link_content}]({href})"

    if tag == "img":
        alt = escape_markdown(element.attrs.get("alt", ""))
        src = element.attrs.get("src", "")
        title_attr = element.attrs.get("title")
        title = f' "{escape_markdown(title_attr)}"' if title_attr else ""
        if parent_tag == "a":
            return alt if js_trim(alt) else src
        return f"![{alt}]({src}{title})"

    if tag == "hr":
        return "---\n\n"
    if tag == "br":
        return "  \n"

    if tag == "table":
        return _convert_table(element, depth)

    if tag in _IGNORED_TAGS:
        return ""

    if is_block:
        trimmed = js_trim(children_markdown)
        return f"{trimmed}\n\n" if trimmed else ""
    return children_markdown


def _convert_table(element, depth: int) -> str:
    """reference src/format/markdown.ts:338-402."""
    header_row: list[str] = []
    body_rows: list[list[str]] = []
    max_columns = 0

    thead = next((c for c in element.children
                  if c.nodeType == ELEMENT and c.tag == "thead"), None)
    tbody = next((c for c in element.children
                  if c.nodeType == ELEMENT and c.tag == "tbody"), None)

    def process_cell(cell) -> str:
        return js_trim(convert_node(cell, cell.tag, depth + 1))

    if thead is not None:
        header_tr = next((c for c in thead.children
                          if c.nodeType == ELEMENT and c.tag == "tr"), None)
        if header_tr is not None:
            header_row = [process_cell(c) for c in header_tr.children
                          if c.nodeType == ELEMENT and c.tag == "th"]
            max_columns = max(max_columns, len(header_row))

    rows_container = tbody if tbody is not None else element
    for tr in rows_container.children:
        if tr.nodeType != ELEMENT or tr.tag != "tr":
            continue
        row = [process_cell(c) for c in tr.children
               if c.nodeType == ELEMENT and c.tag in ("td", "th")]
        body_rows.append(row)
        max_columns = max(max_columns, len(row))

    table_md = ""
    separator = " | ".join(["---"] * max_columns)
    if header_row:
        header_row = header_row + [""] * (max_columns - len(header_row))
        table_md += f"| {' | '.join(header_row)} |\n"
        table_md += f"| {separator} |\n"
    elif body_rows and max_columns > 0:
        table_md += f"| {separator} |\n"
    for row in body_rows:
        row = row + [""] * (max_columns - len(row))
        table_md += f"| {' | '.join(row)} |\n"
    return f"{js_trim(table_md)}\n\n" if table_md else ""


def to_markdown(element) -> str:
    """reference src/format/markdown.ts:445-465."""
    if element is None:
        return ""
    markdown = convert_node(element, None, 0, True)
    markdown = js_trim(markdown)
    return _MD_BLOCKS_RE.sub("\n\n", markdown)
