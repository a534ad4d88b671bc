"""ARIA node construction (reference src/nav/aria.ts).

AriaNodes are plain dicts so that the TS object-spread / delete /
``!== undefined`` semantics in the compression pass translate directly
(key presence == defined).  Keys: type, role, name, level, checked,
selected, expanded, disabled, required, valuemin, valuemax, valuetext,
children, el (the original VElement — the WeakRef equivalent).
"""

from __future__ import annotations

from .jsstr import js_len, js_parse_float, js_substring
from .vdom import (
    ELEMENT, VElement, get_attribute, get_inner_text, is_probably_visible,
)

_IMPLICIT_ROLES = {
    "article": "article", "aside": "complementary", "body": "generic",
    "button": "button", "footer": "contentinfo", "form": "form",
    "h1": "heading", "h2": "heading", "h3": "heading", "h4": "heading",
    "h5": "heading", "h6": "heading", "header": "banner", "img": "img",
    "li": "listitem", "main": "main", "nav": "navigation", "ol": "list",
    "option": "option", "progress": "progressbar", "section": "region",
    "select": "combobox", "table": "table", "textarea": "textbox",
    "ul": "list",
}

_INPUT_TYPE_ROLES = {
    "checkbox": "checkbox", "radio": "radio", "button": "button",
    "search": "searchbox",
}

# roles that map 1:1 onto AriaNodeType (reference src/nav/aria.ts:138-180)
_ROLE_TO_TYPE = frozenset([
    "banner", "complementary", "contentinfo", "form", "main", "navigation",
    "region", "search", "article", "button", "cell", "checkbox",
    "columnheader", "combobox", "dialog", "figure", "grid", "gridcell",
    "heading", "img", "link", "list", "listitem", "menuitem", "option",
    "progressbar", "radio", "radiogroup", "row", "rowgroup", "rowheader",
    "searchbox", "separator", "slider", "spinbutton", "switch", "tab",
    "table", "tablist", "tabpanel", "textbox",
])

_NAME_FROM_CONTENT = frozenset(
    ["a", "button", "h1", "h2", "h3", "h4", "h5", "h6", "label", "li"])

import re as _re

_HEADING_RE = _re.compile(r"h([1-6])", _re.I)


def get_aria_role(element: VElement) -> str:
    """reference src/nav/aria.ts:16-72."""
    explicit = get_attribute(element, "role")
    if explicit:
        return explicit.lower()
    tag = element.tag
    if tag == "a":
        return "link" if element.attrs.get("href") else "generic"
    if tag == "input":
        input_type = (element.attrs.get("type") or "text").lower()
        return _INPUT_TYPE_ROLES.get(input_type, "textbox")
    return _IMPLICIT_ROLES.get(tag, "generic")


def get_accessible_name(element: VElement) -> str | None:
    """reference src/nav/aria.ts:78-129."""
    aria_label = get_attribute(element, "aria-label")
    if aria_label:
        return aria_label
    alt = get_attribute(element, "alt")
    if alt and element.tag == "img":
        return alt
    title = get_attribute(element, "title")
    if title:
        return title
    if element.tag in _NAME_FROM_CONTENT:
        text = get_inner_text(element)
        if text:
            if js_len(text) > 50:
                return js_substring(text, 0, 47) + "..."
            return text
    if element.tag in ("p", "div"):
        text = get_inner_text(element)
        if text and js_len(text) < 100:
            return text
    return None


def get_aria_node_type(element: VElement) -> str:
    """reference src/nav/aria.ts:134-188.

    NOTE: the reference's "text" branch checks ``child.type === "text"``
    — a property that does not exist on VNode (it is ``nodeType``) — so
    it NEVER fires; generic elements stay "generic".  Mirrored by
    omission.
    """
    role = get_aria_role(element)
    return role if role in _ROLE_TO_TYPE else "generic"


def build_aria_node(element: VElement) -> dict:
    """reference src/nav/aria.ts:193-296."""
    node_type = get_aria_node_type(element)
    name = get_accessible_name(element)
    role = get_aria_role(element)

    node: dict = {"type": node_type, "role": role, "el": element}
    if name:
        node["name"] = name

    if node_type == "heading":
        # /h([1-6])/i searched anywhere in the tag name (aria.ts:212)
        match = _HEADING_RE.search(element.tag)
        if match:
            node["level"] = int(match.group(1))

    attrs = element.attrs
    if node_type in ("checkbox", "radio"):
        node["checked"] = ("checked" in attrs
                           or get_attribute(element, "aria-checked") == "true")
    if node_type in ("option", "tab"):
        node["selected"] = ("selected" in attrs
                            or get_attribute(element, "aria-selected") == "true")
    if get_attribute(element, "aria-expanded") is not None:
        node["expanded"] = get_attribute(element, "aria-expanded") == "true"
    if "disabled" in attrs or get_attribute(element, "aria-disabled") == "true":
        node["disabled"] = True
    if "required" in attrs or get_attribute(element, "aria-required") == "true":
        node["required"] = True

    valuemin = get_attribute(element, "aria-valuemin") or attrs.get("min")
    if valuemin:
        node["valuemin"] = js_parse_float(valuemin)
    valuemax = get_attribute(element, "aria-valuemax") or attrs.get("max")
    if valuemax:
        node["valuemax"] = js_parse_float(valuemax)
    valuetext = get_attribute(element, "aria-valuetext") or attrs.get("value")
    if valuetext:
        node["valuetext"] = valuetext

    child_nodes: list[dict] = []
    for child in element.children:
        if child.nodeType != ELEMENT:
            continue
        if not is_probably_visible(child):
            continue
        child_node = build_aria_node(child)
        if (child_node.get("name")
                or child_node["type"] != "generic"
                or child_node.get("children")):
            child_nodes.append(child_node)
    if child_nodes:
        node["children"] = child_nodes
    return node


def count_aria_nodes(node: dict) -> int:
    """reference src/nav/readableAria.ts:344-352."""
    count = 1
    for child in node.get("children") or ():
        count += count_aria_nodes(child)
    return count


def extract_text_from_aria_node(node: dict, include_newlines: bool = False) -> str:
    """reference src/aria/utils.ts:13-30."""
    text = ""
    if node.get("name"):
        text += node["name"]
        if include_newlines:
            text += "\n"
    for child in node.get("children") or ():
        text += extract_text_from_aria_node(child, include_newlines)
    return text
