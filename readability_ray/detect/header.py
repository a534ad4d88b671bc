"""Header detection (reference src/detect/header.ts)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..aria import get_accessible_name

_HEADER_PATTERNS = [re.compile(p, re.I) for p in (
    r"\bheader\b", r"\bmasthead\b", r"\bpage-header\b", r"\bsite-header\b",
    r"\btop-bar\b")]
_STICKY_PATTERNS = [re.compile(p, re.I) for p in (
    r"\bsticky\b", r"\bfixed\b", r"\bpinned\b")]
_LOGO_PATTERNS = [re.compile(p, re.I) for p in (
    r"\blogo\b", r"\bbrand\b", r"\bsite-?icon\b")]
_LOGO_RE = re.compile(r"\blogo\b", re.I)
_TITLE_PATTERNS = [re.compile(p, re.I) for p in (
    r"\bsite-?title\b", r"\bsite-?name\b", r"\bbrand-?name\b")]
_H13_RE = re.compile(r"^h[1-3]$", re.I)
_NAV_PATTERNS = [re.compile(p, re.I) for p in (
    r"\bnav\b", r"\bmenu\b", r"\bnavigation\b")]
_SEARCH_PATTERNS = [re.compile(p, re.I) for p in (
    r"\bsearch\b", r"\bfind\b", r"\bquery\b")]


@dataclass
class LogoInfo:
    element: dict
    src: str | None = None
    alt: str | None = None
    text: str | None = None


@dataclass
class SiteTitleInfo:
    element: dict
    text: str = ""
    level: int = 0


@dataclass
class HeaderInfo:
    element: dict
    type: str = "main"   # main|article|section
    contains: dict = field(default_factory=dict)
    is_sticky: bool = False
    depth: int = 0


def _el(node: dict):
    return node.get("el")


def detect_headers(root: dict) -> list[HeaderInfo]:
    """reference src/detect/header.ts:33-58 (stable sort by depth)."""
    headers: list[HeaderInfo] = []

    def traverse(node: dict, depth: int = 0):
        if _is_header_element(node):
            headers.append(_analyze_header(node, depth))
        for child in node.get("children") or ():
            traverse(child, depth + 1)

    traverse(root)
    headers.sort(key=lambda h: h.depth)
    return headers


def _is_header_element(node: dict) -> bool:
    element = _el(node)
    if element is None:
        return False
    if element.tag == "header" or node.get("role") == "banner":
        return True
    if element.attrs.get("role") == "banner":
        return True
    class_name = element.class_name or ""
    return any(p.search(class_name) for p in _HEADER_PATTERNS)


def _analyze_header(node: dict, depth: int) -> HeaderInfo:
    info = HeaderInfo(element=node, type="main" if depth <= 2 else "section",
                      is_sticky=_is_sticky(node), depth=depth)
    for child in node.get("children") or ():
        _analyze_header_content(child, info)
    return info


def _is_sticky(node: dict) -> bool:
    element = _el(node)
    if element is None:
        return False
    class_name = element.class_name or ""
    return any(p.search(class_name) for p in _STICKY_PATTERNS)


def _analyze_header_content(node: dict, info: HeaderInfo) -> None:
    logo = detect_logo(node)
    if logo is not None and "logo" not in info.contains:
        info.contains["logo"] = logo
    site_title = detect_site_title(node)
    if site_title is not None and "siteTitle" not in info.contains:
        info.contains["siteTitle"] = site_title
    if _is_navigation_element(node):
        info.contains.setdefault("navigation", []).append(node)
    if _is_search_element(node):
        info.contains["search"] = node
    for child in node.get("children") or ():
        _analyze_header_content(child, info)


def detect_logo(node: dict) -> LogoInfo | None:
    """reference src/detect/header.ts:183-223."""
    element = _el(node)
    if element is None:
        return None
    if element.tag == "img":
        alt = element.attrs.get("alt", "")
        src = element.attrs.get("src", "")
        class_name = element.class_name or ""
        if any(p.search(alt) or p.search(class_name) or p.search(src)
               for p in _LOGO_PATTERNS):
            return LogoInfo(element=node, src=src, alt=alt)
    class_name = element.class_name or ""
    element_id = element.attrs.get("id", "")
    if _LOGO_RE.search(class_name) or _LOGO_RE.search(element_id):
        text = get_accessible_name(element)
        if text:
            return LogoInfo(element=node, text=text)
    return None


def detect_site_title(node: dict) -> SiteTitleInfo | None:
    """reference src/detect/header.ts:228-261."""
    element = _el(node)
    if element is None:
        return None
    if element.tag and _H13_RE.match(element.tag):
        text = get_accessible_name(element)
        if text:
            return SiteTitleInfo(element=node, text=text,
                                 level=int(element.tag[1]))
    class_name = element.class_name or ""
    if any(p.search(class_name) for p in _TITLE_PATTERNS):
        text = get_accessible_name(element)
        if text:
            return SiteTitleInfo(element=node, text=text, level=0)
    return None


def _is_navigation_element(node: dict) -> bool:
    element = _el(node)
    if element is None:
        return False
    if element.tag == "nav":
        return True
    if element.attrs.get("role") == "navigation":
        return True
    class_name = element.class_name or ""
    return any(p.search(class_name) for p in _NAV_PATTERNS)


def _is_search_element(node: dict) -> bool:
    element = _el(node)
    if element is None:
        return False
    if element.attrs.get("role") == "search":
        return True
    if element.tag == "form":
        class_name = element.class_name or ""
        element_id = element.attrs.get("id", "")
        action = element.attrs.get("action", "")
        return any(p.search(class_name) or p.search(element_id)
                   or p.search(action) for p in _SEARCH_PATTERNS)
    children = node.get("children")
    if children:
        for child in children:
            child_element = _el(child)
            if (child_element is not None and child_element.tag == "input"
                    and child_element.attrs.get("type") == "search"):
                return True
        return False
    return False
