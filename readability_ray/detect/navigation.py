"""Navigation detection (reference src/detect/navigation.ts).

Operates on the UNCOMPRESSED ARIA tree (dict nodes with "el" pointing
back to the VElement).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..aria import extract_text_from_aria_node, get_accessible_name
from ..jsstr import js_trim

NAV_CLASS_RE = re.compile(r"\b(nav|menu|navigation)\b", re.I)
_HEADER_CLASS_RE = re.compile(r"\bheader\b", re.I)
_FOOTER_CLASS_RE = re.compile(r"\bfooter\b", re.I)
_SIDEBAR_CLASS_RE = re.compile(r"\b(sidebar|aside)\b", re.I)
_CURRENT_RE = re.compile(r"\b(current|active)\b", re.I)
_ACTIVE_RE = re.compile(r"\bactive\b", re.I)
_DROPDOWN_RE = re.compile(r"\b(dropdown|submenu|mega-?menu)\b", re.I)
_TABS_RE = re.compile(r"\b(tabs?|tab-?list)\b", re.I)
_DIGITS_RE = re.compile(r"^\d+$")

_SOCIAL_PATTERNS = [re.compile(p, re.I) for p in (
    "facebook", "twitter", "linkedin", "instagram", "youtube", "github",
    "pinterest", "tiktok")]

_UTILITY_KEYWORDS = ("login", "logout", "sign in", "sign out", "register",
                     "account", "profile", "settings", "help", "contact")

_PAGINATION_KEYWORDS = ("previous", "prev", "next", "first", "last")


@dataclass
class NavigationItem:
    label: str
    href: str | None = None
    level: int = 0
    children: list | None = None
    is_current: bool | None = None
    is_active: bool | None = None


@dataclass
class NavigationInfo:
    element: dict
    type: str            # global|local|breadcrumb|pagination|toc|social|footer|utility
    location: str        # header|sidebar|footer|inline
    items: list[NavigationItem] = field(default_factory=list)
    structure: str = "flat"   # flat|nested|dropdown|tabs
    label: str | None = None


def _el(node: dict):
    return node.get("el")


def detect_navigations(root: dict) -> list[NavigationInfo]:
    """reference src/detect/navigation.ts:40-63."""
    navigations: list[NavigationInfo] = []

    def traverse(node: dict, ancestors: list):
        if _is_navigation_element(node):
            info = _analyze_navigation(node, ancestors)
            if info is not None:
                navigations.append(info)
        for child in node.get("children") or ():
            traverse(child, ancestors + [node])

    traverse(root, [])
    return navigations


def _analyze_navigation(node: dict, ancestors: list) -> NavigationInfo | None:
    items = _extract_navigation_items(node)
    if not items:
        return None
    nav_type = _classify_navigation_type(node, items, ancestors)
    location = _determine_location(node, ancestors)
    structure = _analyze_structure(node, items)
    label = _get_navigation_label(node)
    return NavigationInfo(element=node, type=nav_type, location=location,
                          items=items, structure=structure, label=label)


def _classify_navigation_type(node: dict, items: list[NavigationItem],
                              ancestors: list) -> str:
    """reference src/detect/navigation.ts:94-159."""
    element = _el(node)
    class_name = (element.class_name or "") if element is not None else ""
    aria_label = (element.attrs.get("aria-label", "")
                  if element is not None else "")
    if ("breadcrumb" in aria_label.lower()
            or "breadcrumb" in class_name
            or _has_breadcrumb_structure(items)):
        return "breadcrumb"
    if ("pagination" in class_name or "pager" in class_name
            or _has_pagination_pattern(items)):
        return "pagination"
    if ("toc" in class_name or "table-of-contents" in class_name
            or "contents" in aria_label.lower()
            or _has_toc_pattern(items)):
        return "toc"
    if "social" in class_name or _has_social_links(items):
        return "social"
    if _is_in_footer(ancestors):
        return "footer"
    if _is_in_header(ancestors) and len(items) >= 3:
        utility_count = sum(1 for item in items
                            if _has_utility_keyword(item.label))
        if utility_count < len(items) * 0.5:
            return "global"
    if any(_has_utility_keyword(item.label) for item in items):
        return "utility"
    return "local"


def _determine_location(node: dict, ancestors: list) -> str:
    if _is_in_header(ancestors):
        return "header"
    if _is_in_footer(ancestors):
        return "footer"
    if _is_in_sidebar(ancestors):
        return "sidebar"
    return "inline"


def _analyze_structure(node: dict, items: list[NavigationItem]) -> str:
    has_nested = any(item.children for item in items)
    element = _el(node)
    if has_nested:
        if element is not None and _DROPDOWN_RE.search(element.class_name or ""):
            return "dropdown"
        return "nested"
    if element is not None and (
            element.attrs.get("role") == "tablist"
            or _TABS_RE.search(element.class_name or "")):
        return "tabs"
    return "flat"


def _extract_navigation_items(node: dict) -> list[NavigationItem]:
    items: list[NavigationItem] = []
    for lst in _find_list_elements(node):
        items.extend(_extract_items_from_list(lst, 0))
    if not items:
        items.extend(_extract_direct_links(node, 0))
    return items


def _extract_items_from_list(lst: dict, level: int) -> list[NavigationItem]:
    items = []
    for child in lst.get("children") or ():
        element = _el(child)
        if element is not None and element.tag == "li":
            item = _extract_item_from_list_item(child, level)
            if item is not None:
                items.append(item)
    return items


def _extract_item_from_list_item(li: dict, level: int) -> NavigationItem | None:
    link = _find_first_link(li)
    if link is not None:
        link_element = _el(link)
        if link_element is None:
            return None
        label = get_accessible_name(link_element)
        if not label:
            return None
        item = NavigationItem(
            label=label, href=link_element.attrs.get("href"), level=level,
            is_current=_has_current(li, link), is_active=_has_active(li, link))
        child_list = _find_child_list(li)
        if child_list is not None:
            item.children = _extract_items_from_list(child_list, level + 1)
        return item
    li_element = _el(li)
    if li_element is None:
        return None
    label = get_accessible_name(li_element)
    if not label or js_trim(label) == "":
        text = extract_text_from_aria_node(li, False)
        if text and js_trim(text) != "":
            return NavigationItem(label=js_trim(text), level=level,
                                  is_current=True, is_active=True)
        return None
    return NavigationItem(label=label, level=level,
                          is_current=True, is_active=True)


def _extract_direct_links(node: dict, level: int) -> list[NavigationItem]:
    items = []
    for link in _find_all_links(node):
        element = _el(link)
        if element is not None:
            label = get_accessible_name(element)
            if label:
                items.append(NavigationItem(
                    label=label, href=element.attrs.get("href"), level=level,
                    is_current=_has_current(link, link),
                    is_active=_has_active(link, link)))
    return items


def _is_navigation_element(node: dict) -> bool:
    if node["type"] == "navigation":
        return True
    element = _el(node)
    if element is not None:
        if element.tag == "nav":
            return True
        if element.attrs.get("role") == "navigation":
            return True
        return bool(NAV_CLASS_RE.search(element.class_name or ""))
    return False


def _get_navigation_label(node: dict) -> str | None:
    element = _el(node)
    if element is not None:
        return (element.attrs.get("aria-label")
                or element.attrs.get("aria-labelledby") or None)
    return None


def _ancestor_matches(ancestors, tag, role, class_re) -> bool:
    for a in ancestors:
        element = _el(a)
        if element is not None and (
                element.tag == tag
                or element.attrs.get("role") == role
                or class_re.search(element.class_name or "")):
            return True
    return False


def _is_in_header(ancestors) -> bool:
    return _ancestor_matches(ancestors, "header", "banner", _HEADER_CLASS_RE)


def _is_in_footer(ancestors) -> bool:
    return _ancestor_matches(ancestors, "footer", "contentinfo",
                             _FOOTER_CLASS_RE)


def _is_in_sidebar(ancestors) -> bool:
    return _ancestor_matches(ancestors, "aside", "complementary",
                             _SIDEBAR_CLASS_RE)


def _has_breadcrumb_structure(items) -> bool:
    return len(items) >= 3 and any(
        item.label in (">", "/", "»") for item in items)


def _has_pagination_pattern(items) -> bool:
    labels = [item.label.lower() for item in items]
    has_numbers = any(_DIGITS_RE.match(label) for label in labels)
    has_keywords = any(
        any(kw in label for kw in _PAGINATION_KEYWORDS) for label in labels)
    return has_numbers or has_keywords


def _has_toc_pattern(items) -> bool:
    anchors = [i for i in items if i.href and i.href.startswith("#")]
    return len(anchors) > len(items) * 0.7


def _has_social_links(items) -> bool:
    count = sum(1 for item in items if any(
        p.search(item.label) or (item.href and p.search(item.href))
        for p in _SOCIAL_PATTERNS))
    return count > len(items) * 0.5


def _has_utility_keyword(label: str) -> bool:
    lower = label.lower()
    return any(kw in lower for kw in _UTILITY_KEYWORDS)


def _find_list_elements(node: dict) -> list[dict]:
    lists = []

    def traverse(n: dict):
        element = _el(n)
        if element is not None and element.tag in ("ul", "ol"):
            lists.append(n)
        for child in n.get("children") or ():
            traverse(child)

    traverse(node)
    return lists


def _find_first_link(node: dict) -> dict | None:
    element = _el(node)
    if element is not None and element.tag == "a":
        return node
    for child in node.get("children") or ():
        link = _find_first_link(child)
        if link is not None:
            return link
    return None


def _find_all_links(node: dict) -> list[dict]:
    links = []

    def traverse(n: dict):
        element = _el(n)
        if element is not None and element.tag == "a":
            links.append(n)
        for child in n.get("children") or ():
            traverse(child)

    traverse(node)
    return links


def _find_child_list(node: dict) -> dict | None:
    for child in node.get("children") or ():
        element = _el(child)
        if element is not None and element.tag in ("ul", "ol"):
            return child
    return None


def _has_current(container: dict, link: dict) -> bool:
    c = _el(container)
    l = _el(link)
    return ((c is not None and c.attrs.get("aria-current") == "page")
            or (l is not None and l.attrs.get("aria-current") == "page")
            or bool(_CURRENT_RE.search((c.class_name if c else "") or "")))


def _has_active(container: dict, link: dict) -> bool:
    c = _el(container)
    l = _el(link)
    return (bool(_ACTIVE_RE.search((c.class_name if c else "") or ""))
            or bool(_ACTIVE_RE.search((l.class_name if l else "") or "")))
