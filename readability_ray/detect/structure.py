"""Page-structure analysis entry (reference src/detect/index.ts)."""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass, field

from ..parser import parse_html
from ..readable_aria import build_aria_tree
from .header import HeaderInfo, detect_headers
from .navigation import NavigationInfo, detect_navigations

_SIDEBAR_RE = re.compile(r"\b(sidebar|aside)\b", re.I)
_FOOTER_RE = re.compile(r"\bfooter\b", re.I)


@dataclass
class PageStructure:
    headers: list[HeaderInfo] = field(default_factory=list)
    navigations: list[NavigationInfo] = field(default_factory=list)
    main_header: HeaderInfo | None = None
    main_navigation: NavigationInfo | None = None
    breadcrumb: NavigationInfo | None = None
    toc: NavigationInfo | None = None
    main_content: dict | None = None
    sidebar: dict | None = None
    footer: dict | None = None


def analyze_page_structure(html: str, extract_content: bool = False,
                           max_navigations: int = 10,
                           header_navigation_only: bool = False,
                           doc_mode: bool = False) -> PageStructure:
    """reference src/detect/index.ts:44-112.

    NOTE two-phase rule: re-parses the ORIGINAL html (no preprocessing),
    uncompressed ARIA tree.
    """
    return analyze_page_structure_from_tree(
        raw_aria_tree(html), extract_content=extract_content,
        max_navigations=max_navigations,
        header_navigation_only=header_navigation_only, doc_mode=doc_mode)


def raw_aria_tree(html: str) -> dict:
    """Parse the ORIGINAL html (no preprocessing) and build the
    uncompressed ARIA tree the detect/ analyses operate on.  Exposed so
    batch stages can parse once and feed every analysis
    (analyze_page_structure / analyze_document_structure /
    extract_document_content) from the same tree — the detect passes
    only read the tree."""
    from ..vdom import ensure_recursion_headroom
    ensure_recursion_headroom()
    doc = parse_html(html)
    return build_aria_tree(doc, compress=False)


def analyze_page_structure_from_tree(aria_tree: dict,
                                     extract_content: bool = False,
                                     max_navigations: int = 10,
                                     header_navigation_only: bool = False,
                                     doc_mode: bool = False
                                     ) -> PageStructure:
    """Tree-based core of analyze_page_structure (read-only over the
    uncompressed ARIA tree from raw_aria_tree)."""
    root = aria_tree["root"]

    headers = detect_headers(root)
    navigations = detect_navigations(root)

    if header_navigation_only:
        navigations = [n for n in navigations if n.location == "header"]

    effective_max = max_navigations
    if doc_mode:
        sidebar = find_sidebar(root)
        if sidebar is not None:
            navigations = detect_navigations(sidebar) + navigations
        effective_max = max_navigations * 2

    if len(navigations) > effective_max:
        navigations = prioritize_navigations(
            navigations, doc_mode)[:effective_max]

    main_header = next((h for h in headers if h.type == "main"), None)
    main_navigation = next((n for n in navigations if n.type == "global"),
                           None)
    breadcrumb = next((n for n in navigations if n.type == "breadcrumb"),
                      None)
    toc = next((n for n in navigations if n.type == "toc"), None)

    return PageStructure(
        headers=headers, navigations=navigations, main_header=main_header,
        main_navigation=main_navigation, breadcrumb=breadcrumb, toc=toc,
        main_content=find_main_content(root), sidebar=find_sidebar(root),
        footer=find_footer(root))


def prioritize_navigations(navigations: list[NavigationInfo],
                           doc_mode: bool = False) -> list[NavigationInfo]:
    """reference src/detect/index.ts:117-165 (JS comparator semantics)."""
    priority_map = ({
        "toc": 10, "local": 9, "global": 8, "breadcrumb": 7, "utility": 6,
        "pagination": 5, "footer": 4, "social": 3,
    } if doc_mode else {
        "global": 10, "breadcrumb": 9, "toc": 8, "local": 7, "utility": 6,
        "pagination": 5, "footer": 4, "social": 3,
    })

    def cmp(a: NavigationInfo, b: NavigationInfo) -> int:
        pa = priority_map.get(a.type, 0)
        pb = priority_map.get(b.type, 0)
        if doc_mode:
            a_side = a.location == "sidebar"
            b_side = b.location == "sidebar"
            if a_side and not b_side:
                return -1
            if not a_side and b_side:
                return 1
        if pa == pb:
            return len(b.items) - len(a.items)
        return pb - pa

    return sorted(navigations, key=functools.cmp_to_key(cmp))


def _find_by(root: dict, predicate) -> dict | None:
    if predicate(root):
        return root
    for child in root.get("children") or ():
        hit = _find_by(child, predicate)
        if hit is not None:
            return hit
    return None


def find_main_content(root: dict) -> dict | None:
    """reference src/detect/index.ts:170-210 (main → article fallback)."""
    def is_main(node):
        element = node.get("el")
        return element is not None and (
            element.tag == "main" or element.attrs.get("role") == "main")

    main = _find_by(root, is_main)
    if main is not None:
        return main

    def is_article(node):
        element = node.get("el")
        return element is not None and element.tag == "article"

    return _find_by(root, is_article)


def find_sidebar(root: dict) -> dict | None:
    """reference src/detect/index.ts:215-239."""
    def is_sidebar(node):
        element = node.get("el")
        return element is not None and (
            element.tag == "aside"
            or element.attrs.get("role") == "complementary"
            or bool(_SIDEBAR_RE.search(element.class_name or "")))

    return _find_by(root, is_sidebar)


def find_footer(root: dict) -> dict | None:
    """reference src/detect/index.ts:244-268 (class match only near
    top level, depth ≤ 2)."""
    def find(node: dict, depth: int = 0):
        element = node.get("el")
        if element is not None and (
                element.tag == "footer"
                or element.attrs.get("role") == "contentinfo"):
            return node
        if depth <= 2 and element is not None and \
                _FOOTER_RE.search(element.class_name or ""):
            return node
        for child in node.get("children") or ():
            hit = find(child, depth + 1)
            if hit is not None:
                return hit
        return None

    return find(root)
