"""Doc-site structure analysis (reference src/detect/document.ts)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..aria import extract_text_from_aria_node
from ..parser import parse_html
from ..readable_aria import build_aria_tree
from .navigation import NavigationInfo
from .structure import PageStructure, analyze_page_structure

_HEADING_RE = re.compile(r"^h[1-6]$")


@dataclass
class SectionInfo:
    title: str
    level: int
    id: str | None = None
    preview: str | None = None
    children: list = field(default_factory=list)


@dataclass
class DocumentStructure(PageStructure):
    sidebar_navigation: NavigationInfo | None = None
    sections: list[SectionInfo] = field(default_factory=list)
    pagination: dict | None = None


def analyze_document_structure(html: str, **options) -> DocumentStructure:
    """reference src/detect/document.ts:61-86."""
    from .structure import raw_aria_tree
    return analyze_document_structure_from_tree(raw_aria_tree(html),
                                                **options)


def analyze_document_structure_from_tree(aria_tree: dict, **options
                                         ) -> DocumentStructure:
    """Tree-based core: one raw parse/ARIA build serves the page
    structure, the section outline, and pagination."""
    from .structure import analyze_page_structure_from_tree
    base = analyze_page_structure_from_tree(aria_tree, doc_mode=True,
                                            **options)
    sidebar_navigation = next(
        (n for n in base.navigations if n.location == "sidebar"), None)
    sections = extract_sections_from_tree(aria_tree)
    pagination = _extract_pagination(base)
    return DocumentStructure(
        headers=base.headers, navigations=base.navigations,
        main_header=base.main_header, main_navigation=base.main_navigation,
        breadcrumb=base.breadcrumb, toc=base.toc,
        main_content=base.main_content, sidebar=base.sidebar,
        footer=base.footer, sidebar_navigation=sidebar_navigation,
        sections=sections, pagination=pagination)


def extract_sections(html: str) -> list[SectionInfo]:
    """Heading-stack section outline
    (reference src/detect/document.ts:91-141)."""
    doc = parse_html(html)
    aria_tree = build_aria_tree(doc, compress=False)
    return extract_sections_from_tree(aria_tree)


def extract_sections_from_tree(aria_tree: dict) -> list[SectionInfo]:
    sections: list[SectionInfo] = []
    stack: list[tuple[SectionInfo, int]] = []

    def traverse(node: dict):
        element = node.get("el")
        if element is not None and _HEADING_RE.match(element.tag):
            level = int(element.tag[1])
            title = node.get("name") or ""
            section_id = element.id or element.attrs.get("id")
            new_section = SectionInfo(title=title, level=level,
                                      id=section_id or None)
            while stack and stack[-1][1] >= level:
                stack.pop()
            if stack:
                stack[-1][0].children.append(new_section)
            else:
                sections.append(new_section)
            stack.append((new_section, level))
        for child in node.get("children") or ():
            traverse(child)

    traverse(aria_tree["root"])
    return sections


def _extract_pagination(structure: PageStructure) -> dict | None:
    """reference src/detect/document.ts:146-169."""
    nav = next((n for n in structure.navigations if n.type == "pagination"),
               None)
    if nav is None:
        return None
    pagination: dict = {}
    for item in nav.items:
        label = item.label.lower()
        if "prev" in label or "前" in label or label == "←":
            pagination["prev"] = {"label": item.label,
                                  "href": item.href or ""}
        elif "next" in label or "次" in label or label == "→":
            pagination["next"] = {"label": item.label,
                                  "href": item.href or ""}
    return pagination or None


@dataclass
class DocumentContent:
    content: str = ""
    sidebar_nav: str | None = None
    toc: str | None = None
    breadcrumb: str | None = None
    outline: str | None = None


def extract_document_content(html: str) -> DocumentContent:
    """reference src/detect/document.ts:204-236."""
    from .structure import raw_aria_tree
    return extract_document_content_from_tree(raw_aria_tree(html))


def extract_document_content_from_tree(aria_tree: dict) -> DocumentContent:
    structure = analyze_document_structure_from_tree(aria_tree)
    result = DocumentContent()
    if structure.main_content is not None:
        result.content = extract_text_from_aria_node(
            structure.main_content, True)
    if structure.sidebar_navigation is not None:
        result.sidebar_nav = _format_navigation_md(
            structure.sidebar_navigation)
    if structure.toc is not None:
        result.toc = _format_navigation_md(structure.toc)
    if structure.breadcrumb is not None:
        result.breadcrumb = " > ".join(
            item.label for item in structure.breadcrumb.items)
    if structure.sections:
        result.outline = _format_sections_md(structure.sections)
    return result


def _format_navigation_md(nav: NavigationInfo, indent: int = 0) -> str:
    """reference src/detect/document.ts:246-266 — note top-level items
    get a '**[Current]**' marker, nested items do not."""
    markdown = ""
    for item in nav.items:
        markdown += "  " * indent + "- " + item.label
        if item.href:
            markdown += f" ({item.href})"
        if item.is_current:
            markdown += " **[Current]**"
        markdown += "\n"
        if item.children:
            markdown += _format_items_md(item.children, indent + 1)
    return markdown


def _format_items_md(items, indent: int) -> str:
    markdown = ""
    for item in items:
        markdown += "  " * indent + "- " + item.label
        if item.href:
            markdown += f" ({item.href})"
        markdown += "\n"
        if item.children:
            markdown += _format_items_md(item.children, indent + 1)
    return markdown


def _format_sections_md(sections, base_level: int = 0) -> str:
    """reference src/detect/document.ts:293-314."""
    markdown = ""
    for section in sections:
        markdown += "#" * (section.level + base_level) + " " + section.title
        if section.id:
            markdown += f" {{#{section.id}}}"
        markdown += "\n\n"
        if section.preview:
            markdown += section.preview + "\n\n"
        if section.children:
            markdown += _format_sections_md(section.children, base_level)
    return markdown
