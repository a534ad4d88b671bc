"""CLI mirroring the reference's cli.js (reference cli.js:36-437).

Local files only in this environment (the reference also fetches URLs;
network loading raises a clear error here).  Same flags, same output
shapes, CLI default charThreshold=250 (cli.js:168).

Usage: python -m readability_ray.cli [options] <file>
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load(url_or_path: str) -> str:
    if url_or_path.startswith(("http://", "https://")):
        # reference cli.js:17-36 URL branch — works where the
        # environment has network; in this sandbox every connect
        # fails and surfaces the documented guidance instead
        from .sources.netfetch import FetchUnavailable, fetch_url
        try:
            return fetch_url(url_or_path)
        except FetchUnavailable as exc:
            raise SystemExit(
                f"{exc}; or pass a local HTML file path")
    try:
        with open(url_or_path, encoding="utf-8") as f:
            return f.read()
    except OSError as exc:
        raise SystemExit(f"cannot read {url_or_path}: {exc}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="readability-ray",
        description="Extract main content / page structure from HTML")
    p.add_argument("url", nargs="?", help="URL or local file path")
    p.add_argument("-t", "--threshold", type=int, default=250)
    p.add_argument("-f", "--format", default=None,
                   choices=["md", "html", "json", "nav", "doc",
                            "ai-summary", "ai-structured"])
    p.add_argument("-o", "--out", default=None)
    p.add_argument("--nav-type", default=None)
    p.add_argument("--nav-location", default=None)
    p.add_argument("--nav-only", action="store_true")
    p.add_argument("--doc-mode", action="store_true")
    p.add_argument("--analyze-structure", action="store_true")
    p.add_argument("--extract-nav", action="store_true")
    p.add_argument("--extract-content", action="store_true")
    p.add_argument("--with-context", action="store_true")
    p.add_argument("--full-analysis", action="store_true")
    return p


def _nav_to_dict(nav) -> dict:
    return {
        "type": nav.type,
        "location": nav.location,
        "label": nav.label,
        "structure": nav.structure,
        "items": [_item_to_dict(i) for i in nav.items],
    }


def _item_to_dict(item) -> dict:
    out = {"label": item.label, "href": item.href, "level": item.level,
           "isCurrent": item.is_current, "isActive": item.is_active}
    if item.children:
        out["children"] = [_item_to_dict(c) for c in item.children]
    return out


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.url:
        print("Please provide a URL.", file=sys.stderr)
        return 1

    from .detect import analyze_page_structure, extract_document_content
    from .extract import extract
    from .format import to_html
    from .markdown import to_markdown

    fmt = args.format
    output = None
    if fmt is None and args.out:
        output = args.out if os.path.isabs(args.out) else \
            os.path.join(os.getcwd(), args.out)
        ext = os.path.splitext(args.url)[1]
        fmt = "html" if ext == ".html" else "md"
    if fmt is None:
        fmt = "md"
    if args.out and output is None:
        output = args.out if os.path.isabs(args.out) else \
            os.path.join(os.getcwd(), args.out)

    html = _load(args.url)
    result = extract(html, char_threshold=args.threshold)

    if args.analyze_structure:
        structure = analyze_page_structure(html)
        analysis = {
            "url": args.url,
            "pageType": "article" if result.node_count > 0 else "other",
            "hasMainContent": result.node_count > 0,
            "navigations": {
                "global": any(n.type == "global" for n in structure.navigations),
                "breadcrumb": any(n.type == "breadcrumb"
                                  for n in structure.navigations),
                "toc": any(n.type == "toc" for n in structure.navigations),
                "sidebar": any(n.location == "sidebar"
                               for n in structure.navigations),
                "pagination": any(n.type == "pagination"
                                  for n in structure.navigations),
            },
            "contentAreas": {
                "header": len(structure.headers) > 0,
                "mainContent": structure.main_content is not None,
                "sidebar": structure.sidebar is not None,
                "footer": structure.footer is not None,
            },
            "stats": {
                "navigationCount": len(structure.navigations),
                "headerCount": len(structure.headers),
                "contentLength": result.node_count,
            },
        }
        content = json.dumps(analysis, indent=2)
    elif args.extract_nav or args.nav_only:
        structure = analyze_page_structure(html)
        navigations = structure.navigations
        if args.nav_type:
            navigations = [n for n in navigations if n.type == args.nav_type]
        if args.nav_location:
            navigations = [n for n in navigations
                           if n.location == args.nav_location]
        by_type: dict = {}
        for nav in navigations:
            by_type[nav.type] = by_type.get(nav.type, 0) + 1
        nav_output = {
            "url": args.url,
            "navigations": [_nav_to_dict(n) for n in navigations],
            "summary": {
                "total": len(navigations),
                "byType": by_type,
                "mainNavigation": (
                    {"items": [i.label
                               for i in structure.main_navigation.items]}
                    if structure.main_navigation else None),
                "breadcrumb": (
                    {"path": " > ".join(
                        i.label for i in structure.breadcrumb.items)}
                    if structure.breadcrumb else None),
                "toc": (
                    {"items": [{"label": i.label, "href": i.href}
                               for i in structure.toc.items]}
                    if structure.toc else None),
            },
        }
        content = json.dumps(nav_output, indent=2)
    elif args.extract_content:
        if args.with_context:
            structure = analyze_page_structure(html)
            content = json.dumps({
                "url": args.url,
                "title": result.metadata.title,
                "content": to_markdown(result.root),
                "context": {
                    "breadcrumb": (" > ".join(
                        i.label for i in structure.breadcrumb.items)
                        if structure.breadcrumb else None),
                    "section": ("main" if structure.main_content
                                else "unknown"),
                    "surroundingNavigation": [
                        {"type": n.type, "location": n.location,
                         "itemCount": len(n.items)}
                        for n in structure.navigations
                        if n.location == "inline" or n.type == "toc"],
                },
                "metadata": {
                    "title": result.metadata.title,
                    "lang": result.metadata.lang,
                    "siteName": result.metadata.site_name,
                    "url": result.metadata.url,
                },
            }, indent=2)
        else:
            content = to_markdown(result.root)
    elif args.full_analysis:
        structure = analyze_page_structure(html)
        doc_content = extract_document_content(html)
        content = json.dumps({
            "url": args.url,
            "structure": {
                "pageType": "article" if result.node_count > 0 else "other",
                "navigations": [
                    {"type": n.type, "location": n.location,
                     "itemCount": len(n.items), "label": n.label}
                    for n in structure.navigations],
                "headers": [
                    {"type": h.type,
                     "text": (h.contains.get("siteTitle").text
                              if h.contains.get("siteTitle") else "")}
                    for h in structure.headers],
                "contentAreas": {
                    "main": structure.main_content is not None,
                    "sidebar": structure.sidebar is not None,
                    "footer": structure.footer is not None,
                },
            },
            "navigation": {
                "breadcrumb": doc_content.breadcrumb,
                "tableOfContents": doc_content.toc,
                "sidebarNav": doc_content.sidebar_nav,
            },
            "content": {
                "main": doc_content.content,
                "outline": doc_content.outline,
            },
            "metadata": {
                "title": result.metadata.title,
                "lang": result.metadata.lang,
                "siteName": result.metadata.site_name,
                "url": result.metadata.url,
            },
        }, indent=2)
    elif fmt == "ai-summary":
        structure = analyze_page_structure(html)
        markdown = to_markdown(result.root) if result.root else ""
        # PageStructure has no `sections` (matches the reference, where
        # cli.js reads structure.sections from analyzePageStructure and
        # gets undefined)
        content = json.dumps({
            "url": args.url,
            "type": ("documentation" if any(
                n.type == "toc" and n.location == "sidebar"
                for n in structure.navigations)
                else "article" if result.node_count > 500 else "other"),
            "title": result.metadata.title,
            "summary": (markdown[:200] + "...") if result.root else "",
            "mainTopics": [],
            "navigationSummary": {
                "breadcrumb": (" > ".join(
                    i.label for i in structure.breadcrumb.items)
                    if structure.breadcrumb else None),
                "sections": 0,
                "hasTableOfContents": any(
                    n.type == "toc" for n in structure.navigations),
                "hasSidebar": structure.sidebar is not None,
            },
            "contentStats": {
                "wordCount": len(markdown.split()) if result.root else 0,
                "hasCode": "```" in markdown if result.root else False,
            },
        }, indent=2)
    elif fmt == "ai-structured":
        structure = analyze_page_structure(html)
        main_header = structure.main_header
        content = json.dumps({
            "metadata": {
                "url": args.url,
                "title": result.metadata.title,
                "lang": result.metadata.lang,
                "siteName": result.metadata.site_name,
            },
            "structure": {
                "header": ({
                    "logo": "present" if main_header.contains.get("logo")
                            else "absent",
                    "title": (main_header.contains["siteTitle"].text
                              if main_header.contains.get("siteTitle")
                              else None),
                    "navigation": "present"
                                  if main_header.contains.get("navigation")
                                  else "absent",
                } if main_header else None),
                "navigation": {
                    "types": [n.type for n in structure.navigations],
                    "main": ([{"label": i.label, "href": i.href}
                              for i in structure.main_navigation.items]
                             if structure.main_navigation else []),
                    "breadcrumb": ([_item_to_dict(i)
                                    for i in structure.breadcrumb.items]
                                   if structure.breadcrumb else []),
                },
                "content": {
                    "main": {
                        "present": result.root is not None,
                        "markdown": to_markdown(result.root)
                                    if result.root else "",
                    },
                    "sections": [],
                },
                "sidebar": ({"present": True, "navigation": 0}
                            if structure.sidebar else None),
            },
        }, indent=2)
    elif args.doc_mode or fmt == "doc":
        doc_content = extract_document_content(html)
        content = "# Document Content\n\n"
        if doc_content.breadcrumb:
            content += f"**Breadcrumb:** {doc_content.breadcrumb}\n\n"
        if doc_content.toc:
            content += "## Table of Contents\n\n" + doc_content.toc + "\n"
        if doc_content.sidebar_nav:
            content += ("## Sidebar Navigation\n\n"
                        + doc_content.sidebar_nav + "\n")
        if doc_content.outline:
            content += "## Document Outline\n\n" + doc_content.outline + "\n"
        content += "## Main Content\n\n" + doc_content.content
    elif fmt == "html":
        content = to_html(result.root)
    else:
        content = to_markdown(result.root)

    if output:
        with open(output, "w", encoding="utf-8") as f:
            f.write(content)
    else:
        print(content)
    return 0


if __name__ == "__main__":
    sys.exit(run())
