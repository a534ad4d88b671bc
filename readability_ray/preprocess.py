"""Noise removal preprocessing (reference src/extract/preprocess.ts).

Destructive per-document pass: unwanted semantic tags and ad-like
elements are spliced out of their parents.  The collect-then-splice
order is load-bearing (SURVEY.md §7.4 item 3): elements are collected
BEFORE any removal, so nested removed tags are each detached from
possibly-already-detached parents.
"""

from __future__ import annotations

import re

from .vdom import ELEMENT, VDocument, text_cache_clear

# reference src/extract/preprocess.ts:11-33
TAGS_TO_REMOVE = (
    "aside", "nav", "header", "footer", "script", "style", "noscript",
    "iframe", "form", "button", "object", "embed", "applet", "map",
    "dialog",
)

# reference src/extract/preprocess.ts:36-53
AD_PATTERNS = [re.compile(p, re.I) for p in (
    r"ad-", r"^ad$", r"^ads$", r"advert", r"banner", r"sponsor", r"promo",
    r"google-ad", r"adsense", r"doubleclick", r"amazon", r"affiliate",
    r"commercial", r"paid", r"shopping", r"recommendation",
)]

# single alternation — same match semantics as ORing the 16 searches,
# one regex pass per element instead of up to 16
_AD_COMBINED_RE = re.compile(
    r"ad-|^ad$|^ads$|advert|banner|sponsor|promo|google-ad|adsense|"
    r"doubleclick|amazon|affiliate|commercial|paid|shopping|recommendation",
    re.I)


def preprocess_document(doc: VDocument) -> VDocument:
    """reference src/extract/preprocess.ts:62-70.

    Single-walk implementation: one pre-order traversal collects the
    per-tag removal lists (documentElement scope) and the ad-candidate
    list (body scope), then elements detach in the reference's order
    (per TAGS_TO_REMOVE, then ads).  Detaching an element that sits
    inside an already-detached subtree only mutates the detached
    subtree, so the surviving tree is identical to the reference's
    walk-per-tag behavior — at 1/16th the traversal cost.
    """
    removal_set = frozenset(TAGS_TO_REMOVE)
    by_tag: dict[str, list] = {tag: [] for tag in TAGS_TO_REMOVE}

    stack = [doc.document_element]
    while stack:
        node = stack.pop()
        if node.tag in removal_set:
            by_tag[node.tag].append(node)
        for child in node.children:
            if child.nodeType == ELEMENT:
                stack.append(child)
    for tag_name in TAGS_TO_REMOVE:
        for element in by_tag[tag_name]:
            _detach(element)

    # ad removal walks the post-removal body subtree (reference scope)
    ad_candidates: list = []
    stack = [doc.body]
    while stack:
        node = stack.pop()
        ad_candidates.append(node)
        for child in node.children:
            if child.nodeType == ELEMENT:
                stack.append(child)
    for element in ad_candidates:
        if element.parent is not None and is_likely_ad(element):
            _detach(element)
    # invalidate per-node memos across the (mutated) tree; body may be
    # detached from documentElement in the fragment case
    text_cache_clear(doc.document_element)
    if doc.body is not doc.document_element:
        text_cache_clear(doc.body)
    return doc


def _detach(element) -> None:
    parent = element.parent
    if parent is not None:
        try:
            parent.children.remove(element)
        except ValueError:
            pass


def remove_unwanted_tags(doc: VDocument) -> None:
    """reference src/extract/preprocess.ts:75-90 (per-tag collect, then
    splice each from its — possibly already detached — parent)."""
    from .vdom import get_elements_by_tag_name
    for tag_name in TAGS_TO_REMOVE:
        for element in get_elements_by_tag_name(doc.document_element, tag_name):
            _detach(element)
    text_cache_clear(doc.document_element)
    if doc.body is not doc.document_element:
        text_cache_clear(doc.body)


def remove_ads(doc: VDocument) -> None:
    """reference src/extract/preprocess.ts:95-109."""
    from .vdom import get_elements_by_tag_name
    for element in get_elements_by_tag_name(doc.body, "*"):
        if element.parent is not None and is_likely_ad(element):
            _detach(element)
    text_cache_clear(doc.document_element)
    if doc.body is not doc.document_element:
        text_cache_clear(doc.body)


def is_likely_ad(element) -> bool:
    """reference src/extract/preprocess.ts:114-138."""
    combined = f"{element.class_name or ''} {element.id or ''}"
    if _AD_COMBINED_RE.search(combined):
        return True
    attrs = element.attrs
    return (
        attrs.get("role") == "advertisement"
        or "data-ad" in attrs
        or "data-ad-client" in attrs
        or "data-ad-slot" in attrs
    )
