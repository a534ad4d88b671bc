"""Noise removal preprocessing (reference src/extract/preprocess.ts).

Destructive per-document pass: unwanted semantic tags and ad-like
elements are spliced out of their parents.  The collect-then-splice
order is load-bearing (SURVEY.md §7.4 item 3): elements are collected
BEFORE any removal, so nested removed tags are each detached from
possibly-already-detached parents.
"""

from __future__ import annotations

import re

from .vdom import VDocument, get_elements_by_tag_name

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


def preprocess_document(doc: VDocument) -> VDocument:
    """reference src/extract/preprocess.ts:62-70."""
    remove_unwanted_tags(doc)
    remove_ads(doc)
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
    for tag_name in TAGS_TO_REMOVE:
        for element in get_elements_by_tag_name(doc.document_element, tag_name):
            _detach(element)


def remove_ads(doc: VDocument) -> None:
    """reference src/extract/preprocess.ts:95-109."""
    for element in get_elements_by_tag_name(doc.body, "*"):
        if element.parent is not None and is_likely_ad(element):
            _detach(element)


def is_likely_ad(element) -> bool:
    """reference src/extract/preprocess.ts:114-138."""
    combined = f"{element.class_name or ''} {element.id or ''}"
    for pattern in AD_PATTERNS:
        if pattern.search(combined):
            return True
    attrs = element.attrs
    return (
        attrs.get("role") == "advertisement"
        or "data-ad" in attrs
        or "data-ad-client" in attrs
        or "data-ad-slot" in attrs
    )
