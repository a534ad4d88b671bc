"""Improved page-type classification (reference src/classify/classify.ts).

A second, stricter classifier beside ``classify_page_type`` in
extract.py — the reference keeps both code paths with small divergences
(SURVEY.md §7.4 item 7); extract() uses the simpler one, this module
exposes the URL-aware variant and the possibility-scored
``classify_snapshot``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .extract import (
    DEFAULT_CHAR_THRESHOLD, PAGE_TYPE_ARTICLE, PAGE_TYPE_OTHER,
    ExtractedSnapshot,
)
from .jsstr import js_len
from .vdom import (
    ELEMENT, VDocument, VElement, get_elements_by_tag_name, get_inner_text,
    get_link_density,
)

_THREE_DEEP_RE = re.compile(r"/[^/]+/[^/]+/[^/]+$")
_DIGITS_RE = re.compile(r"^\d+$")
_ALNUM_RE = re.compile(r"^[a-zA-Z0-9-_]+$")
_HAS_DIGIT_RE = re.compile(r"\d")
_ORIGIN_RE = re.compile(r"^https?://[^/]+/?$")
_ONE_SEG_RE = re.compile(r"^https?://[^/]+/[^/]+/?$")


def get_expected_page_type_by_url(url: str) -> str:
    """URL-pattern classifier (reference src/classify/classify.ts:28-57)."""
    if "/articles/" in url or _THREE_DEEP_RE.search(url):
        return PAGE_TYPE_ARTICLE
    last_part = url.split("/")[-1]
    last_no_ext = last_part.split(".")[0]
    if _DIGITS_RE.match(last_no_ext) or (
            _ALNUM_RE.match(last_no_ext)
            and _HAS_DIGIT_RE.search(last_no_ext)
            and len(last_no_ext) >= 5):
        return PAGE_TYPE_ARTICLE
    return PAGE_TYPE_OTHER


def _is_article_id_tail(url: str) -> bool:
    last_no_ext = url.split("/")[-1].split(".")[0]
    return bool(_DIGITS_RE.match(last_no_ext) or (
        _ALNUM_RE.match(last_no_ext)
        and _HAS_DIGIT_RE.search(last_no_ext)
        and len(last_no_ext) >= 5))


def _card_like(children) -> list:
    out = []
    for child in children:
        if child.nodeType != ELEMENT:
            continue
        cls = (child.class_name or "").lower()
        if child.class_name and (
                "card" in cls or "item" in cls or "entry" in cls):
            out.append(child)
    return out


def _semantic_top(top: VElement) -> bool:
    return (top.tag in ("main", "article")
            or "content" in (top.class_name or "").lower()
            or "content" in (top.id or "").lower()
            or any(c.nodeType == ELEMENT and c.tag in ("main", "article")
                   for c in top.children))


def classify(doc: VDocument, candidates: list[VElement],
             char_threshold: int = DEFAULT_CHAR_THRESHOLD,
             url: str | None = None) -> str:
    """Improved classifier (reference src/classify/classify.ts:70-249)."""
    if url:
        if "/articles/" in url:
            return PAGE_TYPE_ARTICLE if candidates else PAGE_TYPE_OTHER
        if _is_article_id_tail(url):
            return PAGE_TYPE_ARTICLE if candidates else PAGE_TYPE_OTHER
        if _ORIGIN_RE.match(url) or _ONE_SEG_RE.match(url):
            if candidates:
                text_length = js_len(get_inner_text(candidates[0]))
                if (text_length > char_threshold * 2
                        and get_link_density(candidates[0]) < 0.3):
                    return PAGE_TYPE_ARTICLE
            return PAGE_TYPE_OTHER

    if not candidates:
        return PAGE_TYPE_OTHER
    top = candidates[0]
    body = doc.body

    heading_count = (len(get_elements_by_tag_name(body, "h1"))
                     + len(get_elements_by_tag_name(body, "h2"))
                     + len(get_elements_by_tag_name(body, "h3")))
    image_count = len(get_elements_by_tag_name(body, "img"))
    link_count = len(get_elements_by_tag_name(body, "a"))
    list_element_count = (len(get_elements_by_tag_name(body, "article"))
                          + len(get_elements_by_tag_name(body, "li"))
                          + len(_card_like(body.children)))

    if (list_element_count > 10
            or (link_count > 50 and image_count > 20)
            or heading_count > 10
            or heading_count == 0):
        return PAGE_TYPE_OTHER

    if _semantic_top(top):
        text_length = js_len(get_inner_text(top))
        link_density = get_link_density(top)
        if text_length >= char_threshold / 2 and link_density <= 0.5:
            if list_element_count > 10:
                return PAGE_TYPE_OTHER
            return PAGE_TYPE_ARTICLE
        if text_length < 100:
            return PAGE_TYPE_OTHER

    text_length = js_len(get_inner_text(top))
    link_density = get_link_density(top)
    if (text_length >= char_threshold and link_density <= 0.5
            and 1 <= heading_count <= 10):
        return PAGE_TYPE_ARTICLE

    if len(candidates) >= 2:
        top_score = top.score or 0
        second_score = candidates[1].score or 0
        balanced = (second_score / top_score > 0.8) if top_score \
            else second_score > 0  # JS Infinity/NaN semantics
        if balanced:
            body_text_length = js_len(get_inner_text(body))
            body_link_density = link_count / (body_text_length or 1)
            if body_link_density > 0.25 or link_density > 0.3:
                return PAGE_TYPE_OTHER

    body_text_length = js_len(get_inner_text(body))
    if link_count > 30 and body_text_length < char_threshold * 1.5:
        return PAGE_TYPE_OTHER

    if text_length >= 140 and link_density <= 0.5:
        if list_element_count > 10:
            return PAGE_TYPE_OTHER
        return PAGE_TYPE_ARTICLE
    return PAGE_TYPE_OTHER


def analyze_content_characteristics(
        doc: VDocument, candidates: list[VElement],
        char_threshold: int = DEFAULT_CHAR_THRESHOLD) -> dict:
    """reference src/classify/classify.ts:284-400 (returns
    {pageType, reasons})."""
    reasons: list[str] = []
    if not candidates:
        reasons.append("no content candidates found")
        return {"pageType": PAGE_TYPE_OTHER, "reasons": reasons}
    top = candidates[0]
    body = doc.body

    is_semantic = _semantic_top(top)
    if is_semantic:
        reasons.append(f"semantic tag ({top.tag})")

    text_length = js_len(get_inner_text(top))
    link_density = get_link_density(top)
    reasons.append(f"text length: {text_length}")
    reasons.append(f"link density: {link_density:.2f}")

    heading_count = (len(get_elements_by_tag_name(body, "h1"))
                     + len(get_elements_by_tag_name(body, "h2"))
                     + len(get_elements_by_tag_name(body, "h3")))
    reasons.append(f"headings: {heading_count}")

    list_element_count = (len(get_elements_by_tag_name(body, "article"))
                          + len(_card_like(body.children)))
    reasons.append(f"list elements: {list_element_count}")

    score_ratio = 1.0
    if len(candidates) >= 2:
        top_score = top.score or 0
        second_score = candidates[1].score or 0
        score_ratio = (second_score / top_score) if top_score else (
            float("inf") if second_score else float("nan"))
        reasons.append(f"score ratio: {score_ratio:.2f}")

    if (text_length >= char_threshold and link_density <= 0.5
            and 1 <= heading_count <= 10):
        reasons.append("sufficient text, low link density, good headings")
        return {"pageType": PAGE_TYPE_ARTICLE, "reasons": reasons}
    if is_semantic and text_length >= char_threshold / 2 \
            and link_density <= 0.5:
        reasons.append("semantic tag with enough text")
        return {"pageType": PAGE_TYPE_ARTICLE, "reasons": reasons}
    if list_element_count > 10:
        reasons.append("many list-like elements (index page)")
        return {"pageType": PAGE_TYPE_OTHER, "reasons": reasons}
    if len(candidates) >= 2 and score_ratio > 0.8 and link_density > 0.3:
        reasons.append("balanced candidates with high link density")
        return {"pageType": PAGE_TYPE_OTHER, "reasons": reasons}
    if text_length >= 140 and link_density <= 0.5:
        reasons.append("some text with low link density")
        return {"pageType": PAGE_TYPE_ARTICLE, "reasons": reasons}
    reasons.append("not enough article characteristics")
    return {"pageType": PAGE_TYPE_OTHER, "reasons": reasons}


@dataclass
class ArticleClassified:
    page_type: str
    possibility: float
    title: str = ""
    byline: str = ""
    lang: str = "unknown"
    site_name: str = "unknown"
    content: VElement | None = None


@dataclass
class OtherClassified:
    page_type: str
    possibility: float
    aria_tree: object | None = None
    links: list = field(default_factory=list)
    main_candidates: list = field(default_factory=list)


def classify_snapshot(snapshot: ExtractedSnapshot) -> list:
    """Possibility-scored classifier (reference
    src/classify/classify.ts:406-548); returns results sorted by
    possibility desc."""
    root = snapshot.root
    main_candidates = snapshot.main_candidates
    if not root or not main_candidates:
        return [OtherClassified(
            page_type=PAGE_TYPE_OTHER, possibility=1.0,
            aria_tree=snapshot.aria_tree, links=snapshot.links,
            main_candidates=main_candidates or [])]

    top = main_candidates[0][0]
    possibility = 0.0

    if _semantic_top(top):
        possibility += 0.2

    text_length = js_len(get_inner_text(top))
    link_density = get_link_density(top)
    if text_length >= DEFAULT_CHAR_THRESHOLD:
        possibility += 0.3
    elif text_length < DEFAULT_CHAR_THRESHOLD / 2:
        possibility -= 0.1
    if link_density <= 0.3:
        possibility += 0.2
    elif link_density > 0.6:
        possibility -= 0.2

    heading_count = (len(get_elements_by_tag_name(root, "h1"))
                     + len(get_elements_by_tag_name(root, "h2"))
                     + len(get_elements_by_tag_name(root, "h3")))
    if 1 <= heading_count <= 10:
        possibility += 0.1
    elif heading_count == 0 or heading_count > 15:
        possibility -= 0.1

    list_element_count = (len(get_elements_by_tag_name(root, "article"))
                          + len(_card_like(root.children)))
    if list_element_count > 10:
        possibility -= 0.2

    if len(main_candidates) >= 2:
        top_score = main_candidates[0][1] or 0
        second_score = main_candidates[1][1] or 0
        score_ratio = second_score / top_score if top_score > 0 else 0
        if score_ratio > 0.8:
            possibility -= 0.1

    if get_expected_page_type_by_url(
            snapshot.metadata.url) == PAGE_TYPE_ARTICLE:
        possibility += 0.1

    possibility = max(0.0, min(1.0, possibility))

    results = [
        ArticleClassified(
            page_type=PAGE_TYPE_ARTICLE, possibility=possibility,
            title=snapshot.metadata.title, byline="",
            lang=snapshot.metadata.lang or "unknown",
            site_name=snapshot.metadata.site_name or "unknown",
            content=top),
        OtherClassified(
            page_type=PAGE_TYPE_OTHER, possibility=1.0 - possibility,
            aria_tree=snapshot.aria_tree, links=snapshot.links,
            main_candidates=main_candidates),
    ]
    results.sort(key=lambda r: -r.possibility)
    return results


def analyze_url_pattern(url: str) -> str:
    """reference src/classify/classify.ts:254-278 (same output strings)."""
    last_no_ext = url.split("/")[-1].split(".")[0]
    if last_no_ext == "":
        return "末尾なし"
    if _DIGITS_RE.match(last_no_ext):
        return f"数字のみ ({last_no_ext})"
    if _ALNUM_RE.match(last_no_ext) and _HAS_DIGIT_RE.search(last_no_ext):
        return f"英数字混合 ({last_no_ext})"
    if re.match(r"^[a-zA-Z-_]+$", last_no_ext):
        return f"英字のみ ({last_no_ext})"
    return f"その他 ({last_no_ext})"
