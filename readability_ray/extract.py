"""Core content extraction (reference src/extract/extract.ts).

Per-document pipeline: parse → preprocess → metadata → candidate
scoring → link extraction → ARIA tree → page-type classification →
root selection.  Runs entirely inside one Ray Data ``map_batches``
actor call per batch; nothing here crosses a block boundary.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .jsstr import COMMAS_RE, js_len, js_trim
from .vdom import (
    VDocument, VElement, ELEMENT, create_element, ensure_recursion_headroom,
    get_elements_by_tag_name, get_inner_text, get_link_density,
    get_node_ancestors, get_text_density, is_probably_visible,
    text_cache_clear,
)
from .parser import parse_html
from .preprocess import preprocess_document
from .format import count_nodes

# reference src/constants.ts:9-15
DEFAULT_N_TOP_CANDIDATES = 5
DEFAULT_TAGS_TO_SCORE = ("section", "h2", "h3", "h4", "h5", "h6", "p", "td", "pre")
DEFAULT_CHAR_THRESHOLD = 500

# reference src/constants.ts:18-27
UNLIKELY_CANDIDATES_RE = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|"
    r"disqus|extra|footer|gdpr|header|legends|menu|related|remark|replies|"
    r"rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|ad-break|"
    r"agegate|pagination|pager|popup|yom-remote", re.I)
OK_MAYBE_ITS_A_CANDIDATE_RE = re.compile(
    r"and|article|body|column|content|main|shadow", re.I)
POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination|post|"
    r"text|blog|story", re.I)
NEGATIVE_RE = re.compile(
    r"-ad-|hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|"
    r"footer|gdpr|masthead|media|meta|outbrain|promo|related|scroll|share|"
    r"shoutbox|sidebar|skyscraper|sponsor|shopping|tags|widget", re.I)

PAGE_TYPE_ARTICLE = "article"
PAGE_TYPE_OTHER = "other"


@dataclass
class PageMetadata:
    title: str = ""
    lang: str | None = None
    site_name: str | None = None
    url: str = ""


@dataclass
class ExtractedSnapshot:
    root: VElement | None
    node_count: int
    links: list = field(default_factory=list)
    metadata: PageMetadata = field(default_factory=PageMetadata)
    main_candidates: list = field(default_factory=list)
    aria_tree: object | None = None
    page_type: str = PAGE_TYPE_OTHER  # exposed for the batch pipeline
    byline: str | None = None


def initialize_node(node: VElement) -> None:
    """Seed contentScore by tag + class weight
    (reference src/extract/extract.ts:57-97)."""
    tag = node.tag
    if tag in ("article", "main"):
        score = 10
    elif tag == "div":
        score = 5
    elif tag in ("pre", "td", "blockquote"):
        score = 3
    elif tag in ("address", "ol", "ul", "dl", "dd", "dt", "li", "form"):
        score = -3
    elif tag in ("h1", "h2", "h3", "h4", "h5", "h6", "th"):
        score = -5
    else:
        score = 0
    node.score = score + get_class_weight(node)


def get_class_weight(node: VElement) -> int:
    """±25 for positive/negative class & id regexes
    (reference src/extract/extract.ts:294-318)."""
    weight = 0
    class_name = node.class_name
    if class_name:
        if NEGATIVE_RE.search(class_name):
            weight -= 25
        if POSITIVE_RE.search(class_name):
            weight += 25
    node_id = node.id
    if node_id:
        if NEGATIVE_RE.search(node_id):
            weight -= 25
        if POSITIVE_RE.search(node_id):
            weight += 25
    return weight


def find_main_candidates(doc: VDocument,
                         nb_top_candidates: int = DEFAULT_N_TOP_CANDIDATES
                         ) -> list[VElement]:
    """THE scoring pass (reference src/extract/extract.ts:324-443)."""
    # 1. single semantic tag shortcut
    for tag in ("article", "main"):
        elements = get_elements_by_tag_name(doc.document_element, tag)
        if len(elements) == 1:
            return [elements[0]]

    # 2. scoring-based detection
    body = doc.body
    candidates: list[VElement] = []
    elements_to_score: list[VElement] = []
    for tag in DEFAULT_TAGS_TO_SCORE:
        elements_to_score.extend(get_elements_by_tag_name(body, tag))

    for element in elements_to_score:
        inner_text = get_inner_text(element)
        if js_len(inner_text) < 25:
            continue
        ancestors = get_node_ancestors(element, 3)
        if not ancestors:
            continue
        content_score = 1.0
        content_score += len(COMMAS_RE.split(inner_text))
        content_score += min(js_len(inner_text) // 100, 3)
        for level, ancestor in enumerate(ancestors):
            if ancestor.score is None:
                initialize_node(ancestor)
                candidates.append(ancestor)
            score_divider = 1 if level == 0 else (2 if level == 1 else level * 3)
            ancestor.score += content_score / score_divider

    scored: list[tuple[VElement, float]] = []
    scored_elements: list[VElement] = []
    for candidate in candidates:
        if candidate.score is None:
            continue
        link_density = get_link_density(candidate)
        candidate.score *= 1 - link_density
        text_density = get_text_density(candidate)
        if text_density > 0:
            candidate.score *= 1 + min(text_density / 10, 0.1)

        # Walk up to a higher-scoring parent.  NOTE: the reference
        # compares against tagName === "BODY" (uppercase) while tags are
        # lowercased, so the walk never stops at body — load-bearing.
        current = candidate
        parent = current.parent
        while parent is not None:
            if (parent.score is not None and current.score is not None
                    and parent.score > current.score):
                current = parent
            parent = parent.parent

        if current.score is not None and current not in scored_elements:
            scored.append((current, current.score))
            scored_elements.append(current)

    # stable sort desc by score (JS sort comparator b.score - a.score)
    scored.sort(key=lambda pair: -pair[1])
    top_candidates = [el for el, _ in scored[:nb_top_candidates]]
    if not top_candidates and doc.body is not None:
        return [doc.body]
    return top_candidates


def is_probably_content(element: VElement) -> bool:
    """reference src/extract/extract.ts:448-483."""
    if not is_probably_visible(element):
        return False
    match_string = (element.class_name or "") + " " + (element.id or "")
    if (UNLIKELY_CANDIDATES_RE.search(match_string)
            and not OK_MAYBE_ITS_A_CANDIDATE_RE.search(match_string)):
        return False
    if js_len(get_inner_text(element)) < 140:
        return False
    if get_link_density(element) > 0.5:
        return False
    if get_text_density(element) < 0.1:
        return False
    return True


def get_article_title(doc: VDocument) -> str | None:
    """<title> → single <h1> → first h1/h2
    (reference src/extract/extract.ts:488-513)."""
    titles = get_elements_by_tag_name(doc.document_element, "title")
    if titles:
        return get_inner_text(titles[0])
    h1s = get_elements_by_tag_name(doc.body, "h1")
    if len(h1s) == 1:
        return get_inner_text(h1s[0])
    headings = h1s + get_elements_by_tag_name(doc.body, "h2")
    if headings:
        return get_inner_text(headings[0])
    return None


def get_article_byline(doc: VDocument) -> str | None:
    """reference src/extract/extract.ts:518-548."""
    for meta in get_elements_by_tag_name(doc.document_element, "meta"):
        attrs = meta.attrs
        name = attrs.get("name")
        prop = attrs.get("property")
        content = attrs.get("content")
        if not content:
            continue
        name = name.lower() if name is not None else None
        prop = prop.lower() if prop is not None else None
        if name == "author" or prop in ("author", "og:author", "article:author"):
            return content
    for author in get_elements_by_tag_name(doc.body, "a"):
        if author.attrs.get("rel") == "author":
            text = get_inner_text(author)
            if text:
                return text
    return None


def get_article_lang(doc: VDocument) -> str | None:
    """reference src/extract/extract.ts:553-561."""
    lang = doc.document_element.attrs.get("lang")
    return lang if lang else None


def get_article_site_name(doc: VDocument) -> str | None:
    """og:site_name → application-name
    (reference src/extract/extract.ts:566-589)."""
    metas = get_elements_by_tag_name(doc.document_element, "meta")
    for meta in metas:
        prop = meta.attrs.get("property")
        content = meta.attrs.get("content")
        if prop is not None and prop.lower() == "og:site_name" and content:
            return content
    for meta in metas:
        name = meta.attrs.get("name")
        content = meta.attrs.get("content")
        if name is not None and name.lower() == "application-name" and content:
            return content
    return None


@dataclass
class LinkInfo:
    element: VElement
    score: float
    text: str
    href: str | None


def extract_links(doc: VDocument) -> list[LinkInfo]:
    """All <a> under body with non-javascript: href
    (reference src/extract/extract.ts:594-616)."""
    links: list[LinkInfo] = []
    for element in get_elements_by_tag_name(doc.body, "a"):
        href = element.attrs.get("href") or None
        text = js_trim(get_inner_text(element))
        if href and not href.lower().startswith("javascript:"):
            links.append(LinkInfo(element, 0, text, href))
    return links


def classify_page_type(doc: VDocument, candidates: list[VElement],
                       char_threshold: int = DEFAULT_CHAR_THRESHOLD) -> str:
    """ARTICLE/OTHER heuristic (reference src/extract/extract.ts:626-707)."""
    if not candidates:
        return PAGE_TYPE_OTHER
    top = candidates[0]

    # 1. semantic check
    class_lower = (top.class_name or "").lower()
    id_lower = (top.id or "").lower()
    if (top.tag in ("main", "article")
            or "content" in class_lower
            or ("content" in id_lower if top.id else False)
            or any(c.nodeType == ELEMENT and c.tag in ("main", "article")
                   for c in top.children)):
        text_length = js_len(get_inner_text(top))
        link_density = get_link_density(top)
        if text_length >= char_threshold / 2 and link_density <= 0.5:
            return PAGE_TYPE_ARTICLE

    # 2. text length + link density
    text_length = js_len(get_inner_text(top))
    link_density = get_link_density(top)
    if text_length >= char_threshold and link_density <= 0.5:
        return PAGE_TYPE_ARTICLE

    # 3. candidate score balance
    if len(candidates) >= 2:
        top_score = top.score or 0
        second_score = candidates[1].score or 0
        score_ratio = second_score / top_score if top_score else (
            float("inf") if second_score > 0 else float("nan"))
        if top_score == 0:
            # JS: secondScore / 0 → Infinity (or NaN for 0/0); NaN > 0.8
            # is false, Infinity > 0.8 is true
            balanced = second_score > 0
        else:
            balanced = score_ratio > 0.8
        if balanced:
            total_links = len(get_elements_by_tag_name(doc.body, "a"))
            body_text_length = js_len(get_inner_text(doc.body))
            body_link_density = total_links / (body_text_length or 1)
            if body_link_density > 0.25 or link_density > 0.3:
                return PAGE_TYPE_OTHER

    # 4. total links vs body text
    total_links = len(get_elements_by_tag_name(doc.body, "a"))
    body_text_length = js_len(get_inner_text(doc.body))
    if total_links > 30 and body_text_length < char_threshold * 1.5:
        return PAGE_TYPE_OTHER

    # 5. final
    if text_length >= 140 and link_density <= 0.5:
        return PAGE_TYPE_ARTICLE
    return PAGE_TYPE_OTHER


def _wrap_fragment(parsed) -> VDocument:
    """Wrap a VElement parser result in a VDocument
    (reference src/extract/extract.ts:783-792)."""
    if isinstance(parsed, VDocument):
        return parsed
    doc = VDocument(create_element("html"), parsed)
    doc.document_element.children = [doc.body]
    doc.body.parent = doc.document_element
    return doc


def extract(html: str, char_threshold: int | None = None,
            nb_top_candidates: int | None = None,
            parser=None, forced_page_type: str | None = None,
            url: str | None = None,
            build_aria: bool = True) -> ExtractedSnapshot:
    """Full per-document pipeline (reference src/extract/extract.ts:777-859).

    Note JS falsy-default semantics: charThreshold=0 → 500,
    nbTopCandidates=0 → 5 (``options.x || DEFAULT``).

    ``build_aria=True`` matches the reference exactly (extract.ts:816
    always builds the tree); False is a corpus-throughput knob (~20%
    of extract cost) for pipelines that don't consume the aria column —
    it does not change any other output.
    """
    ensure_recursion_headroom()
    text_cache_clear()
    parse = parser or parse_html
    doc = _wrap_fragment(parse(html))

    preprocess_document(doc)
    text_cache_clear()  # tree mutated; drop memoized text

    title = get_article_title(doc)
    byline = get_article_byline(doc)
    lang = get_article_lang(doc)
    site_name = get_article_site_name(doc)

    nb_top = nb_top_candidates or DEFAULT_N_TOP_CANDIDATES
    candidates = find_main_candidates(doc, nb_top)
    main_candidates = [(el, el.score or 0) for el in candidates]

    links = extract_links(doc)

    aria_tree = None
    if build_aria:
        from .readable_aria import build_aria_tree
        aria_tree = build_aria_tree(doc)

    threshold = char_threshold or DEFAULT_CHAR_THRESHOLD
    page_type = forced_page_type or classify_page_type(doc, candidates, threshold)

    root: VElement | None = None
    if page_type == PAGE_TYPE_ARTICLE and main_candidates:
        top_element = main_candidates[0][0]
        if threshold < 100 or is_probably_content(top_element):
            root = top_element
        else:
            page_type = PAGE_TYPE_OTHER

    node_count = count_nodes(root) if root else 0

    metadata = PageMetadata(
        title=title or "", lang=lang or None, site_name=site_name or None,
        url=doc.document_uri or "")
    return ExtractedSnapshot(
        root=root, node_count=node_count, links=links, metadata=metadata,
        main_candidates=main_candidates, aria_tree=aria_tree,
        page_type=page_type, byline=byline)


def find_structural_elements(doc: VDocument) -> dict:
    """Detect header / footer / other significant structural nodes
    (reference src/extract/extract.ts:102-216)."""
    header: VElement | None = None
    footer: VElement | None = None
    body = doc.body

    header_tags = get_elements_by_tag_name(doc.document_element, "header")
    if len(header_tags) == 1:
        header = header_tags[0]
    else:
        for el in get_elements_by_tag_name(body, "*"):
            role = (el.attrs.get("role") or "").lower() or None
            el_id = (el.id or "").lower() if el.id else None
            class_name = (el.class_name or "").lower() if el.class_name \
                else None
            if (role == "banner" or el_id in ("header", "masthead")
                    or (class_name is not None
                        and ("header" in class_name
                             or "masthead" in class_name))):
                if header is None or (
                        el.parent is body and header.parent is not body):
                    header = el

    footer_tags = get_elements_by_tag_name(doc.document_element, "footer")
    if len(footer_tags) == 1:
        footer = footer_tags[0]
    else:
        all_elements = get_elements_by_tag_name(body, "*")
        # reverse iteration: lower elements are more footer-like
        for el in reversed(all_elements):
            role = (el.attrs.get("role") or "").lower() or None
            el_id = (el.id or "").lower() if el.id else None
            class_name = (el.class_name or "").lower() if el.class_name \
                else None
            if (role == "contentinfo" or el_id in ("footer", "colophon")
                    or (class_name is not None
                        and ("footer" in class_name
                             or "site-info" in class_name))):
                if footer is None:
                    inside_header = False
                    current = el
                    while current is not None and current is not body:
                        if current is header:
                            inside_header = True
                            break
                        current = current.parent
                    if not inside_header:
                        footer = el

    potential: list[VElement] = []
    for tag in ("main", "article", "section", "aside", "nav"):
        potential.extend(get_elements_by_tag_name(body, tag))
    add_significant_elements_by_class_or_id(body, potential)

    other: list[VElement] = []
    for node in potential:
        inside = False
        current = node
        while current is not None and current is not body:
            if current is header or current is footer:
                inside = True
                break
            current = current.parent
        if not inside and node not in other:
            if is_probably_visible(node) and (
                    is_significant_node(node) or is_semantic_tag(node.tag)):
                other.append(node)
    # dedupe preserving order (Set iteration order == insertion in JS)
    seen: list = []
    unique = [n for n in other if not (n in seen or seen.append(n))]
    return {"header": header, "footer": footer,
            "otherSignificantNodes": unique}


_SIGNIFICANT_PATTERNS = [re.compile(p, re.I) for p in (
    "content", "main", "article", "post", "entry", "body", "text",
    "story", "container", "wrapper", "page", "blog", "section")]


def add_significant_elements_by_class_or_id(body: VElement,
                                            potential: list) -> None:
    """reference src/extract/extract.ts:221-256."""
    for el in get_elements_by_tag_name(body, "*"):
        class_name = (el.class_name or "").lower()
        el_id = (el.id or "").lower()
        combined = f"{class_name} {el_id}"
        for pattern in _SIGNIFICANT_PATTERNS:
            if pattern.search(combined):
                if el not in potential:
                    potential.append(el)
                break


def is_significant_node(node: VElement) -> bool:
    """textLen ≥ 50 ∧ textDensity ≥ 0.1 ∧ linkDensity ≤ 0.5
    (reference src/extract/extract.ts:261-281)."""
    if js_len(get_inner_text(node, False)) < 50:
        return False
    if get_text_density(node) < 0.1:
        return False
    if get_link_density(node) > 0.5:
        return False
    return True


def is_semantic_tag(tag_name: str) -> bool:
    """reference src/extract/extract.ts:286-289."""
    return tag_name.lower() in ("main", "article", "section", "aside", "nav")


def extract_aria_tree(html: str, compress: bool = True, parser=None) -> dict:
    """parse → preprocess → (compressed | raw) ARIA tree
    (reference src/extract/extract.ts:717-772)."""
    from .aria import build_aria_node, count_aria_nodes
    from .readable_aria import build_aria_tree
    text_cache_clear()
    parse = parser or parse_html
    doc = _wrap_fragment(parse(html))
    preprocess_document(doc)
    if compress:
        return build_aria_tree(doc)
    root_node = build_aria_node(doc.body)
    return {"root": root_node, "nodeCount": count_aria_nodes(root_node)}


def create_extractor(parser, forced_page_type: str | None = None):
    """Curry extract with a fixed parser/options
    (reference src/extract/extract.ts:866-890)."""
    def configured_extract(html: str, **options) -> ExtractedSnapshot:
        options.setdefault("forced_page_type", forced_page_type)
        return extract(html, parser=parser, **options)
    return configured_extract
