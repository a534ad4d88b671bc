"""Readable facade (reference src/readable.ts:64-288).

Same seven steps as ``extract()`` in a slightly different order, with
two semantic differences (SURVEY.md §3.3, §7.4 item 7):
- the root gate ALWAYS applies ``isProbablyContent`` (no ``<100``
  charThreshold skip);
- options use nullish (``??``) defaulting, so charThreshold=0 stays 0
  (``extract()`` uses ``||`` and would fall back to 500).
"""

from __future__ import annotations

from .extract import (
    DEFAULT_CHAR_THRESHOLD, DEFAULT_N_TOP_CANDIDATES, PAGE_TYPE_ARTICLE,
    ExtractedSnapshot, PageMetadata, classify_page_type, extract_links,
    find_main_candidates, get_article_lang, get_article_site_name,
    get_article_title, is_probably_content, _wrap_fragment,
)
from .format import count_nodes
from .hierarchy import analyze_link_hierarchy
from .markdown import to_markdown
from .parser import parse_html
from .preprocess import preprocess_document
from .readable_aria import build_aria_tree
from .vdom import ensure_recursion_headroom, text_cache_clear

_UNSET = object()


class Readable:
    """Facade over an extracted snapshot (reference src/readable.ts)."""

    def __init__(self, snapshot: ExtractedSnapshot, page_type: str,
                 original_html: str | None = None):
        self.snapshot = snapshot
        self.page_type = page_type
        self._original_html = original_html

    @classmethod
    def from_html(cls, content: str, char_threshold=_UNSET,
                  nb_top_candidates=_UNSET, forced_page_type=None,
                  url: str | None = None, parser=None) -> "Readable":
        """reference src/readable.ts:100-172."""
        ensure_recursion_headroom()
        text_cache_clear()
        parse = parser or parse_html
        doc = _wrap_fragment(parse(content))
        preprocess_document(doc)
        text_cache_clear()

        nb_top = (DEFAULT_N_TOP_CANDIDATES if nb_top_candidates is _UNSET
                  else nb_top_candidates)
        candidates = find_main_candidates(doc, nb_top)

        threshold = (DEFAULT_CHAR_THRESHOLD if char_threshold is _UNSET
                     else char_threshold)
        page_type = forced_page_type if forced_page_type is not None else \
            classify_page_type(doc, candidates, threshold)

        root = None
        if page_type == PAGE_TYPE_ARTICLE and candidates:
            top = candidates[0]
            if is_probably_content(top):
                root = top

        metadata = PageMetadata(
            title=get_article_title(doc) or "",
            lang=get_article_lang(doc) or None,
            site_name=get_article_site_name(doc) or None,
            url=doc.document_uri or url or "")
        links = extract_links(doc)
        node_count = count_nodes(root) if root else 0
        main_candidates = [(el, el.score or 0) for el in candidates]
        aria_tree = build_aria_tree(doc)

        snapshot = ExtractedSnapshot(
            root=root, node_count=node_count, links=links, metadata=metadata,
            main_candidates=main_candidates, aria_tree=aria_tree,
            page_type=page_type)
        return cls(snapshot, page_type, original_html=content)

    def to_markdown(self) -> str:
        return to_markdown(self.snapshot.root)

    def get_aria_tree(self):
        return self.snapshot.aria_tree

    def infer_page_type(self) -> str:
        return self.page_type

    def get_link_hierarchy(self):
        return analyze_link_hierarchy(self.snapshot.links,
                                      self.snapshot.metadata)

    def serialize(self) -> str:
        from .serializer import serialize
        return serialize(self.snapshot, self.page_type)

    @classmethod
    def load(cls, json_string: str) -> "Readable":
        from .serializer import deserialize
        snapshot, page_type = deserialize(json_string)
        return cls(snapshot, page_type)

    def get_page_structure(self, doc_mode: bool = False):
        if self._original_html is None:
            raise ValueError(
                "Page structure analysis requires the original HTML content.")
        from .detect import analyze_page_structure
        return analyze_page_structure(self._original_html, doc_mode=doc_mode)


def readable(content: str, **options) -> Readable:
    """reference src/readable.ts:286-288."""
    return Readable.from_html(content, **options)
