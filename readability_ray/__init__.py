"""readability_ray — Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of mizchi/readability's capabilities
(reference at /root/reference, Apache-2.0) as streaming Ray Data
pipelines over zero-copy Arrow batches of Common-Crawl-style Parquet
pages, plus the large-scale training-data operators (dedup, similarity
search, text analysis) such a corpus pipeline needs.

Per-document API (mirror of the reference's library surface):
    extract, to_markdown, to_html, stringify, format_document,
    parse_html, build_aria_tree, aria_tree_to_string, ...

Corpus API (Ray Data): see readability_ray.pipelines / .stages /
.functions.
"""

from .extract import (
    ExtractedSnapshot, PageMetadata, classify_page_type, extract,
    extract_links, find_main_candidates, get_article_lang,
    get_article_site_name, get_article_title, is_probably_content,
    PAGE_TYPE_ARTICLE, PAGE_TYPE_OTHER,
)
from .format import (
    count_nodes, extract_text_content, format_document, stringify, to_html,
)
from .markdown import to_markdown
from .parser import parse_html, serialize_to_html
from .preprocess import preprocess_document
from .readable_aria import (
    aria_tree_to_string, build_aria_tree, to_readable_aria_tree,
)

__all__ = [
    "ExtractedSnapshot", "PageMetadata", "classify_page_type", "extract",
    "extract_links", "find_main_candidates", "get_article_lang",
    "get_article_site_name", "get_article_title", "is_probably_content",
    "PAGE_TYPE_ARTICLE", "PAGE_TYPE_OTHER", "count_nodes",
    "extract_text_content", "format_document", "stringify", "to_html",
    "to_markdown", "parse_html", "serialize_to_html", "preprocess_document",
    "aria_tree_to_string", "build_aria_tree", "to_readable_aria_tree",
]

__version__ = "0.1.0"

# second-tier API (imported lazily by consumers who need them):
from .classify import (  # noqa: E402
    analyze_content_characteristics, analyze_url_pattern, classify,
    classify_snapshot, get_expected_page_type_by_url,
)
from .extract import (  # noqa: E402
    create_extractor, extract_aria_tree, find_structural_elements,
)
from .hierarchy import analyze_link_hierarchy  # noqa: E402
from .readable import Readable, readable  # noqa: E402
from .serializer import deserialize, serialize  # noqa: E402

__all__ += [
    "analyze_content_characteristics", "analyze_url_pattern", "classify",
    "classify_snapshot", "get_expected_page_type_by_url",
    "create_extractor", "extract_aria_tree", "find_structural_elements",
    "analyze_link_hierarchy", "Readable", "readable", "deserialize",
    "serialize",
]
