"""Page-structure detection (reference src/detect/).

Two-phase rule: structure detection runs on the RAW HTML (un-preprocessed
DOM, uncompressed ARIA tree), while content extraction runs on the
preprocessed DOM (reference docs/architecture-decision.md:37-52).
"""

from .structure import (
    PageStructure, analyze_page_structure, find_footer, find_main_content,
    find_sidebar, prioritize_navigations,
)
from .header import HeaderInfo, detect_headers, detect_logo, detect_site_title
from .navigation import NavigationInfo, NavigationItem, detect_navigations
from .document import (
    DocumentContent, DocumentStructure, analyze_document_structure,
    extract_document_content,
)

__all__ = [
    "PageStructure", "analyze_page_structure", "find_footer",
    "find_main_content", "find_sidebar", "prioritize_navigations",
    "HeaderInfo", "detect_headers", "detect_logo", "detect_site_title",
    "NavigationInfo", "NavigationItem", "detect_navigations",
    "DocumentContent", "DocumentStructure", "analyze_document_structure",
    "extract_document_content",
]
