"""findStructuralElements / extractAriaTree / createExtractor
(reference src/extract/extract.ts:102-289,717-772,866-890)."""

from readability_ray.extract import (
    create_extractor, extract_aria_tree, find_structural_elements,
    is_semantic_tag, is_significant_node,
)
from readability_ray.parser import parse_html
from tests.helpers import el


STRUCT_HTML = """
<html><body>
  <header id="page-header" role="banner"><h1>Website Title</h1></header>
  <main>
    <p>Long enough paragraph of content text for the significance checks
    to pass easily, with punctuation, density and length to spare.</p>
  </main>
  <aside>Related links</aside>
  <footer id="page-footer" role="contentinfo"><p>Copyright Info</p></footer>
</body></html>
"""


def test_find_structural_elements():
    doc = parse_html(STRUCT_HTML)
    result = find_structural_elements(doc)
    assert result["header"] is not None and result["header"].tag == "header"
    assert result["footer"] is not None and result["footer"].tag == "footer"
    tags = [n.tag for n in result["otherSignificantNodes"]]
    assert "main" in tags


def test_header_footer_by_class():
    html = """<html><body>
      <div class="site-header"><h1>Site</h1></div>
      <div><p>content paragraph with enough text to matter here</p></div>
      <div class="footer-area"><p>foot</p></div>
    </body></html>"""
    doc = parse_html(html)
    result = find_structural_elements(doc)
    assert result["header"] is not None
    assert result["header"].class_name == "site-header"
    assert result["footer"] is not None
    assert result["footer"].class_name == "footer-area"


def test_is_semantic_tag():
    assert is_semantic_tag("main") and is_semantic_tag("ARTICLE")
    assert not is_semantic_tag("div")


def test_is_significant_node():
    long_p = el("div", None, [
        "x" * 80 + " more text with enough characters for significance"])
    assert is_significant_node(long_p) is True
    assert is_significant_node(el("div", None, ["short"])) is False


def test_extract_aria_tree_compressed_vs_raw():
    html = ("<html><body><main><article><h1>T</h1><p>text</p>"
            "</article></main></body></html>")
    compressed = extract_aria_tree(html)
    raw = extract_aria_tree(html, compress=False)
    assert compressed["nodeCount"] >= 1
    assert raw["nodeCount"] >= compressed["nodeCount"]
    assert raw["root"]["type"] == "generic"  # body


def test_create_extractor():
    configured = create_extractor(parse_html, forced_page_type="article")
    snap = configured("<body><article><h1>T</h1><p>words and text here, "
                      "plenty of content in this paragraph</p></article>"
                      "</body>", char_threshold=50)
    assert snap.page_type == "article"
    assert snap.root is not None
