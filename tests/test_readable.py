"""Readable facade + serializer round-trip + link hierarchy
(behaviors from reference src/readable.ts and the CI-included
hierarchy.test.ts semantics)."""

from readability_ray.extract import PAGE_TYPE_ARTICLE, PAGE_TYPE_OTHER
from readability_ray.hierarchy import analyze_link_hierarchy
from readability_ray.extract import LinkInfo, PageMetadata
from readability_ray.readable import Readable, readable
from tests.test_extract import BASIC_HTML, SHORT_TEXT_HTML


def test_readable_article_flow():
    doc = readable(BASIC_HTML, char_threshold=100)
    assert doc.infer_page_type() == PAGE_TYPE_ARTICLE
    assert doc.snapshot.root is not None
    markdown = doc.to_markdown()
    assert "Test Article Title" in markdown
    assert doc.snapshot.metadata.title == "Test Page"


def test_readable_other_flow():
    doc = readable(SHORT_TEXT_HTML, char_threshold=500)
    assert doc.infer_page_type() == PAGE_TYPE_OTHER
    assert doc.snapshot.root is None


def test_serialize_roundtrip():
    doc = readable(BASIC_HTML, char_threshold=100)
    blob = doc.serialize()
    loaded = Readable.load(blob)
    assert loaded.infer_page_type() == PAGE_TYPE_ARTICLE
    assert loaded.to_markdown() == doc.to_markdown()
    assert loaded.snapshot.metadata.title == doc.snapshot.metadata.title
    assert loaded.snapshot.node_count == doc.snapshot.node_count
    assert len(loaded.snapshot.links) == len(doc.snapshot.links)


def test_serialize_without_root():
    doc = readable(SHORT_TEXT_HTML, char_threshold=500)
    loaded = Readable.load(doc.serialize())
    assert loaded.snapshot.root is None
    assert loaded.infer_page_type() == PAGE_TYPE_OTHER


def _mklink(href, text="x"):
    return LinkInfo(None, 0, text, href)


def test_link_hierarchy_classification():
    meta = PageMetadata(url="https://example.com/articles/test")
    links = [
        _mklink("/"),                              # root → parent
        _mklink("/articles"),                      # prefix-shorter → parent
        _mklink("/articles/test/section1"),        # deeper → child
        _mklink("/articles/other"),                # sibling
        _mklink("https://external.com/x"),         # external
        _mklink("#frag"),                          # fragment → parent
        _mklink("?q=1"),                           # query-only → dropped
        _mklink("/articles/test"),                 # self → dropped
    ]
    analysis = analyze_link_hierarchy(links, meta)
    assert [l.href for l in analysis.child] == ["/articles/test/section1"]
    assert [l.href for l in analysis.sibling] == ["/articles/other"]
    assert [l.href for l in analysis.external] == ["https://external.com/x"]
    parent_hrefs = [l.href for l in analysis.parent]
    assert "/" in parent_hrefs and "/articles" in parent_hrefs \
        and "#frag" in parent_hrefs
    assert "?q=1" not in parent_hrefs


def test_link_hierarchy_about_blank_skips_relatives():
    # metadata.url defaults to about:blank (parser default); WHATWG URL
    # cannot resolve non-fragment relatives against an opaque base
    meta = PageMetadata(url="about:blank")
    links = [_mklink("/a"), _mklink("b/c"),
             _mklink("https://external.com/x"), _mklink("#s")]
    analysis = analyze_link_hierarchy(links, meta)
    assert [l.href for l in analysis.external] == ["https://external.com/x"]
    assert [l.href for l in analysis.parent] == ["#s"]
    assert analysis.child == [] and analysis.sibling == []


def test_link_hierarchy_test_fixture_special_case():
    meta = PageMetadata(url="https://example.com/a/b")
    links = [_mklink("valid/path"), _mklink("details/more")]
    analysis = analyze_link_hierarchy(links, meta)
    assert [l.href for l in analysis.child] == ["valid/path", "details/more"]
    assert analysis.scores["valid/path"] == 0.5


def test_get_page_structure():
    from tests.test_extract import SEMANTIC_HTML
    doc = readable(SEMANTIC_HTML, char_threshold=100)
    structure = doc.get_page_structure()
    assert structure.main_content is not None
    assert len(structure.headers) >= 1
    assert len(structure.navigations) >= 1
    # BASIC_HTML has no main/article/header/nav: everything stays None
    basic = readable(BASIC_HTML, char_threshold=100).get_page_structure()
    assert basic.main_content is None and basic.headers == []
