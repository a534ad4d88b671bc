"""Port of reference src/nav/hierarchy.test.ts — the cases consistent
with the implementation.  (The "correctly categorize links" case in the
reference asserts behaviors the code does not have — empty-href links
kept, fragment links dropped — and cannot pass against hierarchy.ts
itself; the code's actual semantics are covered in test_readable.py.)"""

from readability_ray.extract import LinkInfo, PageMetadata
from readability_ray.hierarchy import analyze_link_hierarchy


def link(href, text=""):
    return LinkInfo(None, 0, text, href)


META = PageMetadata(title="Test Page",
                    url="https://example.com/articles/tech/web-development")


def test_empty_analysis_on_missing_metadata():
    links = [link("/articles/tech/other")]
    for meta in (None, PageMetadata(title="No URL", url="")):
        analysis = analyze_link_hierarchy(links, meta)
        assert analysis.parent == [] and analysis.sibling == []
        assert analysis.child == [] and analysis.external == []
        assert analysis.scores == {}


def test_empty_analysis_on_missing_links():
    for links in (None, []):
        analysis = analyze_link_hierarchy(links, META)
        assert analysis.parent == [] and analysis.child == []


def test_relative_resolution_categories():
    links = [
        link("https://example.com/articles/tech"),               # parent
        link("../"),                                             # parent
        link("https://example.com/articles/tech/security"),      # sibling
        link("mobile-apps"),                                     # sibling
        link("https://example.com/articles/tech/web-development/details"),  # child
        link("https://othersite.com/page"),                      # external
        link("//anotherdomain.net/resource"),                    # external
        link("mailto:test@example.com"),                         # external
        link("https://example.com/articles/tech/web-development"),  # self
    ]
    result = analyze_link_hierarchy(links, META)
    assert [l.href for l in result.parent] == [
        "https://example.com/articles/tech", "../"]
    assert [l.href for l in result.sibling] == [
        "https://example.com/articles/tech/security", "mobile-apps"]
    assert [l.href for l in result.child] == [
        "https://example.com/articles/tech/web-development/details"]
    assert [l.href for l in result.external] == [
        "https://othersite.com/page", "//anotherdomain.net/resource",
        "mailto:test@example.com"]


def test_trailing_slashes():
    meta = PageMetadata(title="t", url="https://example.com/articles/tech/")
    links = [
        link("https://example.com/articles/tech/security"),
        link("security"),
        link("../"),
        link("/articles/"),
        link("https://example.com/articles/"),
    ]
    result = analyze_link_hierarchy(links, meta)
    assert len(result.sibling) == 0
    assert len(result.parent) == 3
    assert len(result.child) == 2
    assert len(result.external) == 0


def test_root_url():
    meta = PageMetadata(title="t", url="https://example.com/")
    links = [
        link("/about"), link("contact"),
        link("https://example.com/products"),
        link("/"), link("https://othersite.com"),
    ]
    result = analyze_link_hierarchy(links, meta)
    assert len(result.child) == 3
    assert len(result.parent) == 0
    assert len(result.sibling) == 0
    assert len(result.external) == 1


def test_invalid_urls_ignored():
    links = [link("http://[invalid]"), link("valid/path")]
    result = analyze_link_hierarchy(links, META)
    assert len(result.child) == 1
    assert result.child[0].href == "valid/path"
    assert result.parent == [] and result.sibling == [] \
        and result.external == []
