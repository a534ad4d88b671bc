"""Port of reference src/classify/classify.test.ts +
classify-functions.test.ts (CI-included)."""

from readability_ray.classify import (
    analyze_content_characteristics, analyze_url_pattern, classify,
    classify_snapshot, get_expected_page_type_by_url,
)
from readability_ray.extract import (
    PAGE_TYPE_ARTICLE, PAGE_TYPE_OTHER, extract, find_main_candidates,
)
from readability_ray.parser import parse_html
from tests.helpers import el
from tests.test_extract import (
    BASIC_HTML, COMPLEX_HTML, NO_MAIN_CONTENT_HTML, SEMANTIC_HTML,
    SHORT_TEXT_HTML,
)

SHORT_ARTICLE_WITH_STRUCTURE_HTML = """
<html>
  <head>
    <title>Short Article Test</title>
  </head>
  <body>
    <header id="page-header" role="banner">
      <h1>Website Title</h1>
      <nav>Menu</nav>
    </header>
    <main>
      <article>
        <h1>Short Article</h1>
        <p>This content is too short to pass the threshold.</p>
      </article>
    </main>
    <aside>Related links</aside>
    <footer id="page-footer" role="contentinfo">
      <p>Copyright Info</p>
    </footer>
  </body>
</html>
"""


def _classify(html, threshold=None):
    doc = parse_html(html)
    candidates = find_main_candidates(doc)
    if threshold is None:
        return classify(doc, candidates)
    return classify(doc, candidates, threshold)


def test_basic_html_is_article():
    assert _classify(BASIC_HTML, 100) == PAGE_TYPE_ARTICLE


def test_semantic_html_is_article():
    assert _classify(SEMANTIC_HTML, 100) == PAGE_TYPE_ARTICLE


def test_complex_html_is_article():
    assert _classify(COMPLEX_HTML) == PAGE_TYPE_ARTICLE


def test_short_text_is_other():
    assert _classify(SHORT_TEXT_HTML, 500) == PAGE_TYPE_OTHER


def test_short_article_with_structure_is_other():
    assert _classify(SHORT_ARTICLE_WITH_STRUCTURE_HTML, 500) == PAGE_TYPE_OTHER


def test_no_main_content_is_other():
    assert _classify(NO_MAIN_CONTENT_HTML, 500) == PAGE_TYPE_OTHER


def test_url_articles_path():
    assert get_expected_page_type_by_url(
        "https://example.com/articles/test") == PAGE_TYPE_ARTICLE
    assert get_expected_page_type_by_url(
        "https://blog.com/2024/articles/post") == PAGE_TYPE_ARTICLE


def test_url_deep_paths():
    assert get_expected_page_type_by_url(
        "https://example.com/blog/2024/my-post") == PAGE_TYPE_ARTICLE
    assert get_expected_page_type_by_url(
        "https://site.com/category/subcategory/item") == PAGE_TYPE_ARTICLE


def test_url_numeric_ids():
    assert get_expected_page_type_by_url(
        "https://example.com/posts/12345") == PAGE_TYPE_ARTICLE
    assert get_expected_page_type_by_url(
        "https://blog.com/p/123456789") == PAGE_TYPE_ARTICLE


def test_url_alnum_ids():
    assert get_expected_page_type_by_url(
        "https://example.com/post/abc123def") == PAGE_TYPE_ARTICLE
    assert get_expected_page_type_by_url(
        "https://site.com/entry/a1b2c3d4e5") == PAGE_TYPE_ARTICLE


def test_url_uuid_like():
    assert get_expected_page_type_by_url(
        "https://example.com/post/550e8400-e29b-41d4-a716-446655440000"
    ) == PAGE_TYPE_ARTICLE
    assert get_expected_page_type_by_url(
        "https://site.com/entry/abc-def-123") == PAGE_TYPE_ARTICLE


def test_url_short_paths_are_other():
    assert get_expected_page_type_by_url("https://example.com/") == \
        PAGE_TYPE_OTHER
    assert get_expected_page_type_by_url("https://example.com/about") == \
        PAGE_TYPE_OTHER
    assert get_expected_page_type_by_url("https://example.com/blog") == \
        PAGE_TYPE_OTHER


def test_url_extensions():
    assert get_expected_page_type_by_url(
        "https://example.com/posts/12345.html") == PAGE_TYPE_ARTICLE
    assert get_expected_page_type_by_url(
        "https://blog.com/entry/abc123.php") == PAGE_TYPE_ARTICLE


def test_analyze_url_pattern():
    assert analyze_url_pattern("https://example.com/") == "末尾なし"
    assert analyze_url_pattern("https://example.com/posts/12345") == \
        "数字のみ (12345)"
    assert analyze_url_pattern("https://example.com/post/abc123def") == \
        "英数字混合 (abc123def)"
    assert analyze_url_pattern("https://example.com/about/contact") == \
        "英字のみ (contact)"
    assert analyze_url_pattern("https://example.com/日本語") == "その他 (日本語)"
    assert analyze_url_pattern("https://example.com/posts/12345.html") == \
        "数字のみ (12345)"
    assert analyze_url_pattern("https://example.com/entry/abc123.php") == \
        "英数字混合 (abc123)"
    assert analyze_url_pattern("https://example.com/page.aspx") == \
        "英字のみ (page)"
    assert analyze_url_pattern("https://example.com/post/my-article-title") \
        == "英字のみ (my-article-title)"
    assert analyze_url_pattern("https://example.com/posts/article_123") == \
        "英数字混合 (article_123)"
    assert analyze_url_pattern(
        "https://example.com/550e8400-e29b-41d4-a716") == \
        "英数字混合 (550e8400-e29b-41d4-a716)"


def test_analyze_content_characteristics_no_candidates():
    doc = parse_html("<html><body></body></html>")
    result = analyze_content_characteristics(doc, [])
    assert result["pageType"] == PAGE_TYPE_OTHER
    assert any("no content candidates" in r for r in result["reasons"])


def test_analyze_content_characteristics_semantic():
    doc = parse_html("<html><body></body></html>")
    candidate = el("article", None, ["A" * 300])
    result = analyze_content_characteristics(doc, [candidate])
    assert any("semantic" in r for r in result["reasons"])


def test_classify_snapshot_sorted_by_possibility():
    snap = extract(BASIC_HTML, char_threshold=100)
    results = classify_snapshot(snap)
    assert len(results) == 2
    assert results[0].possibility >= results[1].possibility
    total = results[0].possibility + results[1].possibility
    assert abs(total - 1.0) < 1e-9


def test_classify_snapshot_no_root():
    snap = extract(SHORT_TEXT_HTML, char_threshold=500)
    results = classify_snapshot(snap)
    assert len(results) == 1
    assert results[0].page_type == PAGE_TYPE_OTHER
    assert results[0].possibility == 1.0
