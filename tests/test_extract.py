"""Port of reference src/extract/extract.test.ts (CI-included)."""

from readability_ray.extract import extract, is_probably_content
from readability_ray.parser import parse_html
from readability_ray.vdom import ELEMENT
from tests.helpers import el

BASIC_HTML = """
<html>
  <head>
    <title>Test Page</title>
  </head>
  <body>
    <div id="content">
      <h1>Test Article Title</h1>
      <p class="byline">Author: Test Taro</p>
      <p>This is the body of the test article. Used for Readability testing.</p>
      <p>A paragraph with sufficient length of text is required. This paragraph should be detected as the main content.
      In actual articles, it is common to have several such long paragraphs.
      Text length is an important factor in the scoring algorithm.</p>
    </div>
  </body>
</html>
"""

SHORT_TEXT_HTML = """
<html>
  <body>
    <h1>Too Short</h1>
    <p>This is way too short to be an article.</p>
  </body>
</html>
"""

SEMANTIC_HTML = """
<html>
  <head>
    <title>Semantic Tag Test</title>
  </head>
  <body>
    <header>
      <h1>Website Header</h1>
      <nav>
        <ul>
          <li><a href="#">Home</a></li>
          <li><a href="#">About</a></li>
        </ul>
      </nav>
    </header>
    <main>
      <article>
        <h1>Article Title</h1>
        <p>This is the body of the article. Using semantic tags.</p>
        <p>This paragraph is inside the article tag and should be detected as the main content.
        Having sufficient length of text allows the scoring algorithm to
        recognize it as important content.</p>
      </article>
    </main>
    <footer>
      <p>Copyright 2025</p>
    </footer>
  </body>
</html>
"""

COMPLEX_HTML = """
<html>
  <head>
    <title>Complex Layout</title>
  </head>
  <body>
    <header class="site-header">
      <h1>News Site</h1>
      <nav>Menu items go here</nav>
    </header>
    <div class="container">
      <div class="sidebar">
        <div class="widget">
          <h3>Related Articles</h3>
          <ul>
            <li><a href="#">Article 1</a></li>
            <li><a href="#">Article 2</a></li>
          </ul>
        </div>
      </div>
      <div class="content">
        <h1>Main Content Title</h1>
        <div class="meta">
          <span class="author">Author: Content Creator</span>
          <span class="date">March 25, 2025</span>
        </div>
        <p>This is the first paragraph of the main content. This part should be detected as the main content.</p>
        <p>This is the second paragraph. Having sufficient length of text allows the scoring algorithm to
        recognize it as important content. In actual articles, it is common to have several such long paragraphs.
        Text length is an important factor in the scoring algorithm.</p>
        <p>There is also a third paragraph. Having multiple paragraphs increases the score of this div element.</p>
      </div>
      <div class="comments">
        <h3>Comments</h3>
        <div class="comment">
          <p>This is a comment on the article. It might be a long comment, but it's not the main content.
          The comment section should usually be excluded from the main content.</p>
        </div>
      </div>
    </div>
    <footer>
      <p>Footer information goes here</p>
    </footer>
  </body>
</html>
"""

HIGH_LINK_DENSITY_HTML = """
<html>
  <body>
    <div class="navigation">
      <a href="#">Link 1</a>
      <a href="#">Link 2</a>
      <a href="#">Link 3</a>
      <a href="#">Link 4</a>
      <a href="#">Link 5</a>
      <span>Just a little text</span>
    </div>
    <div class="content">
      <p>This is the main content. There are almost no links.</p>
      <p>A paragraph with sufficient length of text is required. This paragraph should be detected as the main content.
      In actual articles, it is common to have several such long paragraphs.
      Text length is an important factor in the scoring algorithm.</p>
      <a href="#">Reference Link</a>
    </div>
  </body>
</html>
"""

NO_MAIN_CONTENT_HTML = """
<html>
  <head>
    <title>No Main Content</title>
  </head>
  <body>
    <div class="header-class">
      <h1>Site Header</h1>
    </div>
    <p>Some random text, but not enough.</p>
    <div class="footer-class">
      <p>Footer Text</p>
    </div>
  </body>
</html>
"""


def test_is_probably_content():
    long_text = """This is a paragraph with sufficient length of text. This paragraph should be detected as the main content.
    In actual articles, it is common to have several such long paragraphs.
    Text length is an important factor in the scoring algorithm.
    This paragraph is over 140 characters long and has low link density, so it should be detected as content."""
    long_paragraph = el("p", {"class": "content"}, [long_text])
    assert is_probably_content(long_paragraph) is True

    header = el("h1", None, ["Short header text"])
    assert is_probably_content(header) is False


def test_is_probably_content_high_link_density():
    doc = parse_html(HIGH_LINK_DENSITY_HTML)
    navigation = next(
        (c for c in doc.body.children
         if c.nodeType == ELEMENT and c.class_name == "navigation"), None)
    content = next(
        (c for c in doc.body.children
         if c.nodeType == ELEMENT and c.class_name == "content"), None)
    assert navigation is not None and content is not None
    assert is_probably_content(navigation) is False
    assert is_probably_content(content) is True


def test_extract_basic_html():
    result = extract(BASIC_HTML, char_threshold=100)
    assert result.root is not None
    assert result.node_count > 0
    content_text = "".join(
        "".join(t.text for t in p.children if t.nodeType != ELEMENT)
        for p in result.root.children
        if p.nodeType == ELEMENT and p.tag == "p")
    assert "This is the body of the test article" in content_text


def test_extract_semantic_tags():
    result = extract(SEMANTIC_HTML, char_threshold=100)
    assert result.root is not None
    assert result.node_count > 0
    is_article_or_contains = (
        result.root.tag == "article"
        or any(c.nodeType == ELEMENT and c.tag == "article"
               for c in result.root.children))
    assert is_article_or_contains


def test_extract_complex_html():
    result = extract(COMPLEX_HTML)
    assert result.root is not None
    assert result.node_count > 0
    content_or_parent = (
        result.root.class_name == "content"
        or any(c.nodeType == ELEMENT and c.class_name == "content"
               for c in result.root.children))
    assert content_or_parent


def test_extract_short_text_is_other():
    result = extract(SHORT_TEXT_HTML, char_threshold=500)
    assert result.root is None
    assert result.node_count == 0


def test_extract_no_main_content():
    result = extract(NO_MAIN_CONTENT_HTML, char_threshold=500)
    assert result.root is None
    assert result.node_count == 0
