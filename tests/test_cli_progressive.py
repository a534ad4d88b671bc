"""Port of reference src/cli-progressive.test.ts (CI-included):
progressive analysis CLI options."""

import json
import subprocess
import sys

import pytest

TEST_HTML = """
<!DOCTYPE html>
<html>
  <head><title>Test Article</title></head>
  <body>
    <header>
      <nav class="main-nav">
        <a href="/">Home</a>
        <a href="/about">About</a>
        <a href="/blog">Blog</a>
      </nav>
    </header>
    <nav class="breadcrumb">
      <a href="/">Home</a>
      <span>></span>
      <a href="/blog">Blog</a>
      <span>></span>
      <span>Test Article</span>
    </nav>
    <main>
      <article>
        <h1>Test Article Title</h1>
        <p>This is the introduction paragraph with enough content to ensure proper extraction.
           We need to have sufficient text to pass the character threshold that the readability
           algorithm uses to determine if content is worth extracting. This helps ensure that
           our test cases work properly with the default settings.</p>
        <nav class="toc">
          <h2>Table of Contents</h2>
          <ul>
            <li><a href="#section1">Section 1</a></li>
            <li><a href="#section2">Section 2</a></li>
          </ul>
        </nav>
        <h2 id="section1">Section 1</h2>
        <p>Content of section 1 with additional text to ensure we have enough content.
           This paragraph contains multiple sentences to help reach the character threshold
           required for extraction. We want to make sure the content is substantial enough
           to be considered meaningful by the extraction algorithm.</p>
        <h2 id="section2">Section 2</h2>
        <p>Content of section 2 also needs to be longer to contribute to the overall
           character count. This ensures that our test content is realistic and will
           be properly extracted by the readability algorithm. Having multiple paragraphs
           with substantial content helps test the full functionality.</p>
      </article>
    </main>
    <aside class="sidebar">
      <h3>Related Articles</h3>
      <ul>
        <li><a href="/article1">Article 1</a></li>
        <li><a href="/article2">Article 2</a></li>
      </ul>
    </aside>
    <footer>
      <p>&copy; 2024 Test Site</p>
    </footer>
  </body>
</html>
"""


@pytest.fixture(scope="module")
def html_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("prog") / "page.html"
    path.write_text(TEST_HTML)
    return str(path)


def run_cli(*argv):
    result = subprocess.run(
        [sys.executable, "-m", "readability_ray.cli", *argv],
        capture_output=True, text=True, cwd="/root/repo")
    assert result.returncode == 0, result.stderr
    return result.stdout


def test_analyze_structure(html_file):
    analysis = json.loads(run_cli("--analyze-structure", html_file))
    assert analysis["url"] == html_file
    assert analysis["pageType"] == "article"
    assert analysis["hasMainContent"] is True
    assert analysis["navigations"]["global"] is True
    assert analysis["navigations"]["breadcrumb"] is True
    assert analysis["navigations"]["toc"] is True
    assert analysis["navigations"]["sidebar"] is False
    assert analysis["contentAreas"]["header"] is True
    assert analysis["contentAreas"]["mainContent"] is True
    assert analysis["contentAreas"]["sidebar"] is True
    assert analysis["contentAreas"]["footer"] is True
    assert analysis["stats"]["navigationCount"] > 2
    assert analysis["stats"]["headerCount"] > 0


def test_extract_nav(html_file):
    result = json.loads(run_cli("--extract-nav", html_file))
    assert result["url"] == html_file
    assert len(result["navigations"]) > 2
    nav_types = [n["type"] for n in result["navigations"]]
    assert "global" in nav_types
    assert "breadcrumb" in nav_types
    assert "toc" in nav_types


def test_nav_only_backward_compat(html_file):
    nav_only = json.loads(run_cli("--nav-only", html_file))
    extract_nav = json.loads(run_cli("--extract-nav", html_file))
    assert len(nav_only["navigations"]) == len(extract_nav["navigations"])


def test_extract_content_with_context(html_file):
    result = json.loads(run_cli("--extract-content", "--with-context",
                                html_file))
    assert result["url"] == html_file
    assert "Test Article" in result["title"]
    assert "Test Article Title" in result["content"]
    assert "Home" in result["context"]["breadcrumb"]
    assert "Blog" in result["context"]["breadcrumb"]
    assert result["context"]["section"] == "main"
    assert len(result["context"]["surroundingNavigation"]) > 0


def test_extract_content_plain(html_file):
    stdout = run_cli("--extract-content", html_file)
    with pytest.raises(json.JSONDecodeError):
        json.loads(stdout)
    assert "Test Article Title" in stdout
    assert "Section 1" in stdout


def test_full_analysis(html_file):
    result = json.loads(run_cli("--full-analysis", html_file))
    assert result["url"] == html_file
    assert result["structure"]["pageType"] == "article"
    assert result["structure"]["navigations"]
    assert result["structure"]["contentAreas"]
    assert result["navigation"]["breadcrumb"]
    assert result["navigation"]["tableOfContents"]
    assert "Test Article Title" in result["content"]["main"]
    assert "Test Article" in result["metadata"]["title"]


def test_ai_summary(html_file):
    result = json.loads(run_cli("-f", "ai-summary", html_file))
    assert result["url"] == html_file
    assert result["type"] in ("article", "other", "documentation")
    assert "Test Article" in result["title"]
    assert len(result["summary"]) < 250
    assert "Home" in result["navigationSummary"]["breadcrumb"]
    assert result["navigationSummary"]["hasTableOfContents"] is True
    assert result["navigationSummary"]["hasSidebar"] is True
    assert result["contentStats"]["wordCount"] > 0
    assert result["contentStats"]["hasCode"] is False


def test_ai_structured(html_file):
    result = json.loads(run_cli("-f", "ai-structured", html_file))
    assert result["structure"]["navigation"]["types"]
    types = result["structure"]["navigation"]["types"]
    assert "global" in types
    assert "breadcrumb" in types
    assert "toc" in types
    assert result["structure"]["content"]["main"]["present"] is True
