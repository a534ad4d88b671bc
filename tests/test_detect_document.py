"""Port of reference src/detect/document.test.ts (CI-included)."""

import re

from readability_ray.detect import (
    analyze_document_structure, extract_document_content,
)

SIDEBAR_DOC_HTML = """
<html>
  <body>
    <aside class="sidebar">
      <nav>
        <ul>
          <li><a href="/docs/intro">Introduction</a></li>
          <li><a href="/docs/getting-started">Getting Started</a></li>
          <li>
            <a href="/docs/api">API Reference</a>
            <ul>
              <li><a href="/docs/api/core">Core API</a></li>
              <li><a href="/docs/api/utils">Utilities</a></li>
            </ul>
          </li>
        </ul>
      </nav>
    </aside>
    <main>
      <h1>Documentation</h1>
      <p>Welcome to our documentation.</p>
    </main>
  </body>
</html>
"""


def test_sidebar_navigation():
    result = analyze_document_structure(SIDEBAR_DOC_HTML)
    assert result.sidebar_navigation is not None
    assert len(result.sidebar_navigation.items) >= 3
    assert result.sidebar_navigation.items[0].label == "Introduction"
    api_item = next((i for i in result.sidebar_navigation.items
                     if i.label == "API Reference"), None)
    assert api_item is not None
    assert len(api_item.children) == 2


def test_sections_hierarchy():
    html = """
      <html>
        <body>
          <main>
            <h1 id="intro">Introduction</h1>
            <p>This is the introduction.</p>
            <h2 id="overview">Overview</h2>
            <p>This is an overview.</p>
            <h3 id="features">Features</h3>
            <p>List of features.</p>
            <h2 id="installation">Installation</h2>
            <p>How to install.</p>
          </main>
        </body>
      </html>
    """
    result = analyze_document_structure(html)
    assert len(result.sections) == 1
    top = result.sections[0]
    assert top.title == "Introduction"
    assert top.id == "intro"
    assert len(top.children) == 2
    assert top.children[0].title == "Overview"
    assert len(top.children[0].children) == 1


def test_pagination_links():
    html = """
      <html>
        <body>
          <nav class="pagination">
            <a href="/page/1">← Previous</a>
            <a href="/page/3">Next →</a>
          </nav>
          <main>
            <h1>Page 2</h1>
            <p>Content of page 2.</p>
          </main>
        </body>
      </html>
    """
    result = analyze_document_structure(html)
    assert result.pagination is not None
    assert result.pagination["prev"]["label"] == "← Previous"
    assert result.pagination["prev"]["href"] == "/page/1"
    assert result.pagination["next"]["label"] == "Next →"
    assert result.pagination["next"]["href"] == "/page/3"


def test_doc_mode_prioritizes_toc():
    html = """
      <html>
        <body>
          <header>
            <nav class="global-nav">
              <a href="/">Home</a>
              <a href="/about">About</a>
            </nav>
          </header>
          <aside>
            <nav class="toc">
              <ul>
                <li><a href="#section1">Section 1</a></li>
                <li><a href="#section2">Section 2</a></li>
              </ul>
            </nav>
          </aside>
          <main>
            <h1>Document</h1>
            <h2 id="section1">Section 1</h2>
            <p>Content 1</p>
            <h2 id="section2">Section 2</h2>
            <p>Content 2</p>
          </main>
        </body>
      </html>
    """
    result = analyze_document_structure(html)
    assert len(result.navigations) > 0
    toc_nav = next((n for n in result.navigations if n.type == "toc"), None)
    assert toc_nav is not None
    assert result.toc is toc_nav


def test_extract_document_content_full():
    html = """
      <html>
        <body>
          <nav class="breadcrumb">
            <a href="/">Home</a>
            <span>></span>
            <a href="/docs">Docs</a>
            <span>></span>
            <span>API</span>
          </nav>
          <aside class="sidebar">
            <nav>
              <ul>
                <li><a href="/docs/intro">Introduction</a></li>
                <li class="current"><a href="/docs/api">API Reference</a></li>
                <li><a href="/docs/examples">Examples</a></li>
              </ul>
            </nav>
          </aside>
          <main>
            <h1>API Reference</h1>
            <p>Welcome to the API documentation.</p>
            <h2>Authentication</h2>
            <p>How to authenticate.</p>
            <h2>Endpoints</h2>
            <p>Available endpoints.</p>
          </main>
        </body>
      </html>
    """
    result = extract_document_content(html)
    assert re.search(r"Home.*Docs", result.breadcrumb or "")
    assert "- Introduction (/docs/intro)" in result.sidebar_nav
    assert "- API Reference (/docs/api) **[Current]**" in result.sidebar_nav
    assert "# API Reference" in result.outline
    assert "## Authentication" in result.outline
    assert "## Endpoints" in result.outline
    assert "Welcome to the API documentation" in result.content


def test_toc_markdown():
    html = """
      <html>
        <body>
          <aside>
            <nav class="toc">
              <h2>Table of Contents</h2>
              <ul>
                <li><a href="#intro">1. Introduction</a></li>
                <li>
                  <a href="#basics">2. Basics</a>
                  <ul>
                    <li><a href="#setup">2.1 Setup</a></li>
                    <li><a href="#config">2.2 Configuration</a></li>
                  </ul>
                </li>
                <li><a href="#advanced">3. Advanced Topics</a></li>
              </ul>
            </nav>
          </aside>
          <main>
            <h1 id="intro">Introduction</h1>
            <p>Getting started guide.</p>
          </main>
        </body>
      </html>
    """
    result = extract_document_content(html)
    assert result.toc is not None
    assert "- 1. Introduction (#intro)" in result.toc
    assert "- 2. Basics (#basics)" in result.toc
    assert "  - 2.1 Setup (#setup)" in result.toc
    assert "  - 2.2 Configuration (#config)" in result.toc
    assert "- 3. Advanced Topics (#advanced)" in result.toc


def test_markdown_formatting_and_breadcrumb():
    html = """
      <html>
        <body>
          <nav class="breadcrumb">
            <a href="/">Home</a>
            <span>></span>
            <a href="/guide">Guide</a>
          </nav>
          <main>
            <h1>User Guide</h1>
            <p>This is the user guide.</p>
            <h2>Getting Started</h2>
            <p>Start here.</p>
          </main>
        </body>
      </html>
    """
    result = extract_document_content(html)
    assert "User Guide\n" in result.content
    assert "This is the user guide" in result.content
    assert "Getting Started\n" in result.content
    assert "Start here" in result.content
    assert result.breadcrumb == "Home > Guide"
