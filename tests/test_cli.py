"""Port of reference src/cli.test.ts (CI-included): doc mode, nav
filtering, file output — driven through the CLI entry."""

import json
import subprocess
import sys

import pytest

DOC_HTML = """
<!DOCTYPE html>
<html>
  <head><title>Test Documentation</title></head>
  <body>
    <header>
      <nav class="main-nav">
        <a href="/">Home</a>
        <a href="/docs">Docs</a>
        <a href="/api">API</a>
      </nav>
    </header>
    <nav class="breadcrumb">
      <a href="/">Home</a>
      <span>></span>
      <a href="/docs">Documentation</a>
      <span>></span>
      <span>Getting Started</span>
    </nav>
    <aside class="sidebar">
      <nav>
        <ul>
          <li><a href="/docs/intro">Introduction</a></li>
          <li class="current"><a href="/docs/getting-started">Getting Started</a></li>
          <li><a href="/docs/advanced">Advanced</a></li>
        </ul>
      </nav>
    </aside>
    <main>
      <h1>Getting Started</h1>
      <p>Welcome to our documentation!</p>
      <nav class="toc">
        <h2>Table of Contents</h2>
        <ul>
          <li><a href="#install">Installation</a></li>
          <li><a href="#usage">Usage</a></li>
          <li><a href="#examples">Examples</a></li>
        </ul>
      </nav>
      <h2 id="install">Installation</h2>
      <p>Install using npm:</p>
      <pre><code>npm install our-package</code></pre>
      <h2 id="usage">Usage</h2>
      <p>Import and use the package:</p>
      <pre><code>import { feature } from 'our-package';</code></pre>
      <h2 id="examples">Examples</h2>
      <p>Here are some examples...</p>
    </main>
    <nav class="pagination">
      <a href="/docs/intro">← Previous</a>
      <a href="/docs/advanced">Next →</a>
    </nav>
  </body>
</html>
"""

NAV_HTML = """
<!DOCTYPE html>
<html>
  <body>
    <header>
      <nav class="global-nav">
        <a href="/">Home</a>
        <a href="/products">Products</a>
        <a href="/about">About</a>
      </nav>
    </header>
    <nav class="breadcrumb">
      <a href="/">Home</a>
      <span>></span>
      <a href="/products">Products</a>
      <span>></span>
      <span>Widget</span>
    </nav>
    <aside>
      <nav class="sidebar-nav">
        <a href="/products/widgets">Widgets</a>
        <a href="/products/gadgets">Gadgets</a>
      </nav>
    </aside>
    <main>
      <h1>Product Page</h1>
      <p>Content here.</p>
    </main>
    <footer>
      <nav class="footer-nav">
        <a href="/privacy">Privacy</a>
        <a href="/terms">Terms</a>
      </nav>
    </footer>
  </body>
</html>
"""


@pytest.fixture(scope="module")
def doc_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "doc.html"
    path.write_text(DOC_HTML)
    return str(path)


@pytest.fixture(scope="module")
def nav_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "nav.html"
    path.write_text(NAV_HTML)
    return str(path)


def run_cli(*argv):
    result = subprocess.run(
        [sys.executable, "-m", "readability_ray.cli", *argv],
        capture_output=True, text=True, cwd="/root/repo")
    assert result.returncode == 0, result.stderr
    return result.stdout


def test_doc_mode(doc_file):
    stdout = run_cli("--doc-mode", doc_file)
    assert "**Breadcrumb:** Home > Documentation" in stdout
    assert "## Table of Contents" in stdout
    assert "- Installation (#install)" in stdout
    assert "- Usage (#usage)" in stdout
    assert "- Examples (#examples)" in stdout
    assert "## Sidebar Navigation" in stdout
    assert "- Introduction (/docs/intro)" in stdout
    assert "- Getting Started (/docs/getting-started) **[Current]**" in stdout
    assert "- Advanced (/docs/advanced)" in stdout
    assert "## Document Outline" in stdout
    assert "# Getting Started" in stdout
    assert "## Installation {#install}" in stdout
    assert "## Usage {#usage}" in stdout
    assert "## Examples {#examples}" in stdout
    assert "## Main Content" in stdout
    assert "Welcome to our documentation!" in stdout
    assert "Install using npm:" in stdout


def test_f_doc_format(doc_file):
    stdout = run_cli("-f", "doc", doc_file)
    assert "**Breadcrumb:** Home > Documentation" in stdout
    assert "## Table of Contents" in stdout
    assert "## Sidebar Navigation" in stdout
    assert "## Document Outline" in stdout
    assert "## Main Content" in stdout


def test_doc_mode_nav_location_filter(doc_file):
    stdout = run_cli("--doc-mode", "--nav-location", "sidebar", doc_file)
    assert "## Sidebar Navigation" in stdout
    assert "- Introduction (/docs/intro)" in stdout


def test_output_file(doc_file, tmp_path):
    out = tmp_path / "out.md"
    run_cli("--doc-mode", "-o", str(out), doc_file)
    content = out.read_text()
    assert "# Document Content" in content
    assert "**Breadcrumb:** Home > Documentation" in content


def test_simple_page_without_navigation(tmp_path):
    simple = tmp_path / "simple.html"
    simple.write_text("""
      <!DOCTYPE html>
      <html>
        <body>
          <main>
            <h1>Simple Page</h1>
            <p>This is a simple page without navigation.</p>
          </main>
        </body>
      </html>
    """)
    stdout = run_cli("--doc-mode", str(simple))
    assert "## Main Content" in stdout
    assert "Simple Page" in stdout
    assert "This is a simple page without navigation" in stdout
    assert "## Sidebar Navigation" not in stdout
    assert "## Table of Contents" not in stdout
    assert "**Breadcrumb:**" not in stdout


def test_nav_only_with_type_filter(nav_file):
    stdout = run_cli("--nav-only", "--nav-type", "global", nav_file)
    result = json.loads(stdout)
    assert len(result["navigations"]) == 1
    assert result["navigations"][0]["type"] == "global"
    assert len(result["navigations"][0]["items"]) == 3


def test_nav_only_with_location_filter(nav_file):
    stdout = run_cli("--nav-only", "--nav-location", "header", nav_file)
    result = json.loads(stdout)
    assert all(n["location"] == "header" for n in result["navigations"])


def test_nav_only_summary(nav_file):
    stdout = run_cli("--nav-only", nav_file)
    result = json.loads(stdout)
    assert len(result["navigations"]) > 2
    assert result["summary"]["total"] == len(result["navigations"])
    assert result["summary"]["byType"]
    assert result["summary"]["mainNavigation"] is not None
    assert result["summary"]["breadcrumb"] is not None


def test_default_markdown_output(doc_file):
    stdout = run_cli(doc_file)
    assert "Getting Started" in stdout


def test_html_format(doc_file):
    stdout = run_cli("-f", "html", doc_file)
    assert "<h1>" in stdout or stdout.strip() == ""
