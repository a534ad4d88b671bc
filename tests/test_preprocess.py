"""Port of reference src/extract/preprocess.test.ts (CI-included)."""

from readability_ray.format import to_html
from readability_ray.parser import parse_html
from readability_ray.preprocess import preprocess_document
from readability_ray.vdom import get_elements_by_tag_name


def test_removes_script_tags():
    html = """
      <html>
        <body>
          <h1>Title</h1>
          <p>Some content.</p>
          <script>alert('Hello');</script>
          <p>More content.</p>
          <script src="script.js"></script>
        </body>
      </html>
    """
    doc = parse_html(html)
    preprocess_document(doc)
    assert len(get_elements_by_tag_name(doc.body, "script")) == 0
    assert len(get_elements_by_tag_name(doc.body, "p")) == 2


def test_removes_style_tags():
    html = """
      <html>
        <head>
          <style>body { background: red; }</style>
        </head>
        <body>
          <h1>Title</h1>
          <style>.content { color: blue; }</style>
          <p>Some content.</p>
        </body>
      </html>
    """
    doc = parse_html(html)
    preprocess_document(doc)
    assert len(get_elements_by_tag_name(doc.document_element, "style")) == 0
    assert len(get_elements_by_tag_name(doc.body, "style")) == 0
    assert len(get_elements_by_tag_name(doc.body, "p")) == 1
    assert len(get_elements_by_tag_name(doc.body, "h1")) == 1


def test_removes_both_script_and_style():
    html = """
      <html>
        <body>
          <style>h1 { font-size: 2em; }</style>
          <h1>Title</h1>
          <script>console.log('Logging');</script>
          <p>Content between tags.</p>
          <script src="another.js"></script>
          <style>.footer { text-align: center; }</style>
        </body>
      </html>
    """
    doc = parse_html(html)
    preprocess_document(doc)
    assert len(get_elements_by_tag_name(doc.body, "script")) == 0
    assert len(get_elements_by_tag_name(doc.body, "style")) == 0
    assert len(get_elements_by_tag_name(doc.body, "h1")) == 1
    assert len(get_elements_by_tag_name(doc.body, "p")) == 1


def test_preserves_content_without_noise():
    html = """
      <html>
        <body>
          <h1>Main Title</h1>
          <p>This is the first paragraph.</p>
          <div><p>Nested paragraph.</p></div>
        </body>
      </html>
    """
    doc = parse_html(html)
    original_body_html = to_html(doc.body)
    preprocess_document(doc)
    assert len(get_elements_by_tag_name(doc.body, "script")) == 0
    assert len(get_elements_by_tag_name(doc.body, "style")) == 0
    assert to_html(doc.body) == original_body_html
    assert len(get_elements_by_tag_name(doc.body, "h1")) == 1
    assert len(get_elements_by_tag_name(doc.document_element, "p")) == 2
