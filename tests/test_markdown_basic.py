"""Port of reference src/format/markdown-basic.test.ts (CI-included)."""

from readability_ray.markdown import to_markdown
from tests.helpers import el, tx


def test_null_input():
    assert to_markdown(None) == ""


def test_simple_text():
    assert to_markdown(el("p", None, ["Hello, world!"])) == "Hello, world!"


def test_headings():
    assert to_markdown(el("h1", None, ["Title"])) == "# Title"
    prefixes = ["#", "##", "###", "####", "#####", "######"]
    for i, tag in enumerate(["h1", "h2", "h3", "h4", "h5", "h6"]):
        assert to_markdown(el(tag, None, ["Heading"])) == f"{prefixes[i]} Heading"


def test_bold_italic():
    assert to_markdown(el("strong", None, ["bold text"])) == "**bold text**"
    assert to_markdown(el("em", None, ["italic text"])) == "*italic text*"


def test_links():
    link = el("a", {"href": "https://example.com"}, ["Example"])
    assert to_markdown(link) == "[Example](https://example.com)"


def test_images():
    img = el("img", {"src": "image.jpg", "alt": "Description"})
    assert to_markdown(img) == "![Description](image.jpg)"


def test_inline_code():
    assert to_markdown(el("code", None, ["const x = 42;"])) == "`const x = 42;`"


def test_code_blocks():
    pre = el("pre", None, [
        el("code", None, ["function hello() {\n  return 'world';\n}"])])
    assert to_markdown(pre) == "```\nfunction hello() {\n  return 'world';\n}\n```"


def test_code_blocks_with_language():
    pre = el("pre", None, [
        el("code", {"class": "language-javascript"},
           ["console.log('hello');"])])
    assert to_markdown(pre) == "```javascript\nconsole.log('hello');\n```"


def test_unordered_lists():
    ul = el("ul", None, [el("li", None, ["Item 1"]), el("li", None, ["Item 2"])])
    assert to_markdown(ul) == "- Item 1\n- Item 2"


def test_ordered_lists():
    ol = el("ol", None, [el("li", None, ["First"]), el("li", None, ["Second"])])
    assert to_markdown(ol) == "1. First\n1. Second"


def test_blockquotes():
    bq = el("blockquote", None, [el("p", None, ["This is a quote"])])
    assert to_markdown(bq) == "> This is a quote"


def test_horizontal_rules():
    assert to_markdown(el("hr")) == "---"


def test_line_breaks():
    result = to_markdown(el("br"))
    assert "  " in result or result == ""


def test_escape_markdown_special_characters():
    p = el("p", None, ["Text with *asterisks* and _underscores_"])
    assert to_markdown(p) == "Text with \\*asterisks\\* and \\_underscores\\_"


def test_nested_elements():
    p = el("p", None, [
        "This is ", el("strong", None, ["bold"]), " and ",
        el("em", None, ["italic"]), " text."])
    assert to_markdown(p) == "This is **bold** and *italic* text."


def test_ignore_script_and_style():
    div = el("div", None, [
        el("script", None, ["console.log('ignored');"]),
        el("style", None, ["body { color: red; }"]),
        el("p", None, ["Visible text"])])
    assert to_markdown(div) == "Visible text"


def test_empty_paragraphs():
    assert to_markdown(el("p")) == ""


def test_inline_code_with_backticks():
    code = el("code", None, ["Use `code` here"])
    assert to_markdown(code) == "``Use `code` here``"


def test_complex_tables():
    table = el("table", None, [
        el("thead", None, [
            el("tr", None, [
                el("th", None, ["Header 1"]), el("th", None, ["Header 2"])])]),
        el("tbody", None, [
            el("tr", None, [
                el("td", None, ["Cell 1"]), el("td", None, ["Cell 2"])])])])
    assert to_markdown(table) == \
        "| Header 1 | Header 2 |\n| --- | --- |\n| Cell 1 | Cell 2 |"
