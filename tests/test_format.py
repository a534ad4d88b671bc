"""Tests for stringify / toHTML / formatDocument
(reference src/format/format.ts semantics)."""

from readability_ray.format import (
    count_nodes, escape_html, extract_text_content, format_document,
    stringify, to_html,
)
from readability_ray.parser import parse_html
from tests.helpers import el


def test_escape_html_is_mostly_identity():
    # verified against the reference source bytes: only NBSP and
    # apostrophe transform (format.ts:89-97)
    assert escape_html('a & b < c > d " e') == 'a & b < c > d " e'
    assert escape_html("it's") == "it&#039;s"
    assert escape_html("a\xa0b") == "a&nbsp;b"


def test_to_html_drops_span_and_class():
    root = el("div", {"class": "wrapper", "id": "main"}, [
        el("span", {"class": "x"}, ["inline"]),
        el("p", {"class": "para"}, ["text"]),
    ])
    assert to_html(root) == '<div id="main">inline<p>text</p></div>'


def test_to_html_self_closing():
    assert to_html(el("img", {"src": "x.png", "class": "c"})) == \
        '<img src="x.png"/>'
    assert to_html(el("br")) == "<br/>"


def test_stringify_blocks_and_inline():
    root = el("div", None, [
        el("h1", None, ["Title"]),
        el("p", None, ["one ", el("b", None, ["two"]), " three"]),
    ])
    # reference quirk: an inline element's trailing space is stripped
    # and the following text node is trimmed, so "two" and "three" fuse
    assert stringify(root) == "\nTitle\none twothree\n"


def test_stringify_br_hr():
    root = el("div", None, [
        el("p", None, ["a", el("br"), "b"]),
        el("hr"),
        el("p", None, ["c"]),
    ])
    text = format_document(stringify(root))
    # the space a text node gains before <br> survives (only trailing
    # spaces at element end are stripped)
    assert text == "a \nb\n----------\nc"


def test_stringify_trims_text_nodes():
    root = el("p", None, ["  spaced   ", el("i", None, [" x "]), "  y"])
    assert stringify(root) == "\nspaced xy\n"


def test_format_document():
    assert format_document("\n\na\n\n\nb\n\n") == "a\nb"


def test_extract_text_content_raw():
    root = el("div", None, ["a ", el("b", None, [" b "]), " c"])
    assert extract_text_content(root) == "a  b  c"


def test_count_nodes():
    doc = parse_html("<body><div><p>one</p><p>two</p></div></body>")
    # body + div + 2 p + 2 text = 6
    assert count_nodes(doc.body) == 6
    assert count_nodes(None) == 0
