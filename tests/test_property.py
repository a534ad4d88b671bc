"""Property-based robustness tests (hypothesis).

The reference has no randomized testing (SURVEY.md §5) — these go
beyond it: arbitrary byte soup must never crash the parser or the
extraction pipeline, and structural invariants must hold.
"""

import string

from hypothesis import given, settings, strategies as st

from readability_ray.entities import decode_text_segments
from readability_ray.extract import extract
from readability_ray.format import count_nodes, stringify
from readability_ray.jsstr import js_trim
from readability_ray.markdown import to_markdown
from readability_ray.parser import parse_html
from readability_ray.vdom import ELEMENT

_HTMLISH = st.text(
    alphabet=string.ascii_letters + string.digits
    + " <>/=\"'&;#!-\n\t.,:()[]{}" + "äé漢　",
    max_size=400)


@settings(max_examples=200, deadline=None)
@given(_HTMLISH)
def test_parser_never_crashes(html):
    doc = parse_html(html)
    assert doc.document_element.tag == "html"
    assert count_nodes(doc.document_element) >= 1


@settings(max_examples=100, deadline=None)
@given(_HTMLISH)
def test_parse_tree_is_consistent(html):
    """Every child's parent pointer points at the node holding it."""
    doc = parse_html(html)
    stack = [doc.document_element]
    while stack:
        node = stack.pop()
        for child in node.children:
            assert child.parent is node
            if child.nodeType == ELEMENT:
                stack.append(child)


@settings(max_examples=100, deadline=None)
@given(_HTMLISH)
def test_extract_never_crashes(html):
    snap = extract("<body>" + html + "</body>", char_threshold=100)
    assert snap.page_type in ("article", "other")
    stringify(snap.root)
    to_markdown(snap.root)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_entity_segments_reassemble(text):
    """Decoded segments concatenate to the decoded string; decoding is
    a pure function of the input."""
    a = decode_text_segments(text)
    b = decode_text_segments(text)
    assert a == b
    assert "".join(a) == "".join(b)
    # no empty segments are ever emitted
    assert all(seg for seg in a)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100))
def test_js_trim_idempotent(text):
    once = js_trim(text)
    assert js_trim(once) == once
    assert len(once) <= len(text)


@settings(max_examples=50, deadline=None)
@given(_HTMLISH)
def test_serializer_roundtrip_markdown_stable(html):
    """serialize→load preserves the rendering of whatever was
    extracted (when a root exists)."""
    from readability_ray.readable import Readable
    doc = Readable.from_html("<body><article><h1>t</h1><p>"
                             + html.replace("<", " ") + " filler, words, "
                             "enough for threshold, surely padding text"
                             "</p></article></body>", char_threshold=50)
    loaded = Readable.load(doc.serialize())
    assert loaded.to_markdown() == doc.to_markdown()
    assert loaded.infer_page_type() == doc.infer_page_type()
