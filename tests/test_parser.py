"""htmlparser2-semantics parser tests (behaviors the extraction spec
relies on; see readability_ray/parser.py docstring)."""

from readability_ray.parser import parse_html, serialize_to_html
from readability_ray.vdom import ELEMENT, TEXT, get_elements_by_tag_name


def _tags(element):
    return [c.tag for c in element.children if c.nodeType == ELEMENT]


def test_basic_document():
    doc = parse_html(
        '<html lang="en"><head><title>T</title></head>'
        '<body class="x"><p>hi</p></body></html>')
    assert doc.document_element.attrs["lang"] == "en"
    assert doc.body.attrs["class"] == "x"
    assert _tags(doc.body) == ["p"]


def test_fragment_without_body_leaves_body_empty():
    # load-bearing quirk: without an explicit <body>, content attaches to
    # documentElement and doc.body stays empty (htmlparser2.ts:32,60-63)
    doc = parse_html("<div><p>Just a fragment</p></div>")
    assert doc.body.children == []
    assert _tags(doc.document_element) == ["div"]


def test_implicit_close_p_and_li():
    doc = parse_html("<body><p>one<p>two<ul><li>a<li>b</ul></body>")
    ps = get_elements_by_tag_name(doc.body, "p")
    assert len(ps) == 2
    lis = get_elements_by_tag_name(doc.body, "li")
    assert len(lis) == 2
    assert lis[0].children[0].text == "a"


def test_void_elements():
    doc = parse_html("<body><img src=x.png><br><hr></body>")
    assert _tags(doc.body) == ["img", "br", "hr"]
    assert all(not c.children for c in doc.body.children)


def test_self_closing_ignored_on_normal_elements():
    # <div/> OPENS a div in non-foreign content (htmlparser2 default)
    doc = parse_html("<body><div/><span>inside div</span></body>")
    assert _tags(doc.body) == ["div"]
    assert _tags(doc.body.children[0]) == ["span"]


def test_entities_split_text_nodes():
    doc = parse_html("<body><p>a&amp;b</p></body>")
    p = doc.body.children[0]
    assert [c.text for c in p.children] == ["a", "&", "b"]


def test_failed_entity_stays_literal_single_node():
    doc = parse_html("<body><p>a & b</p></body>")
    p = doc.body.children[0]
    assert [c.text for c in p.children] == ["a & b"]


def test_legacy_entity_without_semicolon():
    doc = parse_html("<body><p>&notit;</p></body>")
    p = doc.body.children[0]
    assert "".join(c.text for c in p.children) == "¬it;"


def test_numeric_entities():
    doc = parse_html("<body><p>&#65;&#x42;&#128;</p></body>")
    p = doc.body.children[0]
    assert "".join(c.text for c in p.children) == "AB€"


def test_attribute_entities_and_first_wins():
    doc = parse_html('<body><a href="/?a=1&amp;b=2" href="other">x</a></body>')
    a = doc.body.children[0]
    assert a.attrs["href"] == "/?a=1&b=2"


def test_attribute_legacy_entity_rule():
    # &not followed by '=' must NOT decode in attributes
    doc = parse_html('<body><a href="/x?param&not=1">x</a></body>')
    assert doc.body.children[0].attrs["href"] == "/x?param&not=1"
    # but &not followed by non-alnum decodes
    doc = parse_html('<body><a title="a&not b">x</a></body>')
    assert doc.body.children[0].attrs["title"] == "a¬ b"


def test_script_rawtext():
    doc = parse_html("<body><script>if (a<b) x(&amp;);</script><p>t</p></body>")
    script = doc.body.children[0]
    assert script.tag == "script"
    assert script.children[0].text == "if (a<b) x(&amp;);"
    assert _tags(doc.body) == ["script", "p"]


def test_title_rcdata_decodes_entities():
    doc = parse_html("<html><head><title>A &amp; <b>B</title></head><body></body></html>")
    title = get_elements_by_tag_name(doc.document_element, "title")[0]
    assert "".join(c.text for c in title.children) == "A & <b>B"


def test_comments_and_doctype_dropped():
    doc = parse_html("<!DOCTYPE html><body><!-- c --><p>x</p><![CDATA[y]]></body>")
    assert _tags(doc.body) == ["p"]
    assert all(c.nodeType == ELEMENT for c in doc.body.children)


def test_unclosed_tags_closed_at_eof():
    doc = parse_html("<body><div><p>text")
    div = doc.body.children[0]
    assert div.tag == "div"
    assert div.children[0].tag == "p"
    assert div.children[0].children[0].text == "text"


def test_close_tag_without_open_p_creates_empty_p():
    doc = parse_html("<body>text</p><span>s</span></body>")
    tags = _tags(doc.body)
    assert "p" in tags and "span" in tags


def test_stray_br_close_resurrects():
    doc = parse_html("<body>a</br>b</body>")
    assert _tags(doc.body) == ["br"]


def test_table_implies_close():
    doc = parse_html(
        "<body><table><tr><td>1<td>2<tr><td>3</table></body>")
    trs = get_elements_by_tag_name(doc.body, "tr")
    assert len(trs) == 2
    assert len([c for c in trs[0].children if c.nodeType == ELEMENT]) == 2


def test_duplicate_body_merges_attrs():
    doc = parse_html('<body id="a"><p>x</p></body><body class="b"><p>y</p></body>')
    assert doc.body.attrs["id"] == "a"
    assert doc.body.attrs["class"] == "b"
    assert len(get_elements_by_tag_name(doc.body, "p")) == 2


def test_serialize_roundtrip():
    doc = parse_html('<body><p class="c">a<b>bold</b></p><img src=x></body>')
    html = serialize_to_html(doc.body)
    assert html == '<body><p class="c">a<b>bold</b></p><img src="x"/></body>'


def test_foreign_context_self_closing():
    doc = parse_html("<body><svg><circle/><rect/></svg><p>after</p></body>")
    svg = doc.body.children[0]
    assert _tags(svg) == ["circle", "rect"]
    assert _tags(doc.body) == ["svg", "p"]


def test_lowercasing():
    doc = parse_html('<BODY><DIV CLASS="X">t</DIV></BODY>')
    div = doc.body.children[0]
    assert div.tag == "div"
    assert div.attrs["class"] == "X"
