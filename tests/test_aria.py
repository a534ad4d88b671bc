"""ARIA tree build / compression / YAML rendering tests
(reference src/nav/aria.ts, readableAria.ts, links.ts)."""

from readability_ray.aria import (
    build_aria_node, get_accessible_name, get_aria_node_type, get_aria_role,
)
from readability_ray.nav_links import count_links, get_node_depth
from readability_ray.parser import parse_html
from readability_ray.readable_aria import aria_tree_to_string, build_aria_tree
from tests.helpers import el


def test_implicit_roles():
    assert get_aria_role(el("nav")) == "navigation"
    assert get_aria_role(el("a", {"href": "/x"})) == "link"
    assert get_aria_role(el("a")) == "generic"
    assert get_aria_role(el("input", {"type": "checkbox"})) == "checkbox"
    assert get_aria_role(el("input", {"type": "search"})) == "searchbox"
    assert get_aria_role(el("input")) == "textbox"
    assert get_aria_role(el("div", {"role": "BUTTON"})) == "button"


def test_accessible_name_priority_and_truncation():
    assert get_accessible_name(
        el("div", {"aria-label": "label wins", "title": "t"})) == "label wins"
    assert get_accessible_name(el("img", {"alt": "alt text"})) == "alt text"
    long_text = "word " * 20
    name = get_accessible_name(el("a", {"href": "/x"}, [long_text]))
    assert name.endswith("...")
    assert len(name) == 50  # 47 + "..."


def test_generic_text_branch_never_fires():
    """aria.ts:183 checks child.type (nonexistent property) — elements
    with text children stay 'generic', never 'text'."""
    node = el("div", None, ["some text content"])
    assert get_aria_node_type(node) == "generic"


def test_heading_level_and_states():
    node = build_aria_node(el("h3", None, ["Title"]))
    assert node["type"] == "heading" and node["level"] == 3
    checkbox = build_aria_node(el("input", {"type": "checkbox", "checked": ""}))
    assert checkbox["checked"] is True
    slider = build_aria_node(
        el("div", {"role": "slider", "aria-valuemin": "0",
                   "aria-valuemax": "10", "aria-valuetext": "5"}))
    assert slider["valuemin"] == 0.0 and slider["valuemax"] == 10.0
    assert slider["valuetext"] == "5"


def test_invisible_children_skipped():
    parent = el("nav", None, [
        el("a", {"href": "/a"}, ["visible"]),
        el("a", {"href": "/b", "style": "display: none"}, ["hidden"]),
    ])
    node = build_aria_node(parent)
    assert len(node["children"]) == 1
    assert node["children"][0]["name"] == "visible"


def test_tree_rendering_shapes():
    doc = parse_html("""
      <html><body>
        <main>
          <h1>Title Here</h1>
          <p>A short paragraph name.</p>
          <a href="/link">Click me</a>
        </main>
      </body></html>""")
    tree = build_aria_tree(doc)
    rendered = aria_tree_to_string(tree)
    assert "- main" in rendered
    assert '- heading "Title Here" [level=1]' in rendered
    assert '[href="/link"]' in rendered


def test_link_budget_filtering():
    links = "".join(f'<li><a href="/l{i}">Link number {i}</a></li>'
                    for i in range(80))
    doc = parse_html(f"<html><body><nav><ul>{links}</ul></nav></body></html>")
    tree = build_aria_tree(doc)
    assert count_links(tree["root"]) == 80
    rendered = aria_tree_to_string(tree, max_links=60)
    # over-budget rendering carries the reference's annotation header
    assert rendered.startswith("# 注:")
    assert "80" in rendered.splitlines()[0]
    rendered_links = rendered.count('[href=')
    assert rendered_links <= 60


def test_node_depth_and_count_links():
    doc = parse_html(
        "<html><body><div><nav><a href='/a'>a</a></nav></div></body></html>")
    tree = build_aria_tree(doc, compress=False)
    assert get_node_depth(tree["root"]) >= 2
    assert count_links(tree["root"]) == 1


def test_compression_collapses_generic_chains():
    doc = parse_html(
        "<html><body><div><div><div><main><p>content text</p></main>"
        "</div></div></div></body></html>")
    compressed = build_aria_tree(doc, compress=True)
    raw = build_aria_tree(doc, compress=False)
    assert compressed["nodeCount"] < raw["nodeCount"]
    # root stays the (named) generic body — unwrap only fires for
    # "text"-typed roots, which cannot occur (see aria.ts:183 quirk);
    # the main child survives compression
    assert compressed["root"]["type"] == "generic"
    assert any(c["type"] == "main"
               for c in compressed["root"].get("children", []))
