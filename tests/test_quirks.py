"""Faithfulness tests for the reference's load-bearing quirks — these
pin behaviors that a "clean" reimplementation would get wrong
(SURVEY.md §7.4)."""

from readability_ray.extract import extract, find_main_candidates
from readability_ray.format import stringify
from readability_ray.markdown import to_markdown
from readability_ray.parser import parse_html
from readability_ray.vdom import get_inner_text


def test_parent_walk_ignores_body_sentinel():
    """extract.ts:403 compares tagName === "BODY" (uppercase) but tags
    are lowercased — the walk can escalate to body itself."""
    # two sibling sections, each with scored paragraphs: body (their
    # grandparent) accumulates more score than either section and the
    # walk must be allowed to reach it
    html = ("<html><body>"
            + "".join(
                f"<section><p>{'text with words, commas, details, '*4}"
                f"</p></section>" for _ in range(4))
            + "</body></html>")
    doc = parse_html(html)
    candidates = find_main_candidates(doc)
    assert candidates[0] is doc.body  # walk went past the sections


def test_inner_text_per_level_trim():
    """getInnerText trims each nested element's text at its own level
    and concatenates without separators (dom.ts:187-209)."""
    doc = parse_html("<body><div>a <span> b </span> c</div></body>")
    div = doc.body.children[0]
    # direct text "a " + trimmed span "b" + direct " c" → "a b c"
    assert get_inner_text(div) == "a b c"
    doc = parse_html("<body><div><span>x </span><span> y</span></div></body>")
    div = doc.body.children[0]
    # both spans trim to "x"/"y" and concatenate WITHOUT a space
    assert get_inner_text(div) == "xy"


def test_entity_split_changes_markdown_spacing():
    """htmlparser2 emits decoded entities as separate text events;
    the markdown joiner then inserts a space between the fragments
    (markdown.ts:27-56) — 'a&amp;b' renders as 'a & b'."""
    doc = parse_html("<body><p>a&amp;b</p></body>")
    assert to_markdown(doc.body.children[0]) == "a & b"
    doc = parse_html("<body><p>a & b</p></body>")  # literal & — no split
    assert to_markdown(doc.body.children[0]) == "a & b"


def test_stringify_space_before_br_survives():
    doc = parse_html("<body><p>one <br>two</p></body>")
    assert stringify(doc.body.children[0]) == "\none \ntwo\n"


def test_fragment_without_body_yields_empty_extraction():
    """Content of body-less fragments attaches to documentElement;
    doc.body stays empty, so scoring finds nothing (OTHER)."""
    snap = extract("<div><p>" + "long fragment text, with commas, " * 20
                   + "</p></div>", char_threshold=100)
    assert snap.page_type == "other"
    assert snap.root is None


def test_semantic_shortcut_single_article():
    """A single <article>/<main> bypasses scoring entirely — its score
    annotation stays None → reported score 0."""
    snap = extract("<body><article><h1>T</h1><p>"
                   + "content words here, with commas, " * 20
                   + "</p></article></body>", char_threshold=100)
    assert snap.page_type == "article"
    assert snap.main_candidates[0][1] == 0  # never scored


def test_charthreshold_under_100_skips_content_gate():
    """extract() skips isProbablyContent when charThreshold < 100
    (extract.ts:827) — readable() never does."""
    from readability_ray.readable import readable
    # page long enough to classify ARTICLE at threshold 99 but whose top
    # candidate fails isProbablyContent's 140-char gate
    html = ("<html><body><article><h1>T</h1><p>"
            + "word " * 25 + "</p></article></body></html>")
    via_extract = extract(html, char_threshold=99)
    via_readable = readable(html, char_threshold=99)
    assert via_extract.page_type == "article"
    assert via_extract.root is not None          # gate skipped
    assert via_readable.snapshot.root is None    # gate applied


def test_falsy_option_defaults():
    """extract() uses `options.x || DEFAULT`: charThreshold=0 falls back
    to 500; readable() uses `??`: 0 stays 0."""
    from readability_ray.readable import readable
    # ~120 chars: below every extract() threshold at the 500 fallback,
    # but ≥ 0 for readable()'s semantic check with threshold kept at 0
    html = ("<html><body><article><h1>T</h1><p>"
            + "sentence with content, words, " * 4
            + "</p></article></body></html>")
    assert extract(html, char_threshold=0).page_type == "other"  # 0→500
    assert readable(html, char_threshold=0).page_type == "article"


def test_escape_html_identity_quirk():
    """toHTML's escapeHTML only transforms NBSP and apostrophe — '&',
    '<', '>' in text pass through raw (format.ts:89-97)."""
    from readability_ray.format import to_html
    doc = parse_html("<body><p>a &amp; b</p></body>")
    assert to_html(doc.body.children[0]) == "<p>a & b</p>"
