"""Head-link extraction: canonical / next / prev / hreflang /
meta-robots over the real parser, plus the Ray op."""

import pyarrow as pa

from readability_ray.functions.headlinks import (extract_head_links,
                                                 head_links)


def test_basic_head_links():
    html = """<html><head>
<link rel="canonical" href="https://c.test/page">
<link rel="next" href="/page2">
<link rel="prev" href="/page0">
<link rel="alternate" hreflang="fr" href="https://c.test/fr">
<link rel="alternate" hreflang="de" href="https://c.test/de">
<meta name="robots" content="noindex, follow">
</head><body>x</body></html>"""
    r = extract_head_links(html)
    assert r["canonical"] == "https://c.test/page"
    assert r["rel_next"] == "/page2"
    assert r["rel_prev"] == "/page0"
    assert r["noindex"] is True and r["nofollow"] is False
    assert r["n_hreflang"] == 2
    assert r["hreflang_list"] == \
        "de:https://c.test/de fr:https://c.test/fr"


def test_rel_token_list_and_case():
    html = ('<head><link rel="Canonical stylesheet" href="/a">'
            '<META NAME="ROBOTS" CONTENT="NONE"></head>')
    r = extract_head_links(html)
    assert r["canonical"] == "/a"
    # "none" implies both noindex and nofollow
    assert r["noindex"] is True and r["nofollow"] is True


def test_first_match_wins_and_empty_href_skipped():
    html = ('<head><link rel="canonical" href="">'
            '<link rel="canonical" href="/first">'
            '<link rel="canonical" href="/second"></head>')
    assert extract_head_links(html)["canonical"] == "/first"


def test_no_head_links():
    r = extract_head_links("<html><body><p>plain</p></body></html>")
    assert r["canonical"] is None and r["rel_next"] is None
    assert r["noindex"] is False and r["n_hreflang"] == 0
    assert r["hreflang_list"] == ""
    # hostile inputs never raise
    extract_head_links("")
    extract_head_links("<link rel=canonical href=/x>")
    extract_head_links("\x00<head><link")


def test_hreflang_dedup_and_sort():
    html = ('<head>'
            '<link rel="alternate" hreflang="FR" href="/fr">'
            '<link rel="alternate" hreflang="fr" href="/fr">'
            '<link rel="alternate" hreflang="en" href="/en"></head>')
    r = extract_head_links(html)
    assert r["n_hreflang"] == 2
    assert r["hreflang_list"] == "en:/en fr:/fr"


def test_head_links_ray_op(ray_session):
    import ray.data
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "html": pa.array([
            '<head><link rel="canonical" href="https://k.test/1"></head>',
            "<p>none</p>",
        ], pa.string()),
    }))
    out = head_links(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert list(out["canonical"]) == ["https://k.test/1", None]
    assert list(out["n_hreflang"]) == [0, 0]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=400))
def test_extract_head_links_never_raises(html):
    r = extract_head_links(html)
    assert isinstance(r["noindex"], bool)
    assert r["n_hreflang"] >= 0


def test_feed_autodiscovery_kinds_dedup_and_decoys():
    from readability_ray.functions.headlinks import extract_feed_links
    html = ('<head>'
            '<link rel="stylesheet" href="/css">'
            '<link rel="alternate" type="application/rss+xml" '
            'href="/feed" title="Blog">'
            '<link rel="alternate" type="text/html" href="/mobile">'
            '<link rel="alternate" type="APPLICATION/ATOM+XML" '
            'href="/atom">'
            '<link rel="alternate" type="application/rss+xml" '
            'href="/feed"></head>')
    r = extract_feed_links(html)
    assert r == [
        {"kind": "rss", "href": "/feed", "title": "Blog", "pos": 0},
        {"kind": "atom", "href": "/atom", "title": "", "pos": 1}]
    assert extract_feed_links("<p>none</p>") == []


def test_feed_autodiscovery_ray_op(ray_session):
    import ray.data
    from readability_ray.functions import feed_autodiscovery
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "html": pa.array([
            '<head><link rel="alternate" type="application/rss+xml" '
            'href="https://z.test/f.xml"></head>'], pa.string()),
    }))
    out = feed_autodiscovery(ds).to_pandas()
    assert list(out["href"]) == ["https://z.test/f.xml"]
    assert list(out["kind"]) == ["rss"]
