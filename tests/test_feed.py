"""RSS/Atom feed ingestion: writer→parser round trips, namespace
tolerance, Atom link-rel selection, malformed-input error rows, the
Ray explode."""

import pyarrow as pa
import pytest

from readability_ray.sources.feed import (feed_entries, make_atom_xml,
                                          make_rss_xml, parse_feed)


def test_roundtrip_rss():
    items = [
        {"title": "Post 1", "link": "https://a.test/1",
         "pubDate": "Mon, 01 Jan 2024 00:00:00 GMT", "guid": "g1"},
        {"link": "https://a.test/2"},
    ]
    kind, got = parse_feed(make_rss_xml("Blog A", items))
    assert kind == "rss"
    assert [e["link"] for e in got] == ["https://a.test/1",
                                       "https://a.test/2"]
    assert got[0]["title"] == "Post 1"
    assert got[0]["published"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert got[0]["guid"] == "g1"
    assert got[1]["title"] is None and got[1]["guid"] is None


def test_roundtrip_atom():
    entries = [
        {"title": "E1", "link": "https://b.test/e1",
         "updated": "2024-02-03T04:05:06Z", "id": "urn:e1"},
    ]
    kind, got = parse_feed(make_atom_xml("Feed B", entries))
    assert kind == "atom"
    assert got == [{"title": "E1", "link": "https://b.test/e1",
                    "published": "2024-02-03T04:05:06Z",
                    "guid": "urn:e1"}]


def test_writer_deterministic_and_escaped():
    items = [{"title": "a & <b>", "link": "https://a.test/?x=1&y=2"}]
    x1, x2 = make_rss_xml("c", items), make_rss_xml("c", items)
    assert x1 == x2
    assert "&amp;" in x1 and "&lt;b&gt;" in x1
    _, got = parse_feed(x1)
    assert got[0]["title"] == "a & <b>"
    assert got[0]["link"] == "https://a.test/?x=1&y=2"


def test_atom_link_rel_selection():
    # rel="alternate" (explicit or default) preferred over rel="self"
    xml = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>t</title>
<entry><link rel="self" href="https://s.test/feed.xml"/>
<link rel="alternate" href="https://s.test/page"/></entry>
<entry><link rel="self" href="https://s.test/feed2.xml"/></entry>
</feed>"""
    _, got = parse_feed(xml)
    assert got[0]["link"] == "https://s.test/page"
    # fallback: first href when no alternate exists
    assert got[1]["link"] == "https://s.test/feed2.xml"


def test_rss_namespace_and_atom_extension_tolerance():
    # RSS with an atom:link extension element must not confuse the
    # item link (namespace-agnostic local-name matching picks the
    # plain <link> text node; atom:link has no text so stays None-safe)
    xml = """<?xml version="1.0"?>
<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom"><channel>
<title>t</title>
<atom:link href="https://n.test/feed" rel="self"/>
<item><link>https://n.test/post</link>
<atom:link href="https://n.test/ignored" rel="self"/></item>
</channel></rss>"""
    kind, got = parse_feed(xml)
    assert kind == "rss"
    assert len(got) == 1 and got[0]["link"] == "https://n.test/post"


def test_malformed_raises_valueerror():
    with pytest.raises(ValueError, match="malformed"):
        parse_feed("<rss><channel></rs")
    with pytest.raises(ValueError, match="not a feed"):
        parse_feed("<html><body/></html>")


def test_feed_entries_ray_explode_with_poison(ray_session):
    import ray.data
    rss = make_rss_xml("c", [{"title": "p1", "link": "https://r.test/1"},
                             {"title": "p2", "link": "https://r.test/2"}])
    atom = make_atom_xml("f", [{"title": "e1",
                                "link": "https://r.test/e1"}])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "feed_xml": pa.array([rss, atom, "<broken"], pa.string()),
    }))
    out = feed_entries(ds).to_pandas() \
        .sort_values(["doc_id", "link"], na_position="first") \
        .reset_index(drop=True)
    assert len(out) == 4  # 2 rss + 1 atom + 1 error row
    assert list(out[out["doc_id"] == 1]["link"]) == [
        "https://r.test/1", "https://r.test/2"]
    assert out[out["doc_id"] == 2]["kind"].iloc[0] == "atom"
    poison = out[out["doc_id"] == 3].iloc[0]
    assert poison["link"] is None and "malformed" in poison["error"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_parse_feed_raises_valueerror_or_parses(xml):
    try:
        kind, out = parse_feed(xml)
    except ValueError:
        return
    assert kind in ("rss", "atom") and isinstance(out, list)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.fixed_dictionaries(
    {"link": st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        min_size=1, max_size=50)}), min_size=1, max_size=5))
def test_rss_writer_parser_roundtrip_links(items):
    _, got = parse_feed(make_rss_xml("t", items))
    want = [i["link"].strip() or None for i in items]
    assert [e["link"] for e in got] == want
