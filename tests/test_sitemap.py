"""Sitemap ingestion: writer→parser round trip, index files,
namespace tolerance, malformed-input error rows, the Ray explode."""

import pyarrow as pa
import pytest

from readability_ray.sources.sitemap import (make_sitemap_xml,
                                             parse_sitemap,
                                             sitemap_entries)


def test_roundtrip_urlset():
    entries = [
        {"loc": "https://a.test/1", "lastmod": "2024-01-02",
         "changefreq": "daily", "priority": "0.8"},
        {"loc": "https://a.test/2"},
    ]
    got = parse_sitemap(make_sitemap_xml(entries))
    assert [e["loc"] for e in got] == ["https://a.test/1",
                                      "https://a.test/2"]
    assert got[0]["changefreq"] == "daily"
    assert got[0]["priority"] == "0.8"
    assert got[1]["lastmod"] is None
    assert all(e["kind"] == "url" for e in got)


def test_roundtrip_index():
    xml = make_sitemap_xml(
        [{"loc": "https://a.test/sitemap1.xml",
          "lastmod": "2024-03-01"}], index=True)
    got = parse_sitemap(xml)
    assert got == [{"kind": "sitemap",
                    "loc": "https://a.test/sitemap1.xml",
                    "lastmod": "2024-03-01", "changefreq": None,
                    "priority": None}]


def test_writer_deterministic_and_escaped():
    entries = [{"loc": "https://a.test/?a=1&b=<2>"}]
    x1, x2 = make_sitemap_xml(entries), make_sitemap_xml(entries)
    assert x1 == x2
    assert "&amp;" in x1 and "&lt;2&gt;" in x1
    assert parse_sitemap(x1)[0]["loc"] == "https://a.test/?a=1&b=<2>"


def test_namespace_tolerance():
    # prefixed namespace and NO namespace both parse
    prefixed = """<?xml version="1.0"?>
<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
<sm:url><sm:loc>https://p.test/x</sm:loc></sm:url></sm:urlset>"""
    bare = "<urlset><url><loc>https://b.test/y</loc></url></urlset>"
    assert parse_sitemap(prefixed)[0]["loc"] == "https://p.test/x"
    assert parse_sitemap(bare)[0]["loc"] == "https://b.test/y"


def test_malformed_raises_valueerror():
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap("<urlset><url></urlse")
    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap("<html><body/></html>")


def test_entries_without_loc_skipped():
    xml = ("<urlset><url><lastmod>2024-01-01</lastmod></url>"
           "<url><loc>https://k.test/ok</loc></url></urlset>")
    got = parse_sitemap(xml)
    assert len(got) == 1 and got[0]["loc"] == "https://k.test/ok"


def test_sitemap_entries_ray_explode_with_poison(ray_session):
    import ray.data
    good = make_sitemap_xml([{"loc": "https://r.test/1"},
                             {"loc": "https://r.test/2"}])
    idx = make_sitemap_xml([{"loc": "https://r.test/more.xml"}],
                           index=True)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "sitemap_xml": pa.array([good, idx, "<broken"], pa.string()),
    }))
    out = sitemap_entries(ds).to_pandas() \
        .sort_values(["doc_id", "loc"], na_position="first") \
        .reset_index(drop=True)
    assert len(out) == 4  # 2 urls + 1 index entry + 1 error row
    assert list(out[out["doc_id"] == 1]["loc"]) == [
        "https://r.test/1", "https://r.test/2"]
    assert out[out["doc_id"] == 2]["kind"].iloc[0] == "sitemap"
    poison = out[out["doc_id"] == 3].iloc[0]
    assert poison["loc"] is None and "malformed" in poison["error"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_parse_sitemap_raises_valueerror_or_parses(xml):
    try:
        out = parse_sitemap(xml)
    except ValueError:
        return
    assert isinstance(out, list)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.fixed_dictionaries(
    {"loc": st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        min_size=1, max_size=50)}), min_size=1, max_size=5))
def test_writer_parser_roundtrip_locs(entries):
    # locs are URLs (printable, no control chars — the writer's
    # documented contract); & < > must survive via escaping
    got = parse_sitemap(make_sitemap_xml(entries))
    want = [e["loc"].strip() for e in entries if e["loc"].strip()]
    assert [e["loc"] for e in got] == want
