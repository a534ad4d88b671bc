"""canonical_url: RFC 3986 normalization cases, crawl extras,
idempotence (hypothesis), and the Ray op."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from readability_ray.functions.urltools import (canonical_url,
                                                canonicalize_urls)

CASES = [
    # scheme/host case + default port
    ("HTTP://Example.COM:80/a", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    # fragment stripped, empty path -> /
    ("http://example.com#frag", "http://example.com/"),
    ("http://example.com/a#b", "http://example.com/a"),
    # dot segments
    ("http://e.com/a/./b", "http://e.com/a/b"),
    ("http://e.com/a/../b", "http://e.com/b"),
    ("http://e.com/a/b/..", "http://e.com/a/"),
    ("http://e.com/../../x", "http://e.com/x"),
    # percent normalization
    ("http://e.com/%7euser/%2fx%2F", "http://e.com/~user/%2Fx%2F"),
    ("http://e.com/p?q=%41%3d", "http://e.com/p?q=A%3D"),
    # tracking params
    ("http://e.com/p?utm_source=x&id=3&fbclid=9",
     "http://e.com/p?id=3"),
    ("http://e.com/p?UTM_CAMPAIGN=x", "http://e.com/p"),
    # host trailing dot; userinfo kept
    ("http://e.com./x", "http://e.com/x"),
    ("http://u:pw@E.com/x", "http://u:pw@e.com/x"),
    # non-special schemes unchanged
    ("mailto:a@b.com", "mailto:a@b.com"),
    ("about:blank", "about:blank"),
    ("", ""),
    ("not a url", "not a url"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_cases(raw, want):
    assert canonical_url(raw) == want


def test_sort_query():
    assert canonical_url("http://e.com/p?b=2&a=1", sort_query=True) \
        == "http://e.com/p?a=1&b=2"
    assert canonical_url("http://e.com/p?b=2&a=1") \
        == "http://e.com/p?b=2&a=1"


def test_keep_tracking():
    assert canonical_url("http://e.com/p?utm_source=x",
                         strip_tracking=False) \
        == "http://e.com/p?utm_source=x"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32,
                                      max_codepoint=0x2FF),
               max_size=80))
def test_idempotent_on_arbitrary_text(s):
    for u in (s, "http://example.com/" + s):
        once = canonical_url(u)
        assert canonical_url(once) == once


def test_canonicalize_urls_op(ray_session):
    import ray.data
    ds = ray.data.from_arrow(pa.table({
        "url": ["HTTP://A.com:80/x/../y?utm_source=t&k=1#f",
                "https://b.org/p"],
        "html": [b"<p>1</p>", b"<p>2</p>"]}))
    df = canonicalize_urls(ds).to_pandas()
    assert list(df["canonical_url"]) == ["http://a.com/y?k=1",
                                         "https://b.org/p"]
    assert list(df["host"]) == ["a.com", "b.org"]
    assert list(df.columns[:2]) == ["url", "html"]  # originals kept
