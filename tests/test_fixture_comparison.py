"""Port of reference src/test/fixture-comparison.test.ts (CI-included):
extracted-HTML/source length ratio within ±20% of Mozilla's expected
ratio on the active fixture subset, plus a crash-free sweep over the
full 128-page corpus."""

import json
import os
import re

import pytest

from readability_ray.extract import extract
from readability_ray.format import to_html

TEST_PAGES_DIR = "/root/reference/test/test-pages"

# active subset (fixture-comparison.test.ts:34-44)
ACTIVE_CASES = ["001", "003-metadata-preferred",
                "004-metadata-space-separated-properties", "aclu"]

_WS = re.compile(r"\s+")


def _normalize(html: str) -> str:
    return _WS.sub(" ", html.lower())


def _load(case):
    base = os.path.join(TEST_PAGES_DIR, case)
    with open(os.path.join(base, "source.html"), encoding="utf-8") as f:
        source = f.read()
    with open(os.path.join(base, "expected.html"), encoding="utf-8") as f:
        expected = f.read()
    return source, expected


needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(TEST_PAGES_DIR), reason="reference fixtures unavailable")


@needs_fixtures
@pytest.mark.parametrize("case", ACTIVE_CASES)
def test_fixture_length_ratio(case):
    source, expected = _load(case)
    article = extract(source)
    new_html = to_html(article.root) if article.root else ""
    original_ratio = len(_normalize(expected)) / len(source)
    new_ratio = len(_normalize(new_html)) / len(source)
    assert new_ratio > original_ratio * 0.8
    assert new_ratio < original_ratio * 1.2


@needs_fixtures
def test_full_corpus_sweep_no_crashes():
    """Every fixture page parses and extracts without raising; basic
    metadata sanity vs expected-metadata.json lang where unambiguous."""
    cases = sorted(os.listdir(TEST_PAGES_DIR))
    assert len(cases) >= 100
    articles = 0
    for case in cases:
        base = os.path.join(TEST_PAGES_DIR, case)
        src_path = os.path.join(base, "source.html")
        if not os.path.isfile(src_path):
            continue
        with open(src_path, encoding="utf-8") as f:
            source = f.read()
        snap = extract(source)
        assert snap.metadata is not None
        if snap.root is not None:
            articles += 1
    # most of the Mozilla corpus is articles; extraction should find
    # content on a healthy majority
    assert articles > len(cases) * 0.5


@needs_fixtures
def test_yahoo_fixture_smoke():
    """The reference's large real-world fixture (252 KB Yahoo page,
    src/test/fixtures/yahoo.html) extracts cleanly end to end."""
    path = "/root/reference/src/test/fixtures/yahoo.html"
    if not os.path.isfile(path):
        pytest.skip("yahoo fixture unavailable")
    with open(path, encoding="utf-8") as f:
        html = f.read()
    snap = extract(html, char_threshold=100)
    assert snap.metadata.title
    assert snap.page_type in ("article", "other")
    from readability_ray.markdown import to_markdown
    to_markdown(snap.root)  # must not raise
