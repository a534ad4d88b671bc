"""Poison pages in the ad-hoc corpus queries must surface as error
ROWS, never as silently vanished rows (VERDICT.md round-1 #6 — the
round-1 UDFs swallowed exceptions with ``continue``).

Drives the module-level batch UDFs from __ray_entry__ directly (no Ray
session needed — they are plain Arrow-batch functions).  Deep-DOM and
garbage inputs no longer raise anywhere (the tree walks are iterative
and the parser is byte-tolerant), so the per-row failure is injected by
patching the underlying analysis for a marker page — the point under
test is the UDF's error-row contract, not a specific crash."""

import sys

import pyarrow as pa

sys.path.insert(0, "/root/repo")

POISON_URL = "https://poison.test/page"
GOOD = ("https://ok.test/a",
        "<html><body><article><h1>T</h1><p>" + "word " * 60
        + "</p><a href='https://ok.test/b'>next</a></article>"
        + "</body></html>")
POISON = (POISON_URL, "<html><body><p>POISON-MARKER</p></body></html>")


def _batch(pages: list[tuple[str, str]]) -> pa.Table:
    return pa.table({
        "url": pa.array([u for u, _ in pages], pa.string()),
        "html": pa.array([h.encode("utf-8") for _, h in pages],
                         pa.binary()),
    })


def _poisoned(real_fn):
    def fake(html, *args, **kwargs):
        if "POISON-MARKER" in html:
            raise ValueError("injected poison")
        return real_fn(html, *args, **kwargs)
    return fake


def test_link_hierarchy_error_row(monkeypatch):
    import importlib
    ex = importlib.import_module("readability_ray.extract")
    from __ray_entry__ import _link_hierarchy_batch
    monkeypatch.setattr(ex, "extract", _poisoned(ex.extract))
    out = _link_hierarchy_batch(_batch([GOOD, POISON]))
    urls = out.column("url").to_pylist()
    errs = out.column("error").to_pylist()
    assert POISON_URL in urls  # not dropped
    poison_errs = [e for u, e in zip(urls, errs) if u == POISON_URL]
    assert poison_errs and all("injected poison" in e for e in poison_errs)
    good_errs = [e for u, e in zip(urls, errs) if u == GOOD[0]]
    assert good_errs and all(e == "" for e in good_errs)


def test_page_structure_error_row(monkeypatch):
    import readability_ray.detect as det
    from __ray_entry__ import _page_structure_batch
    monkeypatch.setattr(det, "analyze_page_structure",
                        _poisoned(det.analyze_page_structure))
    out = _page_structure_batch(_batch([GOOD, POISON]))
    assert out.num_rows == 2  # one row PER PAGE, poison included
    by_url = dict(zip(out.column("url").to_pylist(),
                      out.column("error").to_pylist()))
    assert "injected poison" in by_url[POISON_URL]
    assert by_url[GOOD[0]] == ""


def test_classify_pages_error_row(monkeypatch):
    import importlib
    ex = importlib.import_module("readability_ray.extract")
    from __ray_entry__ import _classify_pages_batch
    monkeypatch.setattr(ex, "extract", _poisoned(ex.extract))
    out = _classify_pages_batch(_batch([GOOD, POISON]))
    assert out.num_rows == 2
    rows = {u: (t, e) for u, t, e in zip(
        out.column("url").to_pylist(),
        out.column("top_page_type").to_pylist(),
        out.column("error").to_pylist())}
    assert rows[POISON_URL][0] == "error"
    assert "injected poison" in rows[POISON_URL][1]
    assert rows[GOOD[0]][1] == ""


def test_deep_dom_is_not_poison():
    """Hardening check: a 200k-deep DOM is handled, not crashed — the
    iterative walks + recursion headroom keep pathological nesting
    inside the normal path (error column empty)."""
    from __ray_entry__ import _page_structure_batch
    deep = ("https://deep.test/x", "<div>" * 200_000 + "text")
    out = _page_structure_batch(_batch([deep]))
    assert out.num_rows == 1
    assert out.column("error").to_pylist() == [""]
