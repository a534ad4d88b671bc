"""crawl_diff: all four verdicts on a planted pair of snapshots,
binary payloads, within-snapshot duplicate keys.
"""

import pyarrow as pa

from readability_ray.functions.crawldiff import crawl_diff


def _ds(rows, content_type=pa.string()):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array([r[1] for r in rows], content_type)}))


def test_all_four_verdicts(ray_session):
    old = _ds([("a", "same"), ("b", "before"), ("c", "gone")])
    new = _ds([("a", "same"), ("b", "after"), ("d", "fresh")])
    out = crawl_diff(old, new).to_pandas() \
        .sort_values("url").set_index("url")
    assert out.loc["a", "status"] == "unchanged"
    assert out.loc["b", "status"] == "changed"
    assert out.loc["c", "status"] == "removed"
    assert out.loc["d", "status"] == "added"
    assert out.loc["c", "new_md5"] == ""
    assert out.loc["d", "old_md5"] == ""
    assert out.loc["a", "old_md5"] == out.loc["a", "new_md5"]


def test_binary_payloads(ray_session):
    old = _ds([("x", b"\x00\x01")], pa.binary())
    new = _ds([("x", b"\x00\x02")], pa.binary())
    out = crawl_diff(old, new).to_pandas()
    assert list(out["status"]) == ["changed"]


def test_duplicate_keys_deterministic(ray_session):
    # duplicate url in a snapshot: the lexicographically smallest hash
    # represents it, so the verdict is stable regardless of row order
    old1 = _ds([("u", "aaa"), ("u", "zzz")])
    old2 = _ds([("u", "zzz"), ("u", "aaa")])
    new = _ds([("u", "aaa")])
    a = crawl_diff(old1, new).to_pandas()
    b = crawl_diff(old2, new).to_pandas()
    assert a.equals(b)
