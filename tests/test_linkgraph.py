"""Anchor-text aggregation: hand-checkable counts, deterministic
top-anchor tiebreak, empty-anchor handling, multi-batch exactness."""

import pyarrow as pa

from readability_ray.functions.linkgraph import anchor_text_stats


def _edges(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.string()),
        "href": pa.array([r[1] for r in rows], pa.string()),
        "anchor_text": pa.array([r[2] for r in rows], pa.string()),
    }))


def test_counts_and_top_anchor(ray_session):
    rows = [
        ("a", "T1", "home"),
        ("b", "T1", "home"),
        ("b", "T1", "start"),   # b links T1 twice: inlinks 3, uniq 2
        ("c", "T2", ""),
        ("c", "T2", "docs"),
    ]
    out = anchor_text_stats(_edges(rows)).to_pandas() \
        .set_index("href")
    assert out.loc["T1", "n_inlinks"] == 3
    assert out.loc["T1", "n_unique_src"] == 2
    assert out.loc["T1", "top_anchor"] == "home"
    assert out.loc["T1", "top_anchor_n"] == 2
    assert out.loc["T2", "n_inlinks"] == 2
    assert out.loc["T2", "top_anchor"] == "docs"  # empty never wins


def test_tie_breaks_lexicographic(ray_session):
    rows = [("a", "T", "zeta"), ("b", "T", "alpha")]
    out = anchor_text_stats(_edges(rows)).to_pandas()
    assert out.iloc[0]["top_anchor"] == "alpha"


def test_all_empty_anchors(ray_session):
    rows = [("a", "T", ""), ("b", "T", None)]
    out = anchor_text_stats(_edges(rows)).to_pandas()
    assert out.iloc[0]["n_inlinks"] == 2
    assert out.iloc[0]["top_anchor"] == ""
    assert out.iloc[0]["top_anchor_n"] == 0


def test_multi_batch_exact_distinct(ray_session):
    # the same (src, href) pair split across batches must count once
    import ray.data
    rows = [(f"s{i % 4}", "T", f"a{i % 2}") for i in range(40)]
    ds = _edges(rows).repartition(8)  # force many small blocks
    out = anchor_text_stats(ds, n_partitions=4).to_pandas()
    assert out.iloc[0]["n_inlinks"] == 40
    assert out.iloc[0]["n_unique_src"] == 4
    assert out.iloc[0]["top_anchor_n"] == 20


def test_host_stats_dominant_lang_and_totals(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import host_stats
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([
            "https://A.test/1", "https://a.test/2", "https://a.test/3",
            "https://b.test/1",
        ], pa.string()),
        "text": pa.array(["aa", "bbbb", "c", "dd"], pa.string()),
        "lang": pa.array(["en", "fr", "en", None], pa.string()),
    }))
    out = host_stats(ds, n_partitions=2).to_pandas() \
        .set_index("host")
    # uppercase host folds into a.test
    assert out.loc["a.test", "n_docs"] == 3
    assert out.loc["a.test", "total_chars"] == 7
    # en=2, fr=1 → en dominates
    assert out.loc["a.test", "top_lang"] == "en"
    assert out.loc["a.test", "top_lang_n"] == 2
    assert out.loc["b.test", "top_lang"] == ""  # null lang folds to ""
    assert len(out) == 2


def test_host_stats_tie_breaks_lang_asc(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import host_stats
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://t.test/1", "https://t.test/2"],
                        pa.string()),
        "text": pa.array(["x", "y"], pa.string()),
        "lang": pa.array(["fr", "en"], pa.string()),
    }))
    out = host_stats(ds, n_partitions=2).to_pandas()
    assert out["top_lang"].iloc[0] == "en"  # 1-1 tie → lang asc


def test_page_outlinks_real_extraction_semantics(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import page_outlinks
    html = (b"<html><body>"
            b'<a href="https://x.test/a">first</a>'
            b'<a href="javascript:void(0)">skipped</a>'
            b"<nav><a href='https://x.test/nav'>removed by "
            b"preprocess</a></nav>"
            b'<a href="/rel">  spaced  text </a>'
            b"</body></html>")
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://src.test/p", "https://src.test/q"],
                        pa.string()),
        "html": pa.array([html, b"<p>no links</p>"], pa.binary()),
    }))
    out = page_outlinks(ds).to_pandas().sort_values("href") \
        .reset_index(drop=True)
    # javascript: dropped; nav subtree removed by preprocess;
    # inner text trimmed per getInnerText
    assert list(out["href"]) == ["/rel", "https://x.test/a"]
    assert list(out["anchor_text"]) == ["spaced text", "first"]
    assert set(out["src"]) == {"https://src.test/p"}
