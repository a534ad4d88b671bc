"""training_data_pipeline: end-to-end composition semantics — each
planted page exercises one stage (url dup, boilerplate, short page,
exact content dup) and the chunk output is hand-checkable.
"""

import datetime
import hashlib

import pyarrow as pa

from readability_ray.pipelines import training_data_pipeline

EPOCH = datetime.datetime(2024, 1, 1)
FOOTER = "Copyright 2024 The Example Site all rights reserved"


def _page(body_paras, title="T"):
    paras = "".join(f"<p>{p}</p>" for p in body_paras)
    return (f"<html><head><title>{title}</title></head><body>"
            f"<main><article><h1>{title}</h1>{paras}"
            f"<p>{FOOTER}</p></article></main></body></html>")


def _long_paras(tag, n=6):
    return [f"Paragraph {tag} {j} with enough real words to pass the "
            f"content extractor and the minimum length quality gate, "
            f"plus some more filler words for weight." for j in range(n)]


def _pages_table():
    rows = []

    def add(url, html, ts=EPOCH):
        rows.append((url, ts, html.encode()))

    # 8 normal pages — all share FOOTER (df=10 > 5 → boilerplate)
    for i in range(8):
        add(f"https://s.test/p{i}", _page(_long_paras(f"p{i}"),
                                          title=f"Page {i}"))
    # url dup: same url, later crawl with different content — loses
    add("https://s.test/p0", _page(_long_paras("LATER")),
        ts=EPOCH + datetime.timedelta(days=1))
    # exact content dup of p1 under a lexically LARGER url — loses
    add("https://z.test/copy-of-p1", _page(_long_paras("p1"),
                                           title="Page 1"))
    # short page — fails the quality gate
    add("https://s.test/short", _page(["Tiny."], title="Short"))
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
    })


def test_training_pipeline_end_to_end(ray_session):
    import ray.data
    out = training_data_pipeline(
        ray.data.from_arrow(_pages_table()), min_chars=200,
        boilerplate_df=5, window=32, stride=24).to_pandas()

    urls = set(out["url"])
    # 8 unique content pages survive; short page and both dups gone
    assert urls == {f"https://s.test/p{i}" for i in range(8)}
    # content dup resolved to the lexicographically smaller url
    assert "https://z.test/copy-of-p1" not in urls
    # chunks per doc: deterministic, ≥1 each
    counts = out.groupby("url").size()
    assert (counts >= 1).all()
    # chunk indices are dense from 0
    for _, g in out.groupby("url"):
        assert sorted(g["chunk_index"]) == list(range(len(g)))


def test_training_pipeline_boilerplate_removed(ray_session):
    """The shared footer must not appear in any chunk: re-run with
    include-text chunking via the same stages, done by hand."""
    import ray.data
    from readability_ray.functions.chunking import line_dedup
    from readability_ray.pipelines import (dedup_pages_by_url,
                                           extract_pipeline)

    ds = ray.data.from_arrow(_pages_table())
    md = extract_pipeline(dedup_pages_by_url(ds)
                          .select_columns(["url", "html"]),
                          use_actors=False) \
        .select_columns(["url", "markdown"]).materialize()
    cleaned = line_dedup(md, max_doc_freq=5).to_pandas()
    assert not cleaned["clean_text"].str.contains(FOOTER).any()
    # every page whose extraction produced text had the footer removed;
    # the short page extracts to EMPTY markdown (below charThreshold —
    # faithful reference behavior), so it legitimately removes nothing
    real = cleaned[cleaned["url"] != "https://s.test/short"]
    assert (real["n_removed"] >= 1).all()


def test_training_pipeline_deterministic(ray_session):
    import ray.data
    runs = []
    for _ in range(2):
        df = training_data_pipeline(
            ray.data.from_arrow(_pages_table()), min_chars=200,
            boilerplate_df=5, window=32, stride=24).to_pandas() \
            .sort_values(["url", "chunk_index"]).reset_index(drop=True)
        runs.append(hashlib.md5(
            df.to_csv(index=False).encode()).hexdigest())
    assert runs[0] == runs[1]


def test_training_pipeline_canonical_url_dedup(ray_session):
    """canonical_url_dedup=True collapses trivially-different urls
    (tracking params, case/port noise) in stage 1, keeping the
    EARLIEST crawl and its ORIGINAL url."""
    import ray.data

    from readability_ray.pipelines.training import training_data_pipeline
    rows = []

    def add(url, tag, ts=EPOCH):
        rows.append((url, ts, _page(_long_paras(tag)).encode()))

    add("https://s.test/a", "a")
    # same page refetched with tracking noise, later — must collapse
    add("https://s.test/a?utm_source=feed", "a-later",
        ts=EPOCH + datetime.timedelta(hours=1))
    add("HTTP://S.test:80/b", "b")
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
    }))
    out = training_data_pipeline(
        pages, min_chars=200, boilerplate_df=50,
        canonical_url_dedup=True, n_partitions=4).to_pandas()
    urls = set(out["url"])
    assert urls == {"https://s.test/a", "HTTP://S.test:80/b"}
    # without canonicalization the tracking variant survives
    out2 = training_data_pipeline(
        pages, min_chars=200, boilerplate_df=50,
        n_partitions=4).to_pandas()
    assert "https://s.test/a?utm_source=feed" in set(out2["url"])
