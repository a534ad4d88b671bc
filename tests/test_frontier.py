"""Composed crawl-frontier pipeline: sitemap explode → canonicalize →
robots gate → fetch slots, end to end."""

import pyarrow as pa

from readability_ray.sources.sitemap import make_sitemap_xml


def test_frontier_pipeline_end_to_end(ray_session):
    import ray.data
    from readability_ray.pipelines import frontier_pipeline

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "sitemap_xml": pa.array([
            # host a: two pages, robots blocks /private only
            make_sitemap_xml([
                {"loc": "https://A.test/pages/2"},   # uppercase host →
                {"loc": "https://a.test/pages/1"},   # canonicalized
                {"loc": "https://a.test/private/x"},
            ]),
            # host b: one page + tracking params (canonicalized away)
            make_sitemap_xml(
                [{"loc": "https://b.test/p?utm_source=x&id=7"}]),
            # index file: dropped
            make_sitemap_xml([{"loc": "https://a.test/more.xml"}],
                             index=True),
            # malformed: dropped
            "<urlset><loc>broken",
        ], pa.string()),
    }))
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["a.test"], pa.string()),
        "robots_txt": pa.array(
            ["User-agent: *\nDisallow: /private\nCrawl-delay: 2"],
            pa.string()),
    }))
    out = frontier_pipeline(docs, robots).to_pandas() \
        .sort_values(["host", "fetch_order"]).reset_index(drop=True)
    a = out[out["host"] == "a.test"]
    # /private blocked; the two /pages survive, canonical-lowercased,
    # ordered by url
    assert list(a["url"]) == ["https://a.test/pages/1",
                              "https://a.test/pages/2"]
    assert list(a["delay_ms"]) == [2000, 2000]
    assert list(a["fetch_offset_ms"]) == [0, 2000]
    b = out[out["host"] == "b.test"]
    # no robots row → default delay; tracking param stripped
    assert list(b["url"]) == ["https://b.test/p?id=7"]
    assert list(b["delay_ms"]) == [1000]
    assert len(out) == 3


def test_frontier_job_entrypoint(ray_session, tmp_path):
    """tools/frontier_job.py end to end on an existing Ray session."""
    import json
    import sys
    import pyarrow.parquet as pq

    sys.path.insert(0, "tools")
    import io
    from contextlib import redirect_stdout

    import frontier_job

    sm = tmp_path / "sitemaps.parquet"
    rb = tmp_path / "robots.parquet"
    out = tmp_path / "frontier"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "sitemap_xml": pa.array([
            make_sitemap_xml([{"loc": "https://j.test/a"},
                              {"loc": "https://j.test/b"}]),
            make_sitemap_xml([{"loc": "https://k.test/x"}]),
        ], pa.string()),
    }), sm)
    pq.write_table(pa.table({
        "host": pa.array(["j.test"], pa.string()),
        "robots_txt": pa.array(["User-agent: *\nCrawl-delay: 2"],
                               pa.string()),
    }), rb)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = frontier_job.main(["--sitemaps", str(sm),
                                "--robots", str(rb),
                                "--output", str(out)])
    assert rc == 0
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rec["slots"] == 3 and rec["hosts"] == 2
