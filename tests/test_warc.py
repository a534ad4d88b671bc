"""WARC source/sink: writer↔parser round trips, streaming framing
edges, the Ray datasource, the distributed sink, and the
documents-table fixture the SQL-oracled ``warc_ingest`` query reads.
"""

import datetime
import gzip
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from readability_ray.sources.warc import (
    WarcStreamParser, doc_html_wrapper, documents_warc_fixture,
    iter_warc_records, read_warc, split_http_response, warc_record_bytes,
    write_warc, write_warc_shards)

EPOCH = datetime.datetime(2024, 1, 1)

SF = "/root/testdata/sf0.001"


def _recs(n=5):
    out = []
    for i in range(n):
        html = f"<html><body><p>page {i} 記事</p></body></html>" \
            .encode("utf-8")
        out.append({"url": f"https://example.test/p/{i}",
                    "warc_ts": EPOCH + datetime.timedelta(seconds=i),
                    "html": html})
    return out


def _responses(records):
    return [r for r in records if r["warc_type"] == "response"]


@pytest.mark.parametrize("compress", [False, True])
def test_round_trip(tmp_path, compress):
    recs = _recs()
    path = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    n, n_bytes = write_warc(path, recs, compress=compress)
    assert n == 5 and n_bytes == os.path.getsize(path)
    parsed = list(iter_warc_records(open(path, "rb").read()))
    assert [r["warc_type"] for r in parsed][0] == "warcinfo"
    resp = _responses(parsed)
    assert len(resp) == 5
    for want, got in zip(recs, resp):
        assert got["url"] == want["url"]
        assert got["warc_ts"] == want["warc_ts"]
        status, ctype, body = split_http_response(got["payload"])
        assert status == 200
        assert ctype.startswith("text/html")
        assert body == want["html"]


def test_writer_deterministic(tmp_path):
    p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    write_warc(p1, _recs())
    write_warc(p2, _recs())
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_binary_payload_and_empty(tmp_path):
    recs = [{"url": "https://example.test/bin",
             "warc_ts": EPOCH,
             "html": bytes(range(256)) * 3},
            {"url": "https://example.test/empty",
             "warc_ts": EPOCH, "html": b""}]
    path = str(tmp_path / "bin.warc.gz")
    write_warc(path, recs)
    resp = _responses(list(iter_warc_records(open(path, "rb").read())))
    assert split_http_response(resp[0]["payload"])[2] == recs[0]["html"]
    assert split_http_response(resp[1]["payload"])[2] == b""


def test_streaming_parser_chunked():
    """Records split at every possible 7-byte boundary still parse."""
    raw = b"".join(warc_record_bytes(f"https://t/{i}", EPOCH,
                                     f"body{i}".encode())
                   for i in range(4))
    p = WarcStreamParser()
    got = []
    for ofs in range(0, len(raw), 7):
        got.extend(p.feed(raw[ofs:ofs + 7]))
    got.extend(p.finish())
    assert [g["url"] for g in got] == [f"https://t/{i}" for i in range(4)]
    assert split_http_response(got[3]["payload"])[2] == b"body3"


def test_truncated_tail_strict_vs_lenient():
    raw = warc_record_bytes("https://t/0", EPOCH, b"x" * 100)
    p = WarcStreamParser(strict=True)
    p.feed(raw[:len(raw) - 40])
    with pytest.raises(ValueError):
        p.finish()
    p2 = WarcStreamParser(strict=False)
    out = p2.feed(raw[:len(raw) - 40])
    out.extend(p2.finish())
    assert len(out) == 1 and out[0]["warc_type"] == "error"
    assert "truncated" in out[0]["error"]


def test_garbage_prefix():
    with pytest.raises(ValueError):
        list(iter_warc_records(b"NOT A WARC FILE AT ALL\r\n\r\n"))
    out = list(iter_warc_records(b"NOT A WARC FILE AT ALL\r\n\r\n",
                                 strict=False))
    assert out and out[0]["warc_type"] == "error"


def test_oversize_record_drained_not_buffered():
    big = warc_record_bytes("https://t/big", EPOCH, b"y" * 10_000)
    small = warc_record_bytes("https://t/small", EPOCH, b"ok")
    p = WarcStreamParser(max_record_bytes=1000)
    got = []
    for ofs in range(0, len(big) + len(small), 512):
        got.extend(p.feed((big + small)[ofs:ofs + 512]))
        assert len(p._buf) < 2048  # payload never accumulates
    got.extend(p.finish())
    assert got[0]["error"] and "oversize" in got[0]["error"]
    assert got[1]["url"] == "https://t/small"
    assert split_http_response(got[1]["payload"])[2] == b"ok"


def test_non_response_records_skipped(ray_session, tmp_path):
    """Real CC shards interleave request/metadata records with the
    responses; the datasource must emit only the responses."""
    resp = warc_record_bytes("https://t/page", EPOCH, b"<html>hi</html>")
    req = resp.replace(b"WARC-Type: response",
                       b"WARC-Type: request", 1)
    meta = resp.replace(b"WARC-Type: response",
                        b"WARC-Type: metadata", 1)
    raw = req + resp + meta
    parsed = _responses(list(iter_warc_records(raw)))
    assert len(parsed) == 1 and parsed[0]["url"] == "https://t/page"
    p = str(tmp_path / "mix.warc.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(raw, mtime=0))
    df = read_warc(str(tmp_path)).to_pandas()
    assert len(df) == 1
    assert bytes(df.iloc[0]["html"]) == b"<html>hi</html>"


def test_read_warc_dataset(ray_session, tmp_path):
    recs = _recs(30)
    write_warc(str(tmp_path / "s0.warc.gz"), recs[:17])
    write_warc(str(tmp_path / "s1.warc.gz"), recs[17:])
    ds = read_warc(str(tmp_path), records_per_block=8)
    t = pa.concat_tables([pa.Table.from_pandas(b)
                          for b in [ds.to_pandas()]])
    df = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 30
    assert df["error"].isna().all()
    assert (df["http_status"] == 200).all()
    want = sorted(recs, key=lambda r: r["url"])
    assert list(df["url"]) == [r["url"] for r in want]
    assert [bytes(h) for h in df["html"]] == [r["html"] for r in want]
    assert list(df["warc_ts"]) == [r["warc_ts"] for r in want]


def test_read_warc_feeds_extraction(ray_session, tmp_path):
    """WARC ingest output plugs straight into the extraction stage."""
    html = ("<html><head><title>T</title></head><body><main><article>"
            + "".join(f"<p>Paragraph {i} with some real words in it, "
                      f"enough to score as content.</p>" for i in range(8))
            + "</article></main></body></html>").encode()
    write_warc(str(tmp_path / "x.warc.gz"),
               [{"url": "https://example.test/a", "warc_ts": EPOCH,
                 "html": html}])
    from readability_ray.stages.extract_stage import extract_batch_task
    ds = read_warc(str(tmp_path)).drop_columns(
        ["http_status", "content_type", "error"])
    out = ds.map_batches(extract_batch_task, batch_format="pyarrow") \
        .to_pandas()
    assert len(out) == 1
    assert "Paragraph 3" in out.iloc[0]["markdown"]


def test_write_warc_shards_round_trip(ray_session, tmp_path):
    import ray.data
    recs = _recs(25)
    src = pa.table({
        "url": [r["url"] for r in recs],
        "warc_ts": pa.array([r["warc_ts"] for r in recs],
                            pa.timestamp("us")),
        "html": pa.array([r["html"] for r in recs], pa.binary())})
    out_dir = str(tmp_path / "out")
    manifest = write_warc_shards(ray.data.from_arrow(src), out_dir,
                                 records_per_shard=10).to_pandas()
    assert manifest["n_records"].sum() == 25
    for p in manifest["shard_path"]:
        assert os.path.isfile(p)
    back = read_warc(out_dir).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert len(back) == 25
    assert [bytes(h) for h in back["html"]] == \
        [r["html"] for r in sorted(recs, key=lambda r: r["url"])]


def test_run_extraction_accepts_warc_input(ray_session, tmp_path):
    """run_extraction on a directory of .warc.gz shards — the
    CC-native end-to-end path (WARC → extract → parquet)."""
    from readability_ray.pipelines.extract_pipeline import run_extraction
    from readability_ray.sources.pages import generate_pages

    pages = generate_pages(40, seed=7)
    warc_dir = str(tmp_path / "crawl")
    urls = pages.column("url").to_pylist()
    tss = pages.column("warc_ts").to_pylist()
    htmls = pages.column("html").to_pylist()
    write_warc(warc_dir + "/seg0.warc.gz",
               [{"url": u, "warc_ts": t, "html": h}
                for u, t, h in zip(urls[:20], tss[:20], htmls[:20])])
    write_warc(warc_dir + "/seg1.warc.gz",
               [{"url": u, "warc_ts": t, "html": h}
                for u, t, h in zip(urls[20:], tss[20:], htmls[20:])])

    out_dir = str(tmp_path / "out")
    got = run_extraction(warc_dir, output_dir=out_dir,
                         use_actors=False).to_pandas()
    assert len(got) == 40
    assert set(got["url"]) == set(urls)
    # same bytes as the parquet path for a sample page
    import ray.data
    from readability_ray.pipelines import extract_pipeline
    want = extract_pipeline(ray.data.from_arrow(pages),
                            use_actors=False).to_pandas()
    merged = got.merge(want, on="url", suffixes=("_w", "_p"))
    assert (merged["markdown_w"] == merged["markdown_p"]).all()
    assert (merged["extracted_text_w"] == merged["extracted_text_p"]).all()


def test_resumable_extraction_over_warc_shards(ray_session, tmp_path):
    """run_resumable_extraction on raw crawl files: per-shard lineage
    manifests, and a rerun skips the finished WARC shard."""
    from readability_ray.pipelines.resume import run_resumable_extraction
    from readability_ray.sources.pages import generate_pages

    pages = generate_pages(24, seed=11)
    rows = list(zip(pages.column("url").to_pylist(),
                    pages.column("warc_ts").to_pylist(),
                    pages.column("html").to_pylist()))
    shards = []
    for si in range(2):
        p = str(tmp_path / f"crawl-{si}.warc.gz")
        write_warc(p, [{"url": u, "warc_ts": t, "html": h}
                       for u, t, h in rows[si * 12:(si + 1) * 12]])
        shards.append(p)

    out_dir = str(tmp_path / "out")
    summary = run_resumable_extraction(shards, out_dir)
    assert summary["processed"] == ["crawl-0", "crawl-1"]
    assert summary["total_rows"] == 24
    for si in range(2):
        assert os.path.isfile(os.path.join(
            out_dir, f"shard=crawl-{si}", "_manifest.json"))
    again = run_resumable_extraction(shards, out_dir)
    assert again["processed"] == [] and \
        again["skipped"] == ["crawl-0", "crawl-1"]


def test_documents_fixture_matches_table(ray_session, tmp_path):
    d = documents_warc_fixture(SF, cache_root=str(tmp_path))
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    got = read_warc(d).to_pandas()
    assert len(got) == len(docs)
    got["doc_id"] = got["url"].str.rsplit("/", n=1).str[1].astype("int64")
    merged = got.merge(docs, on="doc_id")
    assert len(merged) == len(docs)
    for _, row in merged.head(50).iterrows():
        want = doc_html_wrapper(int(row["doc_id"]), row["text"]) \
            .encode("utf-8")
        assert bytes(row["html"]) == want
    # md5 check over ALL rows (what the SQL oracle hashes)
    h_got = [hashlib.md5(bytes(h)).hexdigest() for h in merged["html"]]
    h_want = [hashlib.md5(doc_html_wrapper(int(i), t).encode()).hexdigest()
              for i, t in zip(merged["doc_id"], merged["text"])]
    assert h_got == h_want


def test_parser_fuzz_lenient_never_raises():
    """Arbitrary byte soup through the lenient parser: no exception,
    no unbounded buffering — crawl-tail garbage must cost one error
    row, never the job."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=400), st.integers(1, 64))
    def run(data, chunk):
        p = WarcStreamParser(strict=False, max_record_bytes=1000)
        out = []
        for ofs in range(0, len(data), chunk):
            out.extend(p.feed(data[ofs:ofs + chunk]))
        out.extend(p.finish())
        for rec in out:
            assert rec["warc_type"] == "error" or "warc-" not in rec

    run()


def test_parser_fuzz_valid_records_with_garbage_tail():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.binary(max_size=60), min_size=1, max_size=4),
           st.binary(min_size=1, max_size=50))
    def run(payloads, tail):
        raw = b"".join(warc_record_bytes(f"https://t/{i}", EPOCH, p)
                       for i, p in enumerate(payloads))
        p = WarcStreamParser(strict=False)
        out = p.feed(raw + b"GARBAGE" + tail)
        out.extend(p.finish())
        ok = [r for r in out if r["warc_type"] == "response"]
        # every valid record before the garbage is recovered intact
        assert len(ok) == len(payloads)
        for i, (rec, want) in enumerate(zip(ok, payloads)):
            assert split_http_response(rec["payload"])[2] == want

    run()


def test_arrow_multi_member_gzip_assumption(tmp_path):
    """read_warc relies on Arrow streaming across gzip members —
    pin that behavior so a pyarrow upgrade can't silently truncate
    ingestion to one record per shard."""
    from pyarrow import fs
    p = str(tmp_path / "m.gz")
    with open(p, "wb") as f:
        f.write(b"".join(gzip.compress(f"m{i}|".encode(), mtime=0)
                         for i in range(3)))
    got = fs.LocalFileSystem().open_input_stream(
        p, compression="gzip").read()
    assert got == b"m0|m1|m2|"


def test_wet_record_roundtrip():
    """conversion records: plain-text payload, no HTTP envelope,
    Refers-To the matching response record's id."""
    from readability_ray.sources.warc import (WarcStreamParser,
                                              warc_record_bytes,
                                              wet_record_bytes)
    text = "extracted text — unicode ok".encode()
    raw = wet_record_bytes("https://t/1", EPOCH, text)
    p = WarcStreamParser()
    recs = p.feed(raw) + p.finish()
    assert len(recs) == 1
    r = recs[0]
    assert r["warc_type"] == "conversion"
    assert r["payload"] == text
    status, ctype, body = split_http_response(r["payload"])
    assert status == 0 and body == text
    # Refers-To matches the response record's derived id
    resp = warc_record_bytes("https://t/1", EPOCH, b"x")
    rid = resp.split(b"WARC-Record-ID: ")[1].split(b"\r\n")[0]
    assert rid in raw
    # deterministic bytes
    assert raw == wet_record_bytes("https://t/1", EPOCH, text)


def test_wet_shards_roundtrip(ray_session, tmp_path):
    """write_wet_shards → read_warc: extracted text survives byte-
    for-byte; conversion records surface with http_status 0."""
    import ray.data

    from readability_ray.sources.warc import read_warc, write_wet_shards
    texts = [f"doc {i} text with words" for i in range(7)]
    ds = ray.data.from_items([
        {"url": f"https://t/{i}", "warc_ts": EPOCH,
         "extracted_text": t} for i, t in enumerate(texts)])
    out = str(tmp_path / "wet")
    manifest = write_wet_shards(ds, out, records_per_shard=3) \
        .to_pandas()
    assert manifest["n_records"].sum() == 7
    assert all(p.endswith(".warc.wet.gz")
               for p in manifest["shard_path"])
    back = read_warc(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert len(back) == 7
    assert (back["http_status"] == 0).all()
    got = {u: h.decode() for u, h in zip(back["url"], back["html"])}
    assert got == {f"https://t/{i}": t for i, t in enumerate(texts)}


def test_wet_payload_starting_with_http_is_not_stripped(ray_session,
                                                        tmp_path):
    """Round-3 advice: a WET text payload that happens to begin with
    'HTTP/' and contains a CRLFCRLF must come back whole — conversion
    records never carry an HTTP envelope, so the response-record
    envelope splitter must not run on them."""
    import ray.data

    from readability_ray.sources.warc import read_warc, write_wet_shards
    trap = "HTTP/1.1 200 OK\r\nX-Not: a-header\r\n\r\nactual body text"
    ds = ray.data.from_items([
        {"url": "https://t/trap", "warc_ts": EPOCH,
         "extracted_text": trap}])
    out = str(tmp_path / "wet-trap")
    write_wet_shards(ds, out, records_per_shard=3).materialize()
    back = read_warc(out).to_pandas()
    assert len(back) == 1
    assert back["http_status"][0] == 0
    assert bytes(back["html"][0]).decode() == trap


def test_run_extraction_warc_in_wet_out(ray_session, tmp_path):
    """The Common-Crawl job shape end-to-end: WARC shards in →
    extraction → WET conversion shards out; the WET payload is the
    page's extracted markdown."""
    from readability_ray.pipelines import run_extraction
    from readability_ray.sources.warc import read_warc, write_warc

    html = ("<html><head><title>T</title></head><body><main><article>"
            + "".join(f"<p>Paragraph {i} with enough words to pass the "
                      f"extractor threshold easily.</p>"
                      for i in range(6))
            + "</article></main></body></html>").encode()
    in_dir = tmp_path / "in"
    write_warc(str(in_dir / "s.warc.gz"),
               [{"url": f"https://t/{i}", "warc_ts": EPOCH,
                 "html": html} for i in range(4)])
    wet_dir = str(tmp_path / "wet")
    out = run_extraction(str(in_dir), wet_dir=wet_dir,
                         use_actors=False).to_pandas()
    assert len(out) == 4
    back = read_warc(wet_dir).to_pandas()
    assert len(back) == 4
    assert (back["http_status"] == 0).all()
    md = {u: h.decode() for u, h in zip(back["url"], back["html"])}
    got = {u: m for u, m in zip(out["url"], out["markdown"])}
    assert md == got
    assert all("Paragraph 0" in m for m in md.values())
