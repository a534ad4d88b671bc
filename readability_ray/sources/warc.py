"""WARC (Web ARChive, ISO 28500) source + sink — Common-Crawl-native
ingestion for the extraction pipeline.

The reference loads one page at a time over HTTP (``fetchLoader``,
reference cli.js:17-36); a 10^12-document crawl arrives instead as
WARC shards (Common Crawl's ``*.warc.gz``: every record is its OWN
gzip member, so a reader can stream member-at-a-time without ever
holding a whole shard).  This module provides

- ``write_warc`` / ``warc_record_bytes``  a deterministic CC-style
  writer (one gzip member per record, ``mtime=0`` so identical input
  → identical bytes) used by tests, fixtures and the sink;
- ``iter_warc_records``  a strict/lenient record parser over bytes
  (plain or multi-member gzip) for driver-side use;
- ``WarcDatasource`` / ``read_warc``  the Ray Data source: a
  ``FileBasedDatasource`` whose ``_read_stream`` parses records
  incrementally out of the (Arrow-decompressed) byte stream and
  yields bounded Arrow blocks — a 1 GB shard never materializes, and
  oversize poison records are DRAINED (counted + error row), not
  buffered;
- ``write_warc_shards``  the distributed sink: one ``map_batches``
  pass writing one ``.warc.gz`` per batch with atomic rename (the
  resume.py convention), returning a manifest Dataset.

Scale notes: reading is embarrassingly parallel (one task per shard
file, streaming within the file); block size is bounded by
``records_per_block`` × ``max_record_bytes`` regardless of shard
size.  The record schema matches the pages table contract
(url:string, warc_ts:timestamp[us], html:binary) so ``read_warc``
output feeds ``stages/extract_stage.py`` unchanged.
"""

from __future__ import annotations

import datetime
import gzip
import hashlib
import os
import zlib
from typing import Iterable, Iterator, Optional

import pyarrow as pa

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_MAX_HEADER_BYTES = 64 * 1024
_SOFTWARE = "readability-ray/0.3 (warc writer)"

# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _fmt_warc_date(ts: datetime.datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> datetime.datetime:
    s = s.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable WARC-Date: {s!r}")


def warc_record_bytes(url: str, warc_ts: datetime.datetime, html: bytes,
                      content_type: str = "text/html; charset=utf-8",
                      status: int = 200) -> bytes:
    """One deterministic uncompressed ``response`` record (WARC/1.0
    headers + HTTP/1.1 envelope).  Record-ID is derived from
    (url, ts) so the same page always serializes to the same bytes."""
    http = (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(html)}\r\n\r\n").encode("ascii") + html
    rid = hashlib.md5(f"{url}|{warc_ts.isoformat()}".encode()).hexdigest()
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
            f"WARC-Date: {_fmt_warc_date(warc_ts)}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n").encode("utf-8")
    return head + http + _HDR_END


def wet_record_bytes(url: str, warc_ts: datetime.datetime,
                     text: bytes) -> bytes:
    """One deterministic uncompressed ``conversion`` record — the WET
    (extracted-text) flavor Common Crawl publishes next to its WARCs:
    plain-text payload, no HTTP envelope, ``WARC-Refers-To`` pointing
    at the response record the same (url, ts) would produce."""
    rid = hashlib.md5(
        f"conv|{url}|{warc_ts.isoformat()}".encode()).hexdigest()
    ref = hashlib.md5(f"{url}|{warc_ts.isoformat()}".encode()).hexdigest()
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
            f"WARC-Refers-To: <urn:md5:{ref}>\r\n"
            f"WARC-Date: {_fmt_warc_date(warc_ts)}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(text)}\r\n\r\n").encode("utf-8")
    return head + text + _HDR_END


def _warcinfo_bytes(warc_ts: datetime.datetime) -> bytes:
    body = (f"software: {_SOFTWARE}\r\n"
            "format: WARC File Format 1.0\r\n").encode("ascii")
    rid = hashlib.md5(b"warcinfo|" + _fmt_warc_date(warc_ts).encode()) \
        .hexdigest()
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: warcinfo\r\n"
            f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
            f"WARC-Date: {_fmt_warc_date(warc_ts)}\r\n"
            f"Content-Type: application/warc-fields\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("utf-8")
    return head + body + _HDR_END


def write_warc(path: str, records: Iterable[dict], compress: bool = True,
               warcinfo: bool = True,
               record_type: str = "response") -> tuple[int, int]:
    """Write records (dicts with url, warc_ts, html and optional
    content_type/status) as a WARC file.  ``compress=True`` gives the
    Common-Crawl layout: every record its own gzip member
    (``mtime=0`` → byte-deterministic).  ``record_type="conversion"``
    writes WET-style extracted-text records (the ``html`` value is the
    plain-text payload bytes).  Returns (n_records, n_bytes).
    """
    if record_type not in ("response", "conversion"):
        raise ValueError(f"unknown record_type {record_type!r}")
    n = 0
    first_ts: Optional[datetime.datetime] = None
    chunks: list[bytes] = []
    for rec in records:
        ts = rec["warc_ts"]
        if isinstance(ts, str):
            ts = _parse_warc_date(ts)
        if first_ts is None:
            first_ts = ts
            if warcinfo:
                info = _warcinfo_bytes(first_ts)
                chunks.append(gzip.compress(info, 6, mtime=0)
                              if compress else info)
        if record_type == "conversion":
            raw = wet_record_bytes(rec["url"], ts, rec["html"])
        else:
            raw = warc_record_bytes(
                rec["url"], ts, rec["html"],
                content_type=rec.get("content_type",
                                     "text/html; charset=utf-8"),
                status=int(rec.get("status", 200)))
        chunks.append(gzip.compress(raw, 6, mtime=0) if compress else raw)
        n += 1
    data = b"".join(chunks)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return n, len(data)


# ---------------------------------------------------------------------------
# incremental parser
# ---------------------------------------------------------------------------


class WarcStreamParser:
    """Incremental WARC/1.0 parser over a PLAIN (already-decompressed)
    byte stream.  ``feed(chunk)`` returns the records completed by the
    chunk; memory is bounded: an oversize record (payload >
    ``max_record_bytes``) is drained chunk-by-chunk and reported as an
    error record rather than buffered.

    strict=True raises ValueError on malformed framing; strict=False
    stops at the first malformed byte and reports it once as an error
    record (a truncated tail of a crawl shard should poison one row,
    not the job).
    """

    def __init__(self, strict: bool = True,
                 max_record_bytes: int = 64 * 1024 * 1024):
        self._buf = bytearray()
        self._strict = strict
        self._max = max_record_bytes
        self._drain = 0          # bytes of an oversize payload left to skip
        self._drain_rec: Optional[dict] = None
        self._dead = False       # lenient mode: gave up on this stream

    def _fail(self, msg: str) -> list[dict]:
        if self._strict:
            raise ValueError(msg)
        self._dead = True
        self._buf.clear()
        return [{"warc_type": "error", "url": None, "warc_ts": None,
                 "payload": None, "error": msg}]

    def feed(self, chunk: bytes) -> list[dict]:
        if self._dead:
            return []
        self._buf += chunk
        out: list[dict] = []
        while True:
            if self._drain:
                take = min(self._drain, len(self._buf))
                del self._buf[:take]
                self._drain -= take
                if self._drain:
                    return out
                assert self._drain_rec is not None
                out.append(self._drain_rec)
                self._drain_rec = None
            # skip inter-record CRLFs
            i = 0
            while i < len(self._buf) and self._buf[i:i + 1] in (b"\r", b"\n"):
                i += 1
            if i:
                del self._buf[:i]
            if not self._buf:
                return out
            if not self._buf.startswith(b"WARC/"):
                if len(self._buf) < 5:
                    return out  # maybe a split "WARC/" prefix
                out.extend(self._fail("expected WARC/ record header"))
                return out
            end = self._buf.find(_HDR_END)
            if end < 0:
                if len(self._buf) > _MAX_HEADER_BYTES:
                    out.extend(self._fail("unterminated WARC header"))
                return out
            try:
                headers = self._parse_headers(bytes(self._buf[:end]))
                length = int(headers["content-length"])
            except (KeyError, ValueError, UnicodeDecodeError) as e:
                out.extend(self._fail(f"bad WARC header: {e}"))
                return out
            body_at = end + 4
            rec = self._make_record(headers)
            if length > self._max:
                rec["payload"] = None
                rec["error"] = f"oversize record ({length} bytes)"
                del self._buf[:body_at]
                self._drain = length
                self._drain_rec = rec
                continue
            if len(self._buf) < body_at + length:
                return out
            rec["payload"] = bytes(self._buf[body_at:body_at + length])
            del self._buf[:body_at + length]
            out.append(rec)

    def finish(self) -> list[dict]:
        """End of stream: an incomplete trailing record is an error."""
        if self._dead or not self._buf.strip(b"\r\n") and not self._drain:
            return []
        return self._fail("truncated WARC record at end of stream")

    @staticmethod
    def _parse_headers(block: bytes) -> dict:
        lines = block.decode("utf-8", errors="replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError("missing WARC version line")
        headers: dict[str, str] = {"_version": lines[0].strip()}
        for ln in lines[1:]:
            if not ln:
                continue
            k, sep, v = ln.partition(":")
            if not sep:
                raise ValueError(f"malformed header line {ln!r}")
            headers[k.strip().lower()] = v.strip()
        return headers

    @staticmethod
    def _make_record(headers: dict) -> dict:
        ts = None
        if "warc-date" in headers:
            try:
                ts = _parse_warc_date(headers["warc-date"])
            except ValueError:
                ts = None
        return {"warc_type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri"),
                "warc_ts": ts,
                "payload": None,
                "error": None}


def split_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """(status, content_type, body) from an HTTP response envelope.
    A payload without an HTTP status line is returned as the body
    whole (status 0) — CC 'conversion' records etc."""
    if not payload.startswith(b"HTTP/"):
        return 0, "", payload
    end = payload.find(_HDR_END)
    if end < 0:
        return 0, "", payload
    head = payload[:end].decode("latin-1")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return 0, "", payload
    ctype = ""
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, payload[end + 4:]


def iter_warc_records(data: bytes, strict: bool = True,
                      max_record_bytes: int = 64 * 1024 * 1024,
                      ) -> Iterator[dict]:
    """Parse a whole WARC byte string (plain, or gzip — single or
    multi-member).  Driver-side convenience; the Ray path streams."""
    if data[:2] == b"\x1f\x8b":
        plain = bytearray()
        rest = data
        while rest:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            plain += d.decompress(rest)
            plain += d.flush()
            rest = d.unused_data
        data = bytes(plain)
    p = WarcStreamParser(strict=strict, max_record_bytes=max_record_bytes)
    yield from p.feed(data)
    yield from p.finish()


# ---------------------------------------------------------------------------
# Ray Data source
# ---------------------------------------------------------------------------

_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("warc_ts", pa.timestamp("us")),
    pa.field("html", pa.binary()),
    pa.field("http_status", pa.int32()),
    pa.field("content_type", pa.string()),
    pa.field("error", pa.string()),
])


def _rows_to_block(rows: list[dict]) -> pa.Table:
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows],
                            pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "http_status": pa.array([r["http_status"] for r in rows],
                                pa.int32()),
        "content_type": pa.array([r["content_type"] for r in rows],
                                 pa.string()),
        "error": pa.array([r["error"] for r in rows], pa.string()),
    })


try:  # import-gated so pure-parser users don't need ray
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        """Streaming WARC reader: one read task per shard file; within
        a file, records are parsed incrementally off the decompressed
        stream (Ray/Arrow handle the multi-member gzip transparently —
        ``pa.Codec.detect`` keys off the ``.gz`` suffix) and emitted
        as Arrow blocks of ``records_per_block`` rows.  Non-response
        records (warcinfo/request/metadata) are skipped; malformed or
        oversize records become error ROWS, not job failures."""

        _FILE_EXTENSIONS = ["warc", "warc.gz", "warc.wet",
                            "warc.wet.gz"]

        def __init__(self, paths, records_per_block: int = 256,
                     strict: bool = False,
                     max_record_bytes: int = 64 * 1024 * 1024,
                     read_chunk_bytes: int = 1024 * 1024, **kwargs):
            kwargs.setdefault("file_extensions", self._FILE_EXTENSIONS)
            super().__init__(paths, **kwargs)
            self._records_per_block = records_per_block
            self._strict = strict
            self._max_record_bytes = max_record_bytes
            self._read_chunk_bytes = read_chunk_bytes

        def _read_stream(self, f, path: str):
            parser = WarcStreamParser(
                strict=self._strict,
                max_record_bytes=self._max_record_bytes)
            rows: list[dict] = []

            def emit(recs):
                for rec in recs:
                    # response = crawl WARC; conversion = WET
                    # (extracted text; no HTTP envelope → status 0)
                    if rec["warc_type"] not in ("response",
                                                "conversion", "error"):
                        continue
                    err = rec.get("error")
                    if err is None and rec["payload"] is not None:
                        if rec["warc_type"] == "response":
                            status, ctype, body = split_http_response(
                                rec["payload"])
                        else:
                            # conversion (WET) records never carry an
                            # HTTP envelope — a text payload that
                            # happens to start with b'HTTP/' must NOT
                            # be stripped (round-3 advice)
                            status, ctype, body = \
                                0, "", rec["payload"]
                        rows.append({"url": rec["url"],
                                     "warc_ts": rec["warc_ts"],
                                     "html": body,
                                     "http_status": status,
                                     "content_type": ctype,
                                     "error": None})
                    else:
                        rows.append({"url": rec.get("url"),
                                     "warc_ts": rec.get("warc_ts"),
                                     "html": None, "http_status": 0,
                                     "content_type": "",
                                     "error": err or "empty payload"})

            while True:
                chunk = f.read(self._read_chunk_bytes)
                if not chunk:
                    break
                emit(parser.feed(chunk))
                while len(rows) >= self._records_per_block:
                    yield _rows_to_block(rows[:self._records_per_block])
                    rows = rows[self._records_per_block:]
            emit(parser.finish())
            if rows:
                yield _rows_to_block(rows)

    def read_warc(paths, records_per_block: int = 256,
                  strict: bool = False,
                  max_record_bytes: int = 64 * 1024 * 1024,
                  **read_args):
        """``ray.data.Dataset`` over WARC shard files (a file, a list
        of files, or a directory).  Output schema: (url, warc_ts,
        html:binary, http_status, content_type, error) — the pages
        contract, directly consumable by the extraction stages."""
        import ray.data
        return ray.data.read_datasource(
            WarcDatasource(paths, records_per_block=records_per_block,
                           strict=strict,
                           max_record_bytes=max_record_bytes),
            **read_args)

except ImportError:  # pragma: no cover - ray is always present in env
    WarcDatasource = None  # type: ignore

    def read_warc(*a, **k):  # type: ignore
        raise RuntimeError("ray is required for read_warc")


# ---------------------------------------------------------------------------
# distributed sink
# ---------------------------------------------------------------------------


def write_warc_shards(ds, out_dir: str, compress: bool = True,
                      records_per_shard: int = 1024):
    """Distributed WARC sink: one ``map_batches`` pass, one
    ``.warc.gz`` per batch, atomic tmp→rename (the resume.py
    convention — a re-run overwrites, never interleaves).  Shard names
    are content-derived (md5 over the batch's urls) so the layout is
    deterministic given the same batch boundaries.  Returns the
    manifest as a Dataset: (shard_path, n_records, n_bytes,
    first_url, last_url)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({"shard_path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64()),
                             "first_url": pa.array([], pa.string()),
                             "last_url": pa.array([], pa.string())})
        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        htmls = batch.column("html").to_pylist()
        name = hashlib.md5(("\n".join(urls)).encode()).hexdigest()[:16]
        ext = ".warc.gz" if compress else ".warc"
        path = os.path.join(out_dir, f"part-{name}-{len(urls)}{ext}")
        n, n_bytes = write_warc(
            path,
            ({"url": u, "warc_ts": t, "html": h or b""}
             for u, t, h in zip(urls, tss, htmls)),
            compress=compress)
        return pa.table({"shard_path": pa.array([path], pa.string()),
                         "n_records": pa.array([n], pa.int64()),
                         "n_bytes": pa.array([n_bytes], pa.int64()),
                         "first_url": pa.array([urls[0]], pa.string()),
                         "last_url": pa.array([urls[-1]], pa.string())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=records_per_shard)


def write_wet_shards(ds, out_dir: str, compress: bool = True,
                     records_per_shard: int = 1024,
                     text_col: str = "extracted_text",
                     ts_col: str = "warc_ts"):
    """Distributed WET sink — the Common-Crawl extracted-text layout
    the extraction pipeline's output naturally exports to: one
    ``conversion`` record per row (plain-text payload, WARC-Refers-To
    the matching response record), one ``.warc.wet.gz`` per batch,
    atomic rename, deterministic content-derived shard names.  Rows
    need (url, ts_col, text_col); missing timestamps default to the
    fixture epoch.  Returns the manifest Dataset like
    :func:`write_warc_shards`."""
    os.makedirs(out_dir, exist_ok=True)
    epoch = datetime.datetime(2024, 1, 1)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({"shard_path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64()),
                             "first_url": pa.array([], pa.string()),
                             "last_url": pa.array([], pa.string())})
        urls = batch.column("url").to_pylist()
        tss = (batch.column(ts_col).to_pylist()
               if ts_col in batch.schema.names
               else [epoch] * batch.num_rows)
        texts = batch.column(text_col).to_pylist()
        name = hashlib.md5(("\n".join(urls)).encode()).hexdigest()[:16]
        ext = ".warc.wet.gz" if compress else ".warc.wet"
        path = os.path.join(out_dir, f"part-{name}-{len(urls)}{ext}")
        n, n_bytes = write_warc(
            path,
            ({"url": u, "warc_ts": t or epoch,
              "html": (x or "").encode("utf-8")
              if not isinstance(x, bytes) else x}
             for u, t, x in zip(urls, tss, texts)),
            compress=compress, record_type="conversion")
        return pa.table({"shard_path": pa.array([path], pa.string()),
                         "n_records": pa.array([n], pa.int64()),
                         "n_bytes": pa.array([n_bytes], pa.int64()),
                         "first_url": pa.array([urls[0]], pa.string()),
                         "last_url": pa.array([urls[-1]], pa.string())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=records_per_shard)


# ---------------------------------------------------------------------------
# deterministic fixture: documents table → WARC shards (for the
# SQL-oracled round-trip query and tests)
# ---------------------------------------------------------------------------

_DOC_EPOCH_S = 1704067200  # 2024-01-01T00:00:00Z


def doc_html_wrapper(doc_id: int, text: str) -> str:
    """The exact wrapper the warc_ingest oracle re-derives in SQL —
    keep both in sync character-for-character."""
    return (f"<html><head><title>Doc {doc_id}</title></head>"
            f"<body><p>{text}</p></body></html>")


def documents_warc_fixture(sf_dir: str,
                           cache_root: str = "/tmp/readability_ray",
                           docs_per_shard: int = 500) -> str:
    """Synthesize (once, cached) WARC shards from the driver's
    documents table: one response record per document, url
    ``https://warc.test/doc/<doc_id>``, date epoch+doc_id seconds,
    payload = ``doc_html_wrapper``.  Returns the shard directory."""
    import pyarrow.parquet as pq
    base = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(cache_root, f"warc-{base}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.isfile(marker):
        return out_dir
    import shutil
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    epoch = datetime.datetime(2024, 1, 1)
    for s in range(0, len(ids), docs_per_shard):
        recs = [{"url": f"https://warc.test/doc/{i}",
                 "warc_ts": epoch + datetime.timedelta(seconds=int(i)),
                 "html": doc_html_wrapper(i, x or "").encode("utf-8")}
                for i, x in zip(ids[s:s + docs_per_shard],
                                texts[s:s + docs_per_shard])]
        write_warc(os.path.join(out_dir,
                                f"shard-{s // docs_per_shard:04d}.warc.gz"),
                   recs)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
