"""Charset sniffing for crawl ingestion — the WHATWG encoding-sniff
ladder a real Common Crawl pipeline needs before HTML parsing (several
percent of the web is still not UTF-8):

    1. byte-order mark (UTF-8-sig / UTF-16 LE / UTF-16 BE / UTF-32)
    2. ``charset=`` parameter of the HTTP Content-Type header
    3. ``<meta charset=...>`` / ``<meta http-equiv="content-type">``
       scanned in the first 2048 bytes (the spec's prescan, with the
       spec's 1024-byte window widened for tag-soup tolerance)
    4. UTF-8 fallback

Unknown or misdeclared labels fall back to UTF-8; decoding never
throws (``errors="replace"`` at the last resort) — a poison page must
surface as replacement characters, not a job failure.

``charset_decode`` is the Ray-side op: one stateless vectorized map
re-encoding every page to clean UTF-8 bytes beside a ``charset``
column, so everything downstream (the extraction stages parse UTF-8)
stays unchanged.  The reference library takes JS strings and never
faces this (fetch decodes); this is the engine's crawl-native
ingestion fidelity layer.
"""

from __future__ import annotations

import codecs
import re

import pyarrow as pa
import ray.data

_BOMS = [
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]

_CT_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)",
                            re.IGNORECASE)
_META_RE = re.compile(
    rb"<meta[^>]+?(?:charset\s*=\s*[\"']?([\w.:-]+)"
    rb"|content\s*=\s*[\"'][^\"'>]*?charset=([\w.:-]+))",
    re.IGNORECASE | re.DOTALL)

_PRESCAN_BYTES = 2048


def _normalize_label(label: str) -> str | None:
    """Encoding label → a Python codec name, or None if unknown.
    The WHATWG x-user-defined label maps to latin-1 (byte-preserving
    for the ASCII-compatible range this engine cares about)."""
    label = label.strip().strip(";").lower()
    if label in ("x-user-defined",):
        label = "latin-1"
    try:
        return codecs.lookup(label).name
    except LookupError:
        return None


def sniff_charset(data: bytes, content_type: str = "") -> str:
    """The sniffed codec name (see the module ladder)."""
    for bom, name in _BOMS:
        if data[:len(bom)] == bom:
            return name
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            enc = _normalize_label(m.group(1))
            if enc:
                return enc
    m = _META_RE.search(data[:_PRESCAN_BYTES])
    if m:
        raw = (m.group(1) or m.group(2)).decode("ascii",
                                                errors="replace")
        enc = _normalize_label(raw)
        if enc:
            return enc
    return "utf-8"


def decode_html(data: bytes,
                content_type: str = "") -> tuple[str, str]:
    """(decoded text, charset actually used).  Never raises: a
    misdeclared charset falls back to UTF-8-replace (and reports
    ``<sniffed>!utf-8-replace``)."""
    enc = sniff_charset(data, content_type)
    body = data
    for bom, name in _BOMS:
        # utf-8-sig's codec strips its own BOM; the fixed-width
        # codecs keep it as U+FEFF, so slice it off here
        if name == enc and name != "utf-8-sig" \
                and data[:len(bom)] == bom:
            body = data[len(bom):]
            break
    try:
        return body.decode(enc), enc
    except (UnicodeDecodeError, LookupError):
        return data.decode("utf-8", errors="replace"), \
            f"{enc}!utf-8-replace"


def charset_decode(ds: ray.data.Dataset, *, html_col: str = "html",
                   content_type_col: str | None = None
                   ) -> ray.data.Dataset:
    """Re-encode every page to UTF-8 bytes + a ``charset`` column —
    one stateless vectorized map, no exchange; drop it in front of
    ``extract_pipeline`` for non-UTF-8 crawls."""

    def decode(batch: pa.Table) -> pa.Table:
        htmls = batch.column(html_col).to_pylist()
        ctypes = (batch.column(content_type_col).to_pylist()
                  if content_type_col
                  and content_type_col in batch.schema.names
                  else [""] * batch.num_rows)
        out_html, out_cs = [], []
        for h, ct in zip(htmls, ctypes):
            text, enc = decode_html(bytes(h or b""), ct or "")
            out_html.append(text.encode("utf-8"))
            out_cs.append(enc)
        cols = {name: batch.column(name)
                for name in batch.schema.names}
        cols[html_col] = pa.array(out_html, pa.large_binary())
        cols["charset"] = pa.array(out_cs, pa.string())
        return pa.table(cols)

    return ds.map_batches(decode, batch_format="pyarrow")
