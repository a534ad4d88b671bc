"""PDF text extraction over binary columns (north-rule "PDF/layout
parse" clause).

Unlike the image/audio codecs (stubbed — no libraries in this
environment), PDF text CAN be genuinely extracted with the stdlib:
content streams are zlib/FlateDecode (or raw), and text sits in
``Tj``/``TJ``/``'``/``"`` show operators inside ``BT``/``ET`` blocks.
This module implements that real path:

- ``extract_pdf_text(pdf_bytes)``: scan ``stream``/``endstream``
  spans, inflate FlateDecode bodies, tokenize content streams
  (literal strings with octal/escape handling, hex strings, arrays),
  and emit text in content-stream order with line breaks at
  ``Td``/``TD``/``T*``/``'``/``"``/``ET``.
- ``pdf_text(ds)``: the Ray op — stateless ``map_batches`` over a
  ``large_binary`` column, per-row poison capture (a corrupt PDF
  yields an ``error`` value, never a failed block), small default
  batches because payloads are large.
- ``make_pdf(pages)``: deterministic minimal PDF writer (valid xref,
  FlateDecode content streams) so tests and synthetic corpora
  round-trip without any external tool.

Layout scope (honest): text is emitted in CONTENT-STREAM order — the
order the producer wrote it — with line structure from the text-
positioning operators.  Full visual layout analysis (multi-column
reflow by glyph coordinates) is out of scope; for machine-generated
and synthetic PDFs content order IS reading order.

No counterpart in the reference (HTML-only); this is part of the
engine's training-data operator family.
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa
import ray.data

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_PAGE_RE = re.compile(rb"/Type\s*/Page[\s/>]")
_WS = b" \t\r\n\f\x00"
_DELIM = b"()<>[]{}/%"
_ESCAPES = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}


def _read_literal(data: bytes, j: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal string starting at the '('."""
    n = len(data)
    depth = 1
    buf = bytearray()
    j += 1
    while j < n and depth:
        c = data[j]
        if c == 0x5C:  # backslash
            j += 1
            if j >= n:
                break
            e = data[j]
            if e in _ESCAPES:
                buf.append(_ESCAPES[e])
                j += 1
            elif 0x30 <= e <= 0x37:  # \ddd octal (1-3 digits)
                digits = chr(e)
                j += 1
                for _ in range(2):
                    if j < n and 0x30 <= data[j] <= 0x37:
                        digits += chr(data[j])
                        j += 1
                    else:
                        break
                buf.append(int(digits, 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                j += 1
                if e == 0x0D and j < n and data[j] == 0x0A:
                    j += 1
            else:  # \( \) \\ and unknown escapes: literal char
                buf.append(e)
                j += 1
        elif c == 0x28:
            depth += 1
            buf.append(c)
            j += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                buf.append(c)
            j += 1
        else:
            buf.append(c)
            j += 1
    return buf.decode("latin-1"), j


def _read_hex(data: bytes, j: int) -> tuple[str, int]:
    """Parse a ``<...>`` hex string starting at the '<'."""
    end = data.find(b">", j + 1)
    if end == -1:
        end = len(data)
    hx = data[j + 1:end].translate(None, _WS)
    if len(hx) % 2:
        hx += b"0"
    try:
        s = bytes.fromhex(hx.decode("ascii")).decode("latin-1")
    except (ValueError, UnicodeDecodeError):
        s = ""
    return s, end + 1


def _content_text(data: bytes) -> str:
    """Text-showing pass over one decoded content stream."""
    parts: list[str] = []
    strings: list[str] = []  # string operands since the last operator
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == 0x28:  # (
            s, i = _read_literal(data, i)
            strings.append(s)
        elif c == 0x3C:  # < — hex string unless dict <<
            if i + 1 < n and data[i + 1] == 0x3C:
                i += 2
            else:
                s, i = _read_hex(data, i)
                strings.append(s)
        elif c == 0x25:  # % comment to end of line
            nl = data.find(b"\n", i)
            i = n if nl == -1 else nl + 1
        elif (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c in b"'\"*":
            j = i
            while j < n and data[j] not in _WS and data[j] not in _DELIM:
                j += 1
            op = data[i:j]
            i = j
            if op == b"Tj":
                if strings:
                    parts.append(strings[-1])
            elif op == b"TJ":
                parts.append("".join(strings))
            elif op in (b"'", b'"'):
                parts.append("\n")
                if strings:
                    parts.append(strings[-1])
            elif op in (b"Td", b"TD", b"T*", b"ET"):
                parts.append("\n")
            strings.clear()  # every operator consumes its operands
        else:
            i += 1
    text = "".join(parts)
    lines = [ln.strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_pdf_text(pdf: bytes) -> tuple[str, int]:
    """(text, n_pages) from raw PDF bytes.

    Scans every stream object; FlateDecode bodies are inflated with
    zlib, unfiltered bodies used raw; only streams containing a
    ``BT`` text block contribute.  Unsupported filters (DCT, LZW, …)
    are skipped silently — their text is not reachable without codec
    libraries, and partial output beats none."""
    if not pdf.startswith(b"%PDF"):
        raise ValueError("not a PDF: missing %PDF header")
    texts: list[str] = []
    for m in _STREAM_RE.finditer(pdf):
        start = m.end()
        end = pdf.find(b"endstream", start)
        if end == -1:
            continue
        body = pdf[start:end]
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n"):
            body = body[:-1]
        if b"/FlateDecode" in m.group(1):
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        elif b"/Filter" in m.group(1):
            continue  # unsupported filter
        if b"BT" in body:
            t = _content_text(body)
            if t:
                texts.append(t)
    n_pages = len(_PAGE_RE.findall(pdf))
    return "\n".join(texts), n_pages


def _pdf_batch(batch: pa.Table, payload_col: str,
               id_col: str) -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    payloads = batch.column(payload_col).to_pylist()
    out_text, out_pages, out_err = [], [], []
    for payload in payloads:
        try:
            text, n_pages = extract_pdf_text(bytes(payload or b""))
            out_text.append(text)
            out_pages.append(n_pages)
            out_err.append("")
        except Exception as exc:  # poison PDF → error row
            out_text.append("")
            out_pages.append(0)
            out_err.append(f"{type(exc).__name__}: {exc}"[:200])
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_pages": pa.array(out_pages, pa.int32()),
        "text": pa.array(out_text, pa.large_string()),
        "error": pa.array(out_err, pa.string()),
    })


def pdf_text(ds: ray.data.Dataset, *, payload_col: str = "pdf",
             id_col: str = "doc_id",
             batch_size: int = 16) -> ray.data.Dataset:
    """Distributed PDF text extraction: stateless-task ``map_batches``
    over the binary column (pure-function kernel — no per-worker state
    to amortize, so no actor pool), small batches because payloads are
    megabytes.  Output: (id, n_pages, text, error)."""
    import functools
    fn = functools.partial(_pdf_batch, payload_col=payload_col,
                           id_col=id_col)
    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


# ---- deterministic minimal PDF writer (tests / synthetic corpora) ---------

def _pdf_escape(line: str) -> bytes:
    raw = line.encode("latin-1", errors="replace")
    return raw.replace(b"\\", b"\\\\") \
        .replace(b"(", b"\\(").replace(b")", b"\\)")


def make_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Minimal valid PDF (header, objects, xref, trailer): one content
    stream per page, ``Td``-positioned lines, FlateDecode by default.
    Deterministic: same input → same bytes."""
    objs: list[bytes] = []  # bodies; object number = index + 1
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count "
                f"{n_pages} >>".encode())
    for i, lines in enumerate(pages):
        page_obj = 3 + 2 * i
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {page_obj + 1} 0 R "
            f"/MediaBox [0 0 612 792] /Resources << /Font << /F1 "
            f"{3 + 2 * n_pages} 0 R >> >> >>".encode())
        ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for k, line in enumerate(lines):
            if k:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _pdf_escape(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            stream = zlib.compress(stream, 6)
            filt = b" /Filter /FlateDecode"
        else:
            filt = b""
        objs.append(b"<< /Length " + str(len(stream)).encode() + filt
                    + b" >>\nstream\n" + stream + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
