"""PDF text extraction (functions/pdftext.py): real FlateDecode
content-stream parsing with the stdlib, round-tripped through the
deterministic minimal PDF writer, plus the distributed Ray op."""

import zlib

import pytest

from readability_ray.functions.pdftext import (
    extract_pdf_text, make_pdf, pdf_text)


def test_roundtrip_multipage():
    pdf = make_pdf([["Hello world", "second line"], ["page two"]])
    text, n_pages = extract_pdf_text(pdf)
    assert n_pages == 2
    assert text.split("\n") == ["Hello world", "second line", "page two"]


def test_roundtrip_escapes():
    lines = ["parens (nested) here", "back\\slash", "trailing )"]
    text, _ = extract_pdf_text(make_pdf([lines]))
    assert text.split("\n") == lines


def test_uncompressed_stream():
    text, n_pages = extract_pdf_text(
        make_pdf([["no filter"]], compress=False))
    assert (text, n_pages) == ("no filter", 1)


def test_hex_strings_tj_arrays_and_quote_op():
    content = b"BT (a) Tj [(b) -120 (c)] TJ <48454c4c4f> Tj (next)' ET"
    raw = (b"%PDF-1.4\n1 0 obj << /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content
           + b"\nendstream endobj\n/Type /Page \n%%EOF")
    text, n_pages = extract_pdf_text(raw)
    assert text == "abcHELLO\nnext"
    assert n_pages == 1


def test_octal_escapes():
    content = rb"BT (\101\102\103 \050x\051) Tj ET"
    raw = (b"%PDF-1.4\n<< /Length 1 >>\nstream\n" + content
           + b"\nendstream\n/Type /Page ")
    text, _ = extract_pdf_text(raw)
    assert text == "ABC (x)"


def test_unsupported_filter_skipped():
    body = zlib.compress(b"BT (visible) Tj ET")
    raw = (b"%PDF-1.4\n"
           b"<< /Filter /DCTDecode /Length 3 >>\nstream\n\xff\xd8\xff"
           b"\nendstream\n"
           b"<< /Filter /FlateDecode /Length " + str(len(body)).encode()
           + b" >>\nstream\n" + body + b"\nendstream\n/Type /Page ")
    text, _ = extract_pdf_text(raw)
    assert text == "visible"


def test_not_a_pdf_raises():
    with pytest.raises(ValueError):
        extract_pdf_text(b"<html>not a pdf</html>")


def test_corrupt_flate_stream_skipped():
    raw = (b"%PDF-1.4\n<< /Filter /FlateDecode /Length 9 >>\nstream\n"
           b"notflate!\nendstream\n/Type /Page ")
    text, n_pages = extract_pdf_text(raw)
    assert text == ""
    assert n_pages == 1


def test_pdf_text_ray_op(ray_session):
    import ray.data
    rows = [{"doc_id": i,
             "pdf": make_pdf([[f"document {i}", "shared tail line"]])}
            for i in range(8)]
    rows.append({"doc_id": 99, "pdf": b"corrupt bytes"})
    df = pdf_text(ray.data.from_items(rows)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 9
    good = df[df.doc_id < 99]
    assert (good.error == "").all()
    assert (good.n_pages == 1).all()
    assert good.text.iloc[3] == "document 3\nshared tail line"
    bad = df[df.doc_id == 99].iloc[0]
    assert bad.error.startswith("ValueError")
    assert bad.text == ""
