"""Charset sniff ladder: BOM > Content-Type > meta > utf-8 fallback;
lossless round trips, legacy encodings, misdeclarations, garbage.
"""

import codecs

import pyarrow as pa
import pytest

from readability_ray.sources.charset import (
    charset_decode, decode_html, sniff_charset,
)

DOC = '<html><head><title>Héllo</title></head><body>café</body></html>'


def test_bom_beats_meta():
    data = codecs.BOM_UTF16_LE + DOC.encode("utf-16-le")
    assert sniff_charset(data) == "utf-16-le"
    text, enc = decode_html(data)
    assert text == DOC and enc == "utf-16-le"  # BOM stripped


def test_utf8_sig():
    data = codecs.BOM_UTF8 + DOC.encode("utf-8")
    text, enc = decode_html(data)
    assert text == DOC and enc == "utf-8-sig"


def test_content_type_beats_meta():
    html = ('<html><head><meta charset="utf-8"></head>'
            '<body>caf\xe9</body></html>')
    data = html.encode("cp1252")
    text, enc = decode_html(data, "text/html; charset=windows-1252")
    assert enc == "cp1252" and "café" in text


def test_meta_charset_cp1252():
    html = ('<html><head><meta charset="windows-1252"></head>'
            '<body>d\xe9j\xe0 vu</body></html>')
    text, enc = decode_html(html.encode("cp1252"))
    assert enc == "cp1252" and "déjà vu" in text


def test_meta_http_equiv_form():
    html = ('<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=ISO-8859-1"></head>'
            '<body>\xfcber</body></html>')
    text, enc = decode_html(html.encode("latin-1"))
    assert enc == "iso8859-1" and "über" in text


def test_unknown_label_falls_back():
    html = '<meta charset="klingon-9"><body>x</body>'
    assert sniff_charset(html.encode()) == "utf-8"


def test_misdeclared_charset_never_raises():
    # declared utf-16 via meta but the body is not valid utf-16 of
    # anything sensible — must fall back, never raise
    data = b'<meta charset="utf-16"><body>abc</body>'
    text, enc = decode_html(data)
    assert "!utf-8-replace" in enc or text  # decoded something


def test_garbage_bytes_never_raise():
    text, enc = decode_html(b"\xff\xfe\xfd\xfc\xfb" * 7)
    assert isinstance(text, str)


def test_x_user_defined_maps_latin1():
    data = b'<meta charset="x-user-defined"><body>\xa9</body>'
    text, enc = decode_html(data)
    assert enc == "iso8859-1"


def test_charset_decode_op(ray_session):
    import ray.data
    rows = pa.table({
        "url": pa.array(["a", "b"], pa.string()),
        "html": pa.array(
            [DOC.encode("utf-8"),
             codecs.BOM_UTF16_BE + DOC.encode("utf-16-be")],
            pa.large_binary()),
    })
    out = charset_decode(ray.data.from_arrow(rows)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(out["charset"]) == ["utf-8", "utf-16-be"]
    assert out.loc[0, "html"] == out.loc[1, "html"] \
        == DOC.encode("utf-8")


def test_run_extraction_sniffs_charset(ray_session, tmp_path):
    """A cp1252 page with a meta charset extracts real accented text
    (not mojibake) when sniff_charset=True."""
    import datetime

    from readability_ray.pipelines import run_extraction
    from readability_ray.sources.warc import write_warc

    body = "".join(f"<p>Un caf\xe9 fran\xe7ais num\xe9ro {i} avec "
                   f"beaucoup de mots pour l'extracteur.</p>"
                   for i in range(6))
    html = ('<html><head><meta charset="windows-1252">'
            '<title>Caf\xe9</title></head><body><main><article>'
            + body + "</article></main></body></html>").encode("cp1252")
    in_dir = tmp_path / "in"
    write_warc(str(in_dir / "s.warc.gz"),
               [{"url": "https://t/1",
                 "warc_ts": datetime.datetime(2024, 1, 1),
                 "html": html,
                 "content_type": "text/html"}])
    out = run_extraction(str(in_dir), sniff_charset=True,
                         use_actors=False).to_pandas()
    assert len(out) == 1
    assert "café français" in out.loc[0, "markdown"]
    # without sniffing the same page decodes as mojibake
    raw = run_extraction(str(in_dir), use_actors=False).to_pandas()
    assert "café français" not in raw.loc[0, "markdown"]
