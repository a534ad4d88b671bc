"""JS string semantics + WHATWG entity decoding edge cases."""

from readability_ray.entities import decode_attribute, decode_text_segments
from readability_ray.jsstr import (
    js_len, js_num_to_str, js_parse_float, js_substring, js_trim,
)


def test_js_trim_unicode():
    assert js_trim("  x ﻿") == "x"
    assert js_trim("   y 　") == "y"
    assert js_trim("") == ""
    assert js_trim("\t\n") == ""


def test_js_len_utf16():
    assert js_len("abc") == 3
    assert js_len("漢字") == 2          # BMP: 1 unit each
    assert js_len("a\U0001d11eb") == 4  # astral char = surrogate pair


def test_js_substring_utf16():
    assert js_substring("hello", 0, 3) == "hel"
    text = "a\U0001d11eb"
    assert js_substring(text, 0, 3) == "a\U0001d11e"


def test_js_parse_float():
    assert js_parse_float("12.5px") == 12.5
    assert js_parse_float("  3 ") == 3.0
    assert js_parse_float("-2e3") == -2000.0
    import math
    assert math.isnan(js_parse_float("abc"))


def test_js_num_to_str():
    assert js_num_to_str(1.0) == "1"
    assert js_num_to_str(1.5) == "1.5"
    assert js_num_to_str(float("nan")) == "NaN"
    assert js_num_to_str(3) == "3"


def test_entity_named_with_semicolon():
    assert decode_text_segments("&amp;") == ["&"]
    assert decode_text_segments("&copy;") == ["©"]


def test_entity_legacy_without_semicolon():
    assert decode_text_segments("&amp x") == ["&", " x"]
    assert decode_text_segments("&notit;") == ["¬", "it;"]


def test_entity_invalid_stays_literal_merged():
    # failed references merge with surrounding text (single segment ==
    # single text event, matching htmlparser2)
    assert decode_text_segments("a & b") == ["a & b"]
    assert decode_text_segments("&zzz;x") == ["&zzz;x"]
    assert decode_text_segments("100 &# 5") == ["100 &# 5"]


def test_entity_numeric():
    assert decode_text_segments("&#65;") == ["A"]
    assert decode_text_segments("&#x41;") == ["A"]
    assert decode_text_segments("&#128;") == ["€"]    # C1 → Windows-1252
    assert decode_text_segments("&#xD800;") == ["�"]  # surrogate
    assert decode_text_segments("&#1114112;") == ["�"]  # > 0x10FFFF


def test_entity_multi_codepoint_splits():
    # &acE; decodes to 2 code points → 2 text events in htmlparser2
    segments = decode_text_segments("&acE;")
    assert len(segments) == 2
    assert "".join(segments) == "∾̳"


def test_attribute_mode_blocks_legacy_before_alnum():
    assert decode_attribute("/x?a&not=1") == "/x?a&not=1"
    assert decode_attribute("a&not b") == "a¬ b"
    assert decode_attribute("q&amp;r") == "q&r"
    assert decode_attribute("&ampx") == "&ampx"  # followed by alnum
    assert decode_attribute("x&amp") == "x&"     # end of value decodes
