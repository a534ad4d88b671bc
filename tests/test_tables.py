"""HTML table extraction through the real parser."""

import pyarrow as pa

from readability_ray.functions.tables import extract_tables, page_tables


def test_basic_table_with_header():
    recs = extract_tables(
        "<table><thead><tr><th>A</th><th> B </th></tr></thead>"
        "<tbody><tr><td>1</td><td>2  3</td></tr></tbody></table>")
    assert [(r["row_idx"], r["col_idx"], r["is_header"], r["cell_text"])
            for r in recs] == [
        (0, 0, True, "A"), (0, 1, True, "B"),
        (1, 0, False, "1"), (1, 1, False, "2 3")]


def test_nested_table_own_index_and_outer_text():
    recs = extract_tables(
        "<table><tr><td>outer<table><tr><td>inner</td></tr></table>"
        "</td></tr></table>")
    outer = [r for r in recs if r["table_idx"] == 0]
    inner = [r for r in recs if r["table_idx"] == 1]
    assert outer[0]["cell_text"] == "outerinner"  # DOM text nesting
    assert inner == [{"table_idx": 1, "row_idx": 0, "col_idx": 0,
                      "is_header": False, "cell_text": "inner"}]


def test_no_tables_and_hostile():
    assert extract_tables("<p>plain</p>") == []
    assert extract_tables("") == []
    extract_tables("<table><tr><td>unclosed")
    extract_tables("\x00<table")


def test_non_cell_children_skipped():
    recs = extract_tables(
        "<table><tr><td>a</td><script>x</script><td>b</td></tr>"
        "</table>")
    assert [r["col_idx"] for r in recs] == [0, 1]


def test_page_tables_ray_op(ray_session):
    import ray.data
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://a.test/1", "https://a.test/2"],
                        pa.string()),
        "html": pa.array([
            b"<table><tr><td>x</td></tr></table>", b"<p>none</p>",
        ], pa.binary()),
    }))
    out = page_tables(ds).to_pandas()
    assert len(out) == 1
    assert out["cell_text"].iloc[0] == "x"
    assert out["url"].iloc[0] == "https://a.test/1"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_extract_tables_never_raises(html):
    assert isinstance(extract_tables(html), list)
