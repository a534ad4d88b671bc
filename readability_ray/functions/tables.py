"""HTML table extraction — the web-data-harvesting operator that
turns ``<table>`` markup into relational (url, table_idx, row_idx,
col_idx, is_header, cell_text) rows a downstream pipeline can query,
join, or train on.

Runs on the engine's REAL parser (parser.py — the oracle-pinned
htmlparser2-semantics VDOM): tables are found in document pre-order
(``getElementsByTagName`` semantics, nested tables surface as their
own ``table_idx`` AND as text inside the outer cell, exactly as the
DOM nests them); rows are the ``<tr>`` descendants of each table that
belong to IT and not to a nested table; cells are a row's direct
``th``/``td`` children; cell text is ``getInnerText`` (trimmed,
whitespace-normalized — the reference's text semantics,
src/dom.ts:187-209).

Scale shape: ONE stateless vectorized ``map_batches`` explode over
the pages table — per-row parse cost is the extraction-stage class;
zero shuffle, no state.

Reference parity note: the reference renders tables to GFM markdown
(src/format/markdown.ts:338-402) but never exposes them as data; this
is new-engine corpus surface built on the same VDOM.
"""

from __future__ import annotations

import pyarrow as pa

from ..parser import parse_html
from ..vdom import ELEMENT, get_inner_text


def _collect_tables(node, out) -> None:
    if node.nodeType != ELEMENT:
        return
    if node.tag == "table":
        out.append(node)
    for c in node.children:
        _collect_tables(c, out)


def _collect_rows(node, out) -> None:
    """tr descendants of a table, skipping nested tables (their rows
    belong to the inner table's own record)."""
    for c in node.children:
        if c.nodeType != ELEMENT or c.tag == "table":
            continue
        if c.tag == "tr":
            out.append(c)
        else:
            _collect_rows(c, out)


def extract_tables(html: str) -> list[dict]:
    """One document → cell records.  Never raises on hostile input
    beyond what parse_html guarantees."""
    doc = parse_html(html or "")
    tables: list = []
    _collect_tables(doc.document_element, tables)
    recs: list[dict] = []
    for t_idx, table in enumerate(tables):
        rows: list = []
        _collect_rows(table, rows)
        for r_idx, tr in enumerate(rows):
            c_idx = 0
            for cell in tr.children:
                if cell.nodeType != ELEMENT or \
                        cell.tag not in ("td", "th"):
                    continue
                recs.append({
                    "table_idx": t_idx,
                    "row_idx": r_idx,
                    "col_idx": c_idx,
                    "is_header": cell.tag == "th",
                    "cell_text": get_inner_text(cell),
                })
                c_idx += 1
    return recs


def page_tables(pages, *,
                url_col: str = "url",
                html_col: str = "html"):
    """Explode every page's tables into cell rows: ONE stateless map,
    zero shuffle.  Output: (url, table_idx, row_idx, col_idx,
    is_header, cell_text)."""
    from ..vdom import ensure_recursion_headroom
    from .util import strip_schema_metadata

    def explode(batch: pa.Table) -> pa.Table:
        ensure_recursion_headroom()
        urls, ti, ri, ci, hdr, txt = [], [], [], [], [], []
        for url, html in zip(batch.column(url_col).to_pylist(),
                             batch.column(html_col).to_pylist()):
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            for r in extract_tables(html):
                urls.append(url)
                ti.append(r["table_idx"])
                ri.append(r["row_idx"])
                ci.append(r["col_idx"])
                hdr.append(r["is_header"])
                txt.append(r["cell_text"])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "table_idx": pa.array(ti, pa.int64()),
            "row_idx": pa.array(ri, pa.int64()),
            "col_idx": pa.array(ci, pa.int64()),
            "is_header": pa.array(hdr, pa.bool_()),
            "cell_text": pa.array(txt, pa.string()),
        })

    return strip_schema_metadata(
        pages.select_columns([url_col, html_col])) \
        .map_batches(explode, batch_format="pyarrow")
