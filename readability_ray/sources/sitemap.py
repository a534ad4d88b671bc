"""Sitemap ingestion — the crawl-frontier source that tells a fetch
pipeline WHAT to crawl (robots.py tells it what it may crawl).

Parses sitemaps.org XML (``<urlset>`` URL sitemaps and
``<sitemapindex>`` index files) with the stdlib ElementTree pull
parser, namespace-agnostic (real-world sitemaps mix default/prefixed/
absent namespaces).  Malformed XML yields an error row, never a job
failure — crawl inputs are hostile.

Scale shape: sitemaps arrive as ordinary crawl documents (one XML
body per row); ``sitemap_entries`` is ONE stateless vectorized
``map_batches`` explode — no exchange, the URL frontier streams out
as (source_id, kind, loc, lastmod, changefreq, priority, error).

``make_sitemap_xml`` is the byte-deterministic writer twin (fixed
attribute order, no timestamps) so round trips are exact — the same
writer→parser oracle technique as sources/warc.py.

No reference counterpart (crawl-side source; the reference fetches a
single page).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

_SITEMAP_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def make_sitemap_xml(entries: list[dict], index: bool = False) -> str:
    """Deterministic sitemaps.org XML.  ``entries`` are dicts with
    ``loc`` (required) and optional ``lastmod``/``changefreq``/
    ``priority``; ``index=True`` emits a ``<sitemapindex>`` of
    ``<sitemap>`` children (loc/lastmod only, per the spec)."""
    root = "sitemapindex" if index else "urlset"
    child = "sitemap" if index else "url"
    fields = ("loc", "lastmod") if index else _SITEMAP_FIELDS
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<{root} xmlns="http://www.sitemaps.org/schemas/'
             'sitemap/0.9">']
    for e in entries:
        parts.append(f"<{child}>")
        for f in fields:
            v = e.get(f)
            if v is not None:
                s = str(v).replace("&", "&amp;").replace("<", "&lt;") \
                    .replace(">", "&gt;")
                parts.append(f"<{f}>{s}</{f}>")
        parts.append(f"</{child}>")
    parts.append(f"</{root}>")
    return "\n".join(parts)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(xml: str) -> list[dict]:
    """One sitemap body → entry dicts (kind 'url' for urlset children,
    'sitemap' for index children; loc stripped; missing fields None).
    Raises ValueError on malformed XML or a non-sitemap root."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise ValueError(f"malformed sitemap XML: {exc}") from exc
    root_name = _local(root.tag)
    if root_name == "urlset":
        kind = "url"
    elif root_name == "sitemapindex":
        kind = "sitemap"
    else:
        raise ValueError(f"not a sitemap root: <{root_name}>")
    out = []
    for node in root:
        entry: dict = {"kind": kind, "loc": None, "lastmod": None,
                       "changefreq": None, "priority": None}
        for field in node:
            name = _local(field.tag)
            if name in _SITEMAP_FIELDS:
                entry[name] = (field.text or "").strip() or None
        if entry["loc"] is not None:
            out.append(entry)
    return out


def sitemap_entries(ds, *,
                    xml_col: str = "sitemap_xml",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Explode a table of sitemap bodies into the URL frontier.

    Output: (id_col, kind, loc, lastmod, changefreq, priority, error)
    — one row per entry; a malformed body becomes ONE error row with
    null loc.  Stateless vectorized map, zero shuffle."""
    from ..functions.util import strip_schema_metadata

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        xmls = batch.column(xml_col).to_pylist()
        o_id, o_kind, o_loc, o_lm, o_cf, o_pr, o_err = \
            [], [], [], [], [], [], []
        for i, x in zip(ids, xmls):
            try:
                entries = parse_sitemap(x or "")
            except ValueError as exc:
                o_id.append(i)
                o_kind.append("")
                o_loc.append(None)
                o_lm.append(None)
                o_cf.append(None)
                o_pr.append(None)
                o_err.append(str(exc)[:200])
                continue
            for e in entries:
                o_id.append(i)
                o_kind.append(e["kind"])
                o_loc.append(e["loc"])
                o_lm.append(e["lastmod"])
                o_cf.append(e["changefreq"])
                o_pr.append(e["priority"])
                o_err.append("")
        return pa.table({
            id_col: pa.array(o_id, batch.schema.field(id_col).type),
            "kind": pa.array(o_kind, pa.string()),
            "loc": pa.array(o_loc, pa.string()),
            "lastmod": pa.array(o_lm, pa.string()),
            "changefreq": pa.array(o_cf, pa.string()),
            "priority": pa.array(o_pr, pa.string()),
            "error": pa.array(o_err, pa.string()),
        })

    return strip_schema_metadata(ds.select_columns([id_col, xml_col])) \
        .map_batches(explode, batch_format="pyarrow")
