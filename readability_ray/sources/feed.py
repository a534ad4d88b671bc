"""RSS/Atom feed ingestion — the third crawl-frontier source beside
sitemaps (sources/sitemap.py) and robots rules (functions/robots.py):
feeds tell an incremental crawler what changed RECENTLY, where
sitemaps enumerate everything.

Parses RSS 2.0 (``<rss><channel><item>``) and Atom
(``<feed><entry>``) with the stdlib ElementTree parser,
namespace-agnostic (real feeds mix default/prefixed namespaces and
RSS often carries Atom extension elements).  Malformed XML yields an
error row, never a job failure — crawl inputs are hostile.

Scale shape: feed bodies arrive as ordinary crawl documents (one XML
body per row); ``feed_entries`` is ONE stateless vectorized
``map_batches`` explode — no exchange; the incremental frontier
streams out as (source_id, kind, title, link, published, guid,
error).

``make_rss_xml`` / ``make_atom_xml`` are byte-deterministic writer
twins (fixed element order, no timestamps) so round trips are exact —
the same writer→parser oracle technique as sources/sitemap.py and
sources/warc.py.

No reference counterpart (crawl-side source; the reference fetches a
single page).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa


def _esc(v: str) -> str:
    # &quot; is needed only in attribute context (<link href="...">)
    # but is valid everywhere, so escape it unconditionally.
    return (str(v).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def make_rss_xml(channel_title: str, items: list[dict]) -> str:
    """Deterministic RSS 2.0.  ``items`` are dicts with optional
    ``title``/``link``/``pubDate``/``guid`` (absent keys are
    omitted)."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<rss version="2.0">', "<channel>",
             f"<title>{_esc(channel_title)}</title>"]
    for it in items:
        parts.append("<item>")
        for f in ("title", "link", "pubDate", "guid"):
            v = it.get(f)
            if v is not None:
                parts.append(f"<{f}>{_esc(v)}</{f}>")
        parts.append("</item>")
    parts.append("</channel>")
    parts.append("</rss>")
    return "\n".join(parts)


def make_atom_xml(feed_title: str, entries: list[dict]) -> str:
    """Deterministic Atom 1.0.  ``entries`` are dicts with optional
    ``title``/``link`` (becomes ``<link href=".."/>``)/``updated``/
    ``id``."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<feed xmlns="http://www.w3.org/2005/Atom">',
             f"<title>{_esc(feed_title)}</title>"]
    for e in entries:
        parts.append("<entry>")
        if e.get("title") is not None:
            parts.append(f"<title>{_esc(e['title'])}</title>")
        if e.get("link") is not None:
            parts.append(f'<link href="{_esc(e["link"])}"/>')
        if e.get("updated") is not None:
            parts.append(f"<updated>{_esc(e['updated'])}</updated>")
        if e.get("id") is not None:
            parts.append(f"<id>{_esc(e['id'])}</id>")
        parts.append("</entry>")
    parts.append("</feed>")
    return "\n".join(parts)


def _local(tag) -> str:
    return tag.rsplit("}", 1)[-1].lower() if isinstance(tag, str) else ""


def _text(node) -> str | None:
    t = (node.text or "").strip()
    return t or None


def _parse_rss_items(channel) -> list[dict]:
    out = []
    for node in channel:
        if _local(node.tag) != "item":
            continue
        entry = {"title": None, "link": None, "published": None,
                 "guid": None}
        # first non-empty value wins: RSS items often carry BOTH a
        # plain <link> and a text-less <atom:link href> extension —
        # the latter must not clobber the former
        for field in node:
            name = _local(field.tag)
            key = {"title": "title", "link": "link",
                   "pubdate": "published", "guid": "guid"}.get(name)
            if key is not None and entry[key] is None:
                entry[key] = _text(field)
        out.append(entry)
    return out


def _atom_link(node) -> str | None:
    """Atom link selection: prefer rel="alternate" (or no rel — the
    spec's default), else the first link with an href."""
    first = None
    for field in node:
        if _local(field.tag) != "link":
            continue
        href = (field.get("href") or "").strip() or None
        if href is None:
            continue
        rel = (field.get("rel") or "alternate").strip().lower()
        if rel == "alternate":
            return href
        if first is None:
            first = href
    return first


def _parse_atom_entries(root) -> list[dict]:
    out = []
    for node in root:
        if _local(node.tag) != "entry":
            continue
        entry = {"title": None, "link": _atom_link(node),
                 "published": None, "guid": None}
        for field in node:
            name = _local(field.tag)
            if name == "title":
                entry["title"] = _text(field)
            elif name == "updated":
                entry["published"] = _text(field)
            elif name == "id":
                entry["guid"] = _text(field)
        out.append(entry)
    return out


def parse_feed(xml: str) -> tuple[str, list[dict]]:
    """One feed body → ('rss'|'atom', entry dicts) with keys
    title/link/published/guid (missing → None).  Raises ValueError on
    malformed XML or a non-feed root."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise ValueError(f"malformed feed XML: {exc}") from exc
    root_name = _local(root.tag)
    if root_name == "rss":
        for node in root:
            if _local(node.tag) == "channel":
                return "rss", _parse_rss_items(node)
        return "rss", []
    if root_name == "feed":
        return "atom", _parse_atom_entries(root)
    raise ValueError(f"not a feed root: <{root_name}>")


def feed_entries(ds, *,
                 xml_col: str = "feed_xml",
                 id_col: str = "doc_id"):
    """Explode a table of feed bodies into the incremental frontier.

    Output: (id_col, kind, title, link, published, guid, error) — one
    row per entry; a malformed body becomes ONE error row with null
    link.  Stateless vectorized map, zero shuffle."""
    from ..functions.util import strip_schema_metadata

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        xmls = batch.column(xml_col).to_pylist()
        o_id, o_kind, o_t, o_l, o_p, o_g, o_err = \
            [], [], [], [], [], [], []
        for i, x in zip(ids, xmls):
            try:
                kind, entries = parse_feed(x or "")
            except ValueError as exc:
                o_id.append(i)
                o_kind.append("")
                o_t.append(None)
                o_l.append(None)
                o_p.append(None)
                o_g.append(None)
                o_err.append(str(exc)[:200])
                continue
            for e in entries:
                o_id.append(i)
                o_kind.append(kind)
                o_t.append(e["title"])
                o_l.append(e["link"])
                o_p.append(e["published"])
                o_g.append(e["guid"])
                o_err.append("")
        return pa.table({
            id_col: pa.array(o_id, batch.schema.field(id_col).type),
            "kind": pa.array(o_kind, pa.string()),
            "title": pa.array(o_t, pa.string()),
            "link": pa.array(o_l, pa.string()),
            "published": pa.array(o_p, pa.string()),
            "guid": pa.array(o_g, pa.string()),
            "error": pa.array(o_err, pa.string()),
        })

    return strip_schema_metadata(ds.select_columns([id_col, xml_col])) \
        .map_batches(explode, batch_format="pyarrow")
