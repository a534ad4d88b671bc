"""Head-link extraction — the per-page crawl-frontier signals a
dedup/refetch pipeline reads from document ``<head>``: the canonical
URL (``<link rel="canonical">``), pagination hints (``rel="next"`` /
``rel="prev"``), hreflang alternates, and meta-robots directives
(``noindex`` / ``nofollow``).

Runs on the engine's REAL parser (parser.py — the oracle-pinned
htmlparser2-semantics VDOM), so the whole HTML→head→attributes path
is exercised, not a regex shortcut.  ``rel`` is a space-separated
token list matched case-insensitively per the HTML spec; meta-robots
content is a comma-separated directive list.  First match wins for
canonical/next/prev (crawlers honor the first); hreflang alternates
are emitted as a count plus a deterministic ``lang:href`` listing
sorted by (lang, href) so the operator is value-comparable in SQL.

Scale shape: ONE stateless vectorized ``map_batches`` over the pages
table — per-row parse cost is the same class as the extraction stage;
zero shuffle, no state.

Reference parity note: the reference never reads head links (its
metadata getters stop at title/byline/lang/site-name,
src/extract/extract.ts:488-589); this is new-engine crawl surface.
"""

from __future__ import annotations

import pyarrow as pa

from ..parser import parse_html
from ..vdom import get_elements_by_tag_name


def _rel_tokens(rel: str | None) -> set[str]:
    return set((rel or "").lower().split())


def extract_head_links(html: str) -> dict:
    """One document → head-link record (pure, never raises on hostile
    input beyond what parse_html guarantees)."""
    doc = parse_html(html or "")
    canonical = rel_next = rel_prev = None
    hreflangs: list[tuple[str, str]] = []
    for el in get_elements_by_tag_name(doc.document_element, "link"):
        rel = _rel_tokens(el.attrs.get("rel"))
        href = (el.attrs.get("href") or "").strip()
        if not href:
            continue
        if "canonical" in rel and canonical is None:
            canonical = href
        if "next" in rel and rel_next is None:
            rel_next = href
        if "prev" in rel and rel_prev is None:
            rel_prev = href
        if "alternate" in rel:
            hl = (el.attrs.get("hreflang") or "").strip().lower()
            if hl:
                hreflangs.append((hl, href))
    noindex = nofollow = False
    for el in get_elements_by_tag_name(doc.document_element, "meta"):
        if (el.attrs.get("name") or "").strip().lower() != "robots":
            continue
        directives = {d.strip().lower() for d in
                      (el.attrs.get("content") or "").split(",")}
        if "noindex" in directives or "none" in directives:
            noindex = True
        if "nofollow" in directives or "none" in directives:
            nofollow = True
    hreflangs = sorted(set(hreflangs))
    return {
        "canonical": canonical,
        "rel_next": rel_next,
        "rel_prev": rel_prev,
        "noindex": noindex,
        "nofollow": nofollow,
        "n_hreflang": len(hreflangs),
        "hreflang_list": " ".join(f"{l}:{h}" for l, h in hreflangs),
    }


def head_links(ds, *, html_col: str = "html",
               id_col: str = "doc_id"):
    """Head-link extraction over a pages table: ONE stateless map,
    zero shuffle.  Output: (id_col, canonical, rel_next, rel_prev,
    noindex, nofollow, n_hreflang, hreflang_list)."""
    from .util import strip_schema_metadata

    def run(batch: pa.Table) -> pa.Table:
        recs = [extract_head_links(h)
                for h in batch.column(html_col).to_pylist()]
        return pa.table({
            id_col: batch.column(id_col),
            "canonical": pa.array([r["canonical"] for r in recs],
                                  pa.string()),
            "rel_next": pa.array([r["rel_next"] for r in recs],
                                 pa.string()),
            "rel_prev": pa.array([r["rel_prev"] for r in recs],
                                 pa.string()),
            "noindex": pa.array([r["noindex"] for r in recs],
                                pa.bool_()),
            "nofollow": pa.array([r["nofollow"] for r in recs],
                                 pa.bool_()),
            "n_hreflang": pa.array([r["n_hreflang"] for r in recs],
                                   pa.int64()),
            "hreflang_list": pa.array([r["hreflang_list"] for r in recs],
                                      pa.string()),
        })

    return strip_schema_metadata(ds.select_columns([id_col, html_col])) \
        .map_batches(run, batch_format="pyarrow")


_FEED_TYPES = {
    "application/rss+xml": "rss",
    "application/atom+xml": "atom",
}


def extract_feed_links(html: str) -> list[dict]:
    """Feed autodiscovery (the RSS/Atom convention: ``<link
    rel="alternate" type="application/rss+xml" href=...>`` in head):
    one document → [(kind, href, title, pos)] in document order,
    first-occurrence de-duplicated by href.  The discovery edge that
    feeds sources/feed.py's ingester."""
    doc = parse_html(html or "")
    out: list[dict] = []
    seen: set[str] = set()
    for el in get_elements_by_tag_name(doc.document_element, "link"):
        if "alternate" not in _rel_tokens(el.attrs.get("rel")):
            continue
        kind = _FEED_TYPES.get(
            (el.attrs.get("type") or "").strip().lower())
        href = (el.attrs.get("href") or "").strip()
        if kind is None or not href or href in seen:
            continue
        seen.add(href)
        out.append({"kind": kind, "href": href,
                    "title": (el.attrs.get("title") or "").strip(),
                    "pos": len(out)})
    return out


def feed_autodiscovery(ds, *, html_col: str = "html",
                       id_col: str = "doc_id"):
    """Explode per-page feed links: ONE stateless map, zero shuffle.
    Output: (id_col, kind, href, title, pos)."""
    from .util import strip_schema_metadata

    def run(batch: pa.Table) -> pa.Table:
        ids_out, kinds, hrefs, titles, poss = [], [], [], [], []
        for i, h in zip(batch.column(id_col).to_pylist(),
                        batch.column(html_col).to_pylist()):
            if isinstance(h, bytes):
                h = h.decode("utf-8", errors="replace")
            for r in extract_feed_links(h):
                ids_out.append(i)
                kinds.append(r["kind"])
                hrefs.append(r["href"])
                titles.append(r["title"])
                poss.append(r["pos"])
        return pa.table({
            id_col: pa.array(ids_out, batch.schema.field(id_col).type),
            "kind": pa.array(kinds, pa.string()),
            "href": pa.array(hrefs, pa.string()),
            "title": pa.array(titles, pa.string()),
            "pos": pa.array(poss, pa.int64()),
        })

    return strip_schema_metadata(ds.select_columns([id_col, html_col])) \
        .map_batches(run, batch_format="pyarrow")
