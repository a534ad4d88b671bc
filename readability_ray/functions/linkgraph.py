"""Link-graph anchor-text aggregation — the web-scale signal tables
search/retrieval training sets are built from (per-target inlink
counts and the dominant anchor text).

Input: an edge table (src, href, anchor_text) — e.g. the extraction
pipeline's exploded links.  Output per distinct href: n_inlinks,
n_unique_src, top_anchor (the most frequent non-empty anchor string,
ties broken lexicographically so the result is deterministic and
SQL-reproducible), top_anchor_n.

Scale shape: href is a corpus-sized key, so this is the standard
keyed-repartition + vectorized per-partition pass (CLAUDE.md: never a
Dataset-level groupby on a corpus key).  Map-side partials collapse
each batch to one row per (href, anchor) first, so the exchange moves
pre-aggregated counts, not raw edges — the combiner-before-shuffle
rule.

No reference counterpart (corpus-level operator; the reference
extracts one page's links).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .util import arrow_out, strip_schema_metadata


def anchor_text_stats(edges, *,
                      src_col: str = "src", href_col: str = "href",
                      text_col: str = "anchor_text",
                      n_partitions: int | None = None):
    """Per-target anchor statistics over an edge table.

    ``n_inlinks`` counts edges, ``n_unique_src`` distinct sources.
    ``top_anchor`` is the most frequent NON-EMPTY anchor text
    (count desc, text asc on ties; "" when every anchor is empty).
    One keyed exchange of (href, anchor, n, src-partial) combiner
    rows; everything else is batch-local.
    """
    import ray  # noqa: F401  (ray.data loaded by the caller)

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(edges)
    k = n_partitions or default_partitions()

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "href": batch.column(href_col).to_pylist(),
            "anchor": [(t or "") for t in
                       batch.column(text_col).to_pylist()],
            "src": batch.column(src_col).to_pylist(),
        })
        g = df.groupby(["href", "anchor"], as_index=False, sort=False) \
            .agg(n=("src", "size"))
        # exact distinct-src needs the src values — ship a deduped
        # (href, src) side instead of a non-mergeable nunique partial:
        s = df[["href", "src"]].drop_duplicates()
        g["kind"] = "a"
        s = s.assign(anchor="", n=0, kind="s",
                     src=s["src"].astype(str))
        g = g.assign(src="")
        cols = ["href", "anchor", "n", "src", "kind"]
        return arrow_out(pd.concat([g[cols], s[cols]],
                                   ignore_index=True))

    def reduce_href(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "href" not in batch.columns:
            return pa.table({
                "href": pa.array([], pa.string()),
                "n_inlinks": pa.array([], pa.int64()),
                "n_unique_src": pa.array([], pa.int64()),
                "top_anchor": pa.array([], pa.string()),
                "top_anchor_n": pa.array([], pa.int64()),
            })
        a = batch[batch["kind"] == "a"]
        s = batch[batch["kind"] == "s"]
        inlinks = a.groupby("href", sort=False)["n"].sum()
        uniq = s.drop_duplicates(["href", "src"]) \
            .groupby("href", sort=False)["src"].size()
        an = a[a["anchor"] != ""] \
            .groupby(["href", "anchor"], as_index=False, sort=False) \
            ["n"].sum()
        if len(an):
            an = an.sort_values(["href", "n", "anchor"],
                                ascending=[True, False, True],
                                kind="stable")
            top = an.drop_duplicates("href").set_index("href")
        else:
            top = pd.DataFrame(columns=["anchor", "n"])
        hrefs = sorted(inlinks.index)
        return arrow_out(pd.DataFrame({
            "href": hrefs,
            "n_inlinks": [int(inlinks[h]) for h in hrefs],
            "n_unique_src": [int(uniq.get(h, 0)) for h in hrefs],
            "top_anchor": [str(top["anchor"].get(h, "")) for h in hrefs],
            "top_anchor_n": [int(top["n"].get(h, 0)) for h in hrefs],
        }))

    return strip_schema_metadata(
        edges.select_columns([src_col, href_col, text_col])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["href"]) \
        .map_batches(reduce_href, batch_format="pandas",
                     batch_size=None)


def host_stats(docs, *,
               url_col: str = "url",
               text_col: str = "text",
               lang_col: str = "lang",
               n_partitions: int | None = None):
    """Per-host crawl-budget statistics: page count, total text
    characters, and the dominant language (count desc, lang asc on
    ties — deterministic and SQL-reproducible).

    The crawl-planning twin of ``anchor_text_stats``: host is a
    corpus-sized key, so map-side (host, lang) combiners collapse each
    batch to ≤|hosts×langs-per-batch| rows before ONE host-keyed
    exchange + a vectorized per-partition reduce.  Output per host:
    n_docs, total_chars, top_lang, top_lang_n.
    """
    from urllib.parse import urlsplit

    import ray  # noqa: F401

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(docs)
    k = n_partitions or default_partitions()

    def partials(batch: pa.Table) -> pa.Table:
        hosts = []
        for u in batch.column(url_col).to_pylist():
            try:
                hosts.append((urlsplit(u or "").hostname or "").lower())
            except ValueError:
                hosts.append("")
        df = pd.DataFrame({
            "host": hosts,
            "lang": [(x or "") for x in
                     batch.column(lang_col).to_pylist()],
            "chars": [len(t or "") for t in
                      batch.column(text_col).to_pylist()],
        })
        g = df.groupby(["host", "lang"], as_index=False, sort=False) \
            .agg(n=("chars", "size"), chars=("chars", "sum"))
        return arrow_out(g)

    def reduce_host(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "host" not in batch.columns:
            return pa.table({
                "host": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "total_chars": pa.array([], pa.int64()),
                "top_lang": pa.array([], pa.string()),
                "top_lang_n": pa.array([], pa.int64()),
            })
        g = batch.groupby(["host", "lang"], as_index=False,
                          sort=False)[["n", "chars"]].sum()
        tot = g.groupby("host", sort=False).agg(
            n_docs=("n", "sum"), total_chars=("chars", "sum"))
        top = g.sort_values(["host", "n", "lang"],
                            ascending=[True, False, True],
                            kind="stable").drop_duplicates("host") \
            .set_index("host")
        hosts = sorted(tot.index)
        return arrow_out(pd.DataFrame({
            "host": hosts,
            "n_docs": [int(tot["n_docs"][h]) for h in hosts],
            "total_chars": [int(tot["total_chars"][h]) for h in hosts],
            "top_lang": [str(top["lang"][h]) for h in hosts],
            "top_lang_n": [int(top["n"][h]) for h in hosts],
        }))

    return strip_schema_metadata(
        docs.select_columns([url_col, text_col, lang_col])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["host"]) \
        .map_batches(reduce_host, batch_format="pandas",
                     batch_size=None)


def page_outlinks(pages, *,
                  url_col: str = "url",
                  html_col: str = "html"):
    """Explode every page's extracted links into the cross-page edge
    table (src, href, anchor_text) that ``anchor_text_stats`` /
    ``pagerank`` consume — the link-graph bridge SURVEY §2.6 notes is
    beyond the reference's per-page scope.

    Link semantics are the reference's own (preprocess, then every
    ``<a href>`` under body except javascript:, anchor text =
    getInnerText-trimmed — extract.py:extract_links, oracle-pinned);
    one stateless flat-map over the pages table, zero shuffle.
    """
    from ..extract import extract_links
    from ..parser import parse_html
    from ..preprocess import preprocess_document
    from ..vdom import ensure_recursion_headroom
    from .util import strip_schema_metadata

    def explode(batch: pa.Table) -> pa.Table:
        ensure_recursion_headroom()
        srcs, hrefs, texts = [], [], []
        for url, html in zip(batch.column(url_col).to_pylist(),
                             batch.column(html_col).to_pylist()):
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            try:
                doc = parse_html(html or "")
                preprocess_document(doc)
                links = extract_links(doc)
            except Exception:
                continue  # poison pages contribute no edges
            for li in links:
                srcs.append(url)
                hrefs.append(li.href)
                texts.append(li.text)
        return pa.table({
            "src": pa.array(srcs, pa.string()),
            "href": pa.array(hrefs, pa.string()),
            "anchor_text": pa.array(texts, pa.string()),
        })

    return strip_schema_metadata(
        pages.select_columns([url_col, html_col])) \
        .map_batches(explode, batch_format="pyarrow")
