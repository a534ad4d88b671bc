"""Ray Data extraction stage: the reference's whole per-document
pipeline (reference src/extract/extract.ts:777-859 + formatters) as a
stateful actor-pool ``map_batches`` callable.

Design (SURVEY.md §2.5, §4):
- callable CLASS → actor pool: regex tables and recursion-limit setup
  are paid once per actor in ``__init__``, not per batch;
- Arrow in / Arrow out (``batch_format="pyarrow"``): the only bytes
  crossing the object store are (url, html) in and result columns out;
- per-row try/except: a poison page yields an ``error`` column value
  instead of failing the whole block;
- batch_size should be small (32–128) because per-row cost is high and
  variable (multi-MB pages).
"""

from __future__ import annotations

import sys

import pyarrow as pa


RESULT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("page_type", pa.string()),
    ("title", pa.string()),
    ("byline", pa.string()),
    ("lang", pa.string()),
    ("site_name", pa.string()),
    ("extracted_text", pa.large_string()),
    ("markdown", pa.large_string()),
    ("extracted_html", pa.large_string()),
    ("aria_yaml", pa.large_string()),
    ("node_count", pa.int32()),
    ("n_candidates", pa.int32()),
    ("top_score", pa.float64()),
    ("n_links", pa.int32()),
    ("html_bytes", pa.int64()),
    ("error", pa.string()),
])


_TASK_STAGE_CACHE: dict = {}


def extract_batch_task(batch: pa.Table, **stage_kwargs) -> pa.Table:
    """Stateless-task variant of ExtractStage: one module-level stage
    instance per (kwargs, worker process) — Ray reuses worker processes
    for tasks, so the compiled-regex/import state amortizes exactly like
    an actor's, without the per-dataset actor-pool spin-up (~3 s for a
    24-actor pool on this box; see BASELINE.md)."""
    key = tuple(sorted(stage_kwargs.items()))
    stage = _TASK_STAGE_CACHE.get(key)
    if stage is None:
        stage = _TASK_STAGE_CACHE[key] = ExtractStage(**stage_kwargs)
    return stage(batch)


class ExtractStage:
    """``ds.map_batches(ExtractStage, batch_format="pyarrow",
    concurrency=N, batch_size=64)``."""

    def __init__(self, char_threshold: int = 500, nb_top_candidates: int = 5,
                 emit_html: bool = True, emit_markdown: bool = True,
                 emit_aria: bool = False, forced_page_type: str | None = None,
                 max_html_bytes: int = 20_000_000):
        # once-per-actor setup: imports compile the ~40 regexes at module
        # load; deep real-world DOMs need a higher recursion limit.
        sys.setrecursionlimit(40000)
        from readability_ray import extract  # noqa: F401  (warm imports)
        self.char_threshold = char_threshold
        self.nb_top_candidates = nb_top_candidates
        self.emit_html = emit_html
        self.emit_markdown = emit_markdown
        self.emit_aria = emit_aria
        self.forced_page_type = forced_page_type
        # defensive truncation guard (SURVEY.md §4 skew row): a
        # pathological multi-hundred-MB blob degrades to an error row
        # instead of stalling an actor for minutes
        self.max_html_bytes = max_html_bytes

    def _extract_row(self, url: str, html: str) -> dict:
        from readability_ray.extract import extract
        from readability_ray.format import format_document, stringify, to_html
        from readability_ray.markdown import to_markdown
        from readability_ray.readable_aria import aria_tree_to_string

        snap = extract(html, char_threshold=self.char_threshold,
                       nb_top_candidates=self.nb_top_candidates,
                       forced_page_type=self.forced_page_type,
                       build_aria=self.emit_aria)
        text = format_document(stringify(snap.root)) if snap.root else ""
        markdown = (to_markdown(snap.root)
                    if self.emit_markdown and snap.root else "")
        html_out = (to_html(snap.root)
                    if self.emit_html and snap.root else "")
        aria = (aria_tree_to_string(snap.aria_tree)
                if self.emit_aria and snap.aria_tree else "")
        top_score = snap.main_candidates[0][1] if snap.main_candidates else 0.0
        return {
            "url": url,
            "page_type": snap.page_type,
            "title": snap.metadata.title,
            "byline": snap.byline or "",
            "lang": snap.metadata.lang or "",
            "site_name": snap.metadata.site_name or "",
            "extracted_text": text,
            "markdown": markdown,
            "extracted_html": html_out,
            "aria_yaml": aria,
            "node_count": snap.node_count,
            "n_candidates": len(snap.main_candidates),
            "top_score": float(top_score),
            "n_links": len(snap.links),
            "error": "",
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        rows = {name: [] for name in RESULT_SCHEMA.names}
        for url, html in zip(urls, htmls):
            if isinstance(html, (bytes, bytearray, memoryview)):
                html = bytes(html).decode("utf-8", errors="replace")
            try:
                if html and len(html) > self.max_html_bytes:
                    raise ValueError(
                        f"PageTooLarge: {len(html)} bytes > "
                        f"{self.max_html_bytes} limit")
                row = self._extract_row(url, html or "")
            except Exception as exc:  # poison page → error column
                row = {name: "" for name in RESULT_SCHEMA.names}
                row.update(url=url, page_type="error", node_count=0,
                           n_candidates=0, top_score=0.0, n_links=0,
                           error=f"{type(exc).__name__}: {exc}"[:500])
            row["html_bytes"] = len(html or "")
            for name in RESULT_SCHEMA.names:
                rows[name].append(row[name])
        return pa.table(
            {name: pa.array(rows[name], RESULT_SCHEMA.field(name).type)
             for name in RESULT_SCHEMA.names})
