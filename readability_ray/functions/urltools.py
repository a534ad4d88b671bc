"""URL canonicalization — the crawl-side dedup-key normalizer.

``dedup_pages_by_url`` (pipelines/extract_pipeline.py) keys on the raw
url; real crawls see the same page under ``HTTP://Example.com:80/a/../b``,
``http://example.com/b#frag`` and ``http://example.com/b?utm_source=x``.
``canonical_url`` maps all of those to one key with the standard,
deterministic normalizations (RFC 3986 §6 syntax-based normalization
plus the usual crawl extras):

1. scheme and host lowercased; trailing dot on the host dropped
2. default port stripped (http:80, https:443)
3. fragment stripped
4. dot-segments resolved (``/a/../b`` → ``/b``); empty path → ``/``
5. percent-encoding normalized: unreserved characters decoded
   (``%41`` → ``A``), every other escape uppercased (``%2f`` → ``%2F``)
6. tracking parameters dropped (``utm_*``, gclid, fbclid, msclkid) —
   ``strip_tracking=False`` disables
7. remaining query parameters optionally sorted (``sort_query=True``;
   off by default — order is occasionally significant)
8. empty query ``?`` dropped

The function is idempotent (property-tested) and pure, so the Ray op
is ONE stateless map — no exchange; feed its ``canonical_url`` column
to ``dedup_pages_by_url(..., )`` keyed on it for canonical-key dedup.
Not SQL-expressible (dot-segment + percent-decoding state machines),
so the driver query is rows-only; behavior is pinned by unit +
hypothesis idempotence tests.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

import pyarrow as pa
import ray.data

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_TRACKING_RE = re.compile(r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid)$",
                          re.IGNORECASE)


def _norm_pct(s: str) -> str:
    """Decode unreserved %XX escapes, uppercase the rest (RFC 3986
    §6.2.2.1-2).  Malformed escapes are left as-is."""

    def sub(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(sub, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        out.append(seg)
    # ./.. as the LAST segment still leaves a trailing slash
    if path.endswith(("/.", "/..")):
        out.append("")
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def canonical_url(url: str, *, strip_tracking: bool = True,
                  sort_query: bool = False) -> str:
    """Canonical form of an absolute http(s) URL (see module doc).
    Non-special or unparseable URLs are returned unchanged — a dedup
    key must never throw mid-corpus."""
    try:
        split = urlsplit(url)
    except ValueError:
        return url
    scheme = split.scheme.lower()
    if scheme not in _DEFAULT_PORTS or not split.netloc:
        return url
    host = (split.hostname or "").lower().rstrip(".")
    port = None
    try:
        port = split.port
    except ValueError:
        pass
    netloc = host
    if split.username is not None:
        cred = split.username + (f":{split.password}"
                                 if split.password is not None else "")
        netloc = f"{cred}@{netloc}"
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc += f":{port}"
    path = _norm_pct(_remove_dot_segments(split.path)) or "/"
    query = _norm_pct(split.query)
    if query:
        params = query.split("&")
        if strip_tracking:
            params = [p for p in params
                      if not _TRACKING_RE.match(p.partition("=")[0])]
        if sort_query:
            params = sorted(params)
        query = "&".join(params)
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_urls(ds: ray.data.Dataset, url_col: str = "url",
                      strip_tracking: bool = True,
                      sort_query: bool = False) -> ray.data.Dataset:
    """Add (canonical_url, host) next to ``url_col`` — one stateless
    map, no exchange.  Key ``dedup_pages_by_url``-style shuffles on
    ``canonical_url`` to collapse trivially-different duplicates
    before they cost a full text exchange."""

    def canon(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        canons = [canonical_url(u or "", strip_tracking=strip_tracking,
                                sort_query=sort_query) for u in urls]
        hosts = []
        for c in canons:
            try:
                hosts.append((urlsplit(c).hostname or "").lower())
            except ValueError:
                hosts.append("")
        return batch.append_column(
            "canonical_url", pa.array(canons, pa.string())) \
            .append_column("host", pa.array(hosts, pa.string()))

    return ds.map_batches(canon, batch_format="pyarrow")
