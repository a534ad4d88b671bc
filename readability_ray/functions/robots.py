"""robots.txt crawl-permission filtering — the politeness gate a
Common-Crawl-scale fetch/refetch pipeline runs before anything else.

Semantics (RFC 9309, the Google/REP subset):

- rules are ``(user_agent_group, allow|disallow, path_pattern)``;
  matching is longest-pattern-wins, ties prefer ``allow``
  (RFC 9309 §2.2.2).
- patterns are path prefixes with ``*`` wildcards and an optional
  ``$`` end anchor; an empty Disallow means "allow everything".
- group selection: the longest user-agent token that is a
  case-insensitive substring match for the crawler's product token,
  else the ``*`` group.

Scale shape: the parsed rule table is per-HOST and tiny next to the
URL corpus (one robots.txt per host), so it is the canonical
broadcast side — ``robots_filter`` parses the rules once, ships them
via ONE ``ray.put`` (per-worker memoized fetch, the lmscore pattern),
and evaluates every URL batch-locally.  Zero shuffle on the corpus
side; the URL table streams.

Oracle: the general matcher (wildcards, ``$``) is a state machine,
but the driver query exercises it on a prefix-rule family whose
longest-match-wins verdicts are re-derivable in DuckDB with LIKE +
row_number — the same restricted-family technique as url_canonical;
wildcard/anchor behavior is pinned by unit tests.

No reference counterpart (crawl-side operator; the reference's
fetchLoader fetches a single URL and never consults robots).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from urllib.parse import urlsplit

import pyarrow as pa
import ray.data

_WS_RE = re.compile(r"[ \t]+")


@dataclass
class RobotsRule:
    allow: bool
    pattern: str


def parse_robots(text: str, agent: str = "*") -> list[RobotsRule]:
    """Parse one robots.txt body into the rule list for ``agent``.

    Group selection per RFC 9309 §2.2.1: collect groups by their
    user-agent lines; pick the group(s) whose token is the LONGEST
    case-insensitive substring of ``agent``; fall back to ``*``.
    Unknown directives are ignored; BOM and comments stripped.
    """
    agent_l = agent.lower()
    groups: dict[str, list[RobotsRule]] = {}
    current_tokens: list[str] = []
    last_was_agent = False
    for raw in text.lstrip("﻿").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            tok = value.lower()
            if last_was_agent:
                current_tokens.append(tok)
            else:
                current_tokens = [tok]
            for t in current_tokens:
                groups.setdefault(t, [])
            last_was_agent = True
            continue
        last_was_agent = False
        if field in ("allow", "disallow") and current_tokens:
            if value == "" and field == "disallow":
                # empty Disallow = allow all: no rule needed, but the
                # group must exist so '*' isn't chosen over it
                continue
            rule = RobotsRule(allow=(field == "allow"), pattern=value)
            for t in current_tokens:
                groups.setdefault(t, []).append(rule)

    best: str | None = None
    for tok in groups:
        if tok != "*" and tok in agent_l:
            if best is None or len(tok) > len(best):
                best = tok
    if best is None and "*" in groups:
        best = "*"
    return groups.get(best, []) if best is not None else []


def parse_robots_sitemaps(text: str) -> list[str]:
    """All ``Sitemap:`` record values, in file order, de-duplicated.

    Per RFC 9309 §2.3 / sitemaps.org, Sitemap records are independent
    of user-agent groups — they apply file-wide, so no agent argument.
    """
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.lstrip("﻿").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            v = value.strip()
            if v and v not in seen:
                seen.add(v)
                out.append(v)
    return out


def parse_crawl_delay(text: str, agent: str = "*") -> float | None:
    """``Crawl-delay`` (de-facto extension, not in RFC 9309) from the
    group selected for ``agent`` — same group-selection rule as
    ``parse_robots``.  Returns None when the selected group carries no
    (parseable, non-negative) delay."""
    agent_l = agent.lower()
    delays: dict[str, float] = {}
    groups: set[str] = set()
    current_tokens: list[str] = []
    last_was_agent = False
    for raw in text.lstrip("﻿").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            tok = value.lower()
            if last_was_agent:
                current_tokens.append(tok)
            else:
                current_tokens = [tok]
            groups.update(current_tokens)
            last_was_agent = True
            continue
        last_was_agent = False
        if field == "crawl-delay" and current_tokens:
            try:
                d = float(value)
            except ValueError:
                continue
            if d >= 0:
                for t in current_tokens:
                    delays.setdefault(t, d)

    best: str | None = None
    for tok in groups:
        if tok != "*" and tok in agent_l:
            if best is None or len(tok) > len(best):
                best = tok
    if best is None and "*" in groups:
        best = "*"
    return delays.get(best) if best is not None else None


def fetch_schedule(urls: ray.data.Dataset,
                   robots: ray.data.Dataset, *,
                   agent: str = "*",
                   url_col: str = "url",
                   id_col: str = "doc_id",
                   host_col: str = "host",
                   body_col: str = "robots_txt",
                   default_delay_s: float = 1.0,
                   n_partitions: int | None = None) -> ray.data.Dataset:
    """Politeness scheduling: assign every frontier URL a per-host
    fetch slot honoring Crawl-delay.

    Per host, URLs are ordered deterministically by (url, id); slot k
    (1-based ``fetch_order``) fetches at ``fetch_offset_ms`` =
    (k-1) × delay_ms, where delay_ms is the host's Crawl-delay (from
    ``robots``; ``default_delay_s`` when absent) in fixed-point
    integer milliseconds — exact under distributed re-association and
    re-derivable in SQL (row_number window), the relational.py
    fixed-point rule.

    Scale shape: delay map is the tiny per-host broadcast side (ONE
    ray.put, per-worker memo); host is a corpus-sized key, so the
    ordering pass is the keyed-repartition + vectorized per-partition
    pandas shape — ONE exchange, no Dataset groupby.
    Output: (id_col, url, host, delay_ms, fetch_order, fetch_offset_ms).
    """
    import pandas as pd
    import ray

    from ..state import default_partitions, ensure_hash_shuffle
    from .lmscore import _get_broadcast
    from .util import arrow_out, strip_schema_metadata

    ensure_hash_shuffle(urls)
    k = n_partitions or default_partitions()
    default_ms = int(default_delay_s * 1000 + 0.5)

    delay_map: dict[str, int] = {}
    for row in sorted(robots.take_all(),
                      key=lambda r: (str(r[host_col]),
                                     str(r[body_col]))):
        d = parse_crawl_delay(row[body_col] or "", agent=agent)
        if d is not None:
            delay_map[row[host_col]] = int(d * 1000 + 0.5)
    delays_ref = ray.put(delay_map)

    def add_host(batch: pa.Table) -> pa.Table:
        hosts = []
        for u in batch.column(url_col).to_pylist():
            try:
                hosts.append((urlsplit(u or "").hostname or "").lower())
            except ValueError:
                hosts.append("")
        return batch.append_column("host", pa.array(hosts, pa.string()))

    def schedule(batch: pd.DataFrame, *, ref) -> pa.Table:
        # defensive: hash-shuffle empty partitions are schema-less and
        # the UDF is skipped on them, so this branch is belt-and-braces
        if len(batch) == 0 or "host" not in batch.columns:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "delay_ms": pa.array([], pa.int64()),
                "fetch_order": pa.array([], pa.int64()),
                "fetch_offset_ms": pa.array([], pa.int64()),
            })
        dmap = _get_broadcast(ref)
        df = batch.sort_values(["host", url_col, id_col],
                               kind="stable", ignore_index=True)
        order = df.groupby("host", sort=False).cumcount() + 1
        delay = df["host"].map(lambda h: dmap.get(h, default_ms)) \
            .astype("int64")
        out = pd.DataFrame({
            id_col: df[id_col],
            "url": df[url_col],
            "host": df["host"],
            "delay_ms": delay,
            "fetch_order": order.astype("int64"),
            "fetch_offset_ms": ((order - 1) * delay).astype("int64"),
        })
        return arrow_out(out)

    return strip_schema_metadata(urls.select_columns([id_col, url_col])) \
        .map_batches(add_host, batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["host"]) \
        .map_batches(schedule, batch_format="pandas", batch_size=None,
                     fn_kwargs={"ref": delays_ref})


def _pattern_match_len(pattern: str, path: str) -> int | None:
    """Longest-match length for an RFC 9309 pattern (prefix with ``*``
    wildcards, optional ``$`` anchor).  Returns the pattern's specific
    length (its character count, the REP tiebreak metric) on match,
    else None."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    if "*" not in core:
        ok = path == core if anchored else path.startswith(core)
        return len(pattern) if ok else None
    rx = ".*".join(re.escape(p) for p in core.split("*"))
    rx = "^" + rx + ("$" if anchored else "")
    return len(pattern) if re.match(rx, path) else None


def robots_allowed(rules: list[RobotsRule], path: str) -> bool:
    """Longest-pattern-wins, allow on tie, allow when nothing matches
    (RFC 9309 §2.2.2)."""
    best_len = -1
    best_allow = True
    for r in rules:
        m = _pattern_match_len(r.pattern, path)
        if m is None:
            continue
        if m > best_len or (m == best_len and r.allow and not best_allow):
            best_len = m
            best_allow = r.allow
    return best_allow


def robots_filter(urls: ray.data.Dataset,
                  robots: ray.data.Dataset, *,
                  agent: str = "*",
                  url_col: str = "url",
                  host_col: str = "host",
                  body_col: str = "robots_txt") -> ray.data.Dataset:
    """Annotate every URL with its robots verdict.

    ``robots``: (host, robots_txt) — one row per host, the per-host
    fetch a real crawler caches.  The parsed rule map broadcasts once
    (``ray.put`` + per-worker memo); hosts with no robots row allow
    everything (the REP default for 404).  Output: input columns +
    (host, path, allowed:bool) — filter on ``allowed`` downstream.
    One stateless map over the URL corpus; zero shuffle.
    """
    import ray

    from .lmscore import _get_broadcast
    from .util import strip_schema_metadata

    rule_map: dict[str, list[RobotsRule]] = {}
    # sorted so a (malformed) input with duplicate host rows resolves
    # deterministically (last in (host, body) order wins) instead of
    # by take_all's block order
    for row in sorted(robots.take_all(),
                      key=lambda r: (str(r[host_col]),
                                     str(r[body_col]))):
        rule_map[row[host_col]] = parse_robots(
            row[body_col] or "", agent=agent)
    rules_ref = ray.put(rule_map)

    def verdicts(batch: pa.Table, *, ref) -> pa.Table:
        rmap = _get_broadcast(ref)
        urls_py = batch.column(url_col).to_pylist()
        hosts, paths, allowed = [], [], []
        for u in urls_py:
            try:
                parts = urlsplit(u or "")
                host = (parts.hostname or "").lower()
                path = parts.path or "/"
                if parts.query:
                    path += "?" + parts.query
            except ValueError:
                host, path = "", "/"
            rules = rmap.get(host)
            hosts.append(host)
            paths.append(path)
            allowed.append(True if rules is None
                           else robots_allowed(rules, path))
        return batch.append_column(
            "host", pa.array(hosts, pa.string())) \
            .append_column("path", pa.array(paths, pa.string())) \
            .append_column("allowed", pa.array(allowed, pa.bool_()))

    return strip_schema_metadata(urls) \
        .map_batches(verdicts, batch_format="pyarrow",
                     fn_kwargs={"ref": rules_ref})


def sitemap_discovery(robots: ray.data.Dataset, *,
                      host_col: str = "host",
                      body_col: str = "robots_txt") -> ray.data.Dataset:
    """Explode every host's robots.txt ``Sitemap:`` records into the
    (host, sitemap_url, pos) table a frontier builder feeds to the
    sitemap ingester — the discovery edge robots→sitemaps→urls.

    Records are file-wide (RFC 9309 §2.3 — independent of user-agent
    groups), first-occurrence de-duplicated, ``pos`` the 0-based
    surviving order.  ONE stateless vectorized map, zero shuffle (the
    robots table is per-host — tiny next to the URL corpus)."""
    from .util import strip_schema_metadata

    def explode(batch: pa.Table) -> pa.Table:
        hosts_out, urls_out, pos_out = [], [], []
        for host, body in zip(batch.column(host_col).to_pylist(),
                              batch.column(body_col).to_pylist()):
            for p, u in enumerate(parse_robots_sitemaps(body or "")):
                hosts_out.append(host)
                urls_out.append(u)
                pos_out.append(p)
        return pa.table({
            "host": pa.array(hosts_out, pa.string()),
            "sitemap_url": pa.array(urls_out, pa.string()),
            "pos": pa.array(pos_out, pa.int64()),
        })

    return strip_schema_metadata(
        robots.select_columns([host_col, body_col])) \
        .map_batches(explode, batch_format="pyarrow")
