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
