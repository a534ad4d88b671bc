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

Scale shape (round 5, VERDICT item 3): parsing is DISTRIBUTED — a
stateless ``map_batches`` over the robots table emits one COMPACT
parsed row per host (rule patterns + flags as list columns, the
crawl-delay, an md5 body key; the raw body never leaves the parse
task).  Two evaluation strategies, the line_dedup pattern:

- ``broadcast`` — the compact parsed rows (not the bodies) are pulled
  to the driver, assembled into the host→rules map, and shipped via
  ONE ``ray.put`` (per-worker memoized fetch, the lmscore pattern);
  every URL batch evaluates locally.  Zero shuffle on the corpus
  side; the URL table streams.
- ``colocate`` — above a broadcast budget (10⁷–10⁸ hosts: the rule
  map no longer fits one heap), parsed rows and URL rows are tagged,
  UNIONed and host-key repartitioned (the repo's no-Acero join
  idiom); verdicts evaluate per partition.  ONE corpus-side exchange.
- ``auto`` (default) — broadcast while the parsed-row count is within
  ``broadcast_budget``, else colocate.

Duplicate host rows (malformed input) resolve deterministically:
the row with the greatest md5(body) wins — a tiebreak computable
distributed, without comparing bodies across partitions.

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


def parse_robots_rows(robots: ray.data.Dataset, *,
                      agent: str = "*",
                      host_col: str = "host",
                      body_col: str = "robots_txt"
                      ) -> ray.data.Dataset:
    """Distributed robots.txt parse (VERDICT r4 item 3).

    One stateless ``map_batches`` over the robots table; each input
    row emits one COMPACT parsed row::

        (host, body_md5, patterns: list<string>, allows: list<bool>,
         delay_ms: int64 | null)

    The raw body is parsed inside the task and never shipped further —
    at 10⁷–10⁸ hosts only the rule patterns cross to the driver
    (broadcast strategy) or the host-keyed exchange (colocate).
    ``body_md5`` is the duplicate-host tiebreak key: consumers keep
    the row with the max md5 per host, a resolution computable without
    comparing bodies across partitions.  ``delay_ms`` is the winning
    row's Crawl-delay in fixed-point integer milliseconds (null when
    the selected agent group carries none).
    """
    import hashlib

    from .util import strip_schema_metadata

    def parse(batch: pa.Table) -> pa.Table:
        hosts = batch.column(host_col).to_pylist()
        bodies = batch.column(body_col).to_pylist()
        md5s, pats, flags, delays = [], [], [], []
        for body in bodies:
            body = body or ""
            md5s.append(hashlib.md5(body.encode()).hexdigest())
            rules = parse_robots(body, agent=agent)
            pats.append([r.pattern for r in rules])
            flags.append([r.allow for r in rules])
            d = parse_crawl_delay(body, agent=agent)
            delays.append(None if d is None else int(d * 1000 + 0.5))
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "body_md5": pa.array(md5s, pa.string()),
            "patterns": pa.array(pats, pa.list_(pa.string())),
            "allows": pa.array(flags, pa.list_(pa.bool_())),
            "delay_ms": pa.array(delays, pa.int64()),
        })

    return strip_schema_metadata(
        robots.select_columns([host_col, body_col])) \
        .map_batches(parse, batch_format="pyarrow")


def _resolve_parsed(rows: list[dict]) -> dict[str, dict]:
    """Per-host duplicate resolution over compact parsed rows: the row
    with the greatest body_md5 wins (deterministic under any block
    order)."""
    best: dict[str, dict] = {}
    for r in rows:
        cur = best.get(r["host"])
        if cur is None or r["body_md5"] > cur["body_md5"]:
            best[r["host"]] = r
    return best


def _rules_of(row: dict) -> list[RobotsRule]:
    return [RobotsRule(allow=bool(a), pattern=p)
            for a, p in zip(row["allows"], row["patterns"])]


_BROADCAST_BUDGET = 200_000  # parsed host rows; above this, colocate


def _pick_strategy(parsed: ray.data.Dataset, strategy: str,
                   budget: int) -> tuple[str, ray.data.Dataset]:
    """auto → broadcast while the parsed table is small.  The count
    executes the (compact) parse, so materialize first — the parsed
    rows are exactly what both strategies consume next."""
    if strategy in ("broadcast", "colocate"):
        return strategy, parsed
    if strategy != "auto":
        raise ValueError(f"unknown strategy {strategy!r}")
    parsed = parsed.materialize()
    return ("broadcast" if parsed.count() <= budget
            else "colocate"), parsed


def _host_path(u: str) -> tuple[str, str]:
    try:
        parts = urlsplit(u or "")
        host = (parts.hostname or "").lower()
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        return host, path
    except ValueError:
        return "", "/"


def fetch_schedule(urls: ray.data.Dataset,
                   robots: ray.data.Dataset, *,
                   agent: str = "*",
                   url_col: str = "url",
                   id_col: str = "doc_id",
                   host_col: str = "host",
                   body_col: str = "robots_txt",
                   default_delay_s: float = 1.0,
                   strategy: str = "auto",
                   broadcast_budget: int = _BROADCAST_BUDGET,
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

    Scale shape: rule parsing is distributed (``parse_robots_rows``);
    ``strategy="broadcast"`` ships only the compact (host, delay_ms)
    rows to the driver and ONE ``ray.put``; ``"colocate"`` unions the
    delay rows INTO the ordering exchange the schedule already pays
    (host-keyed repartition), so above the broadcast budget the delay
    table never centralizes.  Either way: ONE corpus-side exchange,
    no Dataset groupby.  A duplicated host resolves to its max-md5
    body's delay (see module docstring); a winning body without a
    Crawl-delay uses ``default_delay_s``.
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

    parsed = parse_robots_rows(robots, agent=agent, host_col=host_col,
                               body_col=body_col) \
        .select_columns(["host", "body_md5", "delay_ms"])
    strat, parsed = _pick_strategy(parsed, strategy, broadcast_budget)

    def add_host(batch: pa.Table) -> pa.Table:
        hosts = [_host_path(u)[0]
                 for u in batch.column(url_col).to_pylist()]
        return batch.append_column("host", pa.array(hosts, pa.string()))

    def _schedule_frame(df: pd.DataFrame,
                        dmap: dict[str, int]) -> pa.Table:
        df = df.sort_values(["host", url_col, id_col],
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

    def _empty() -> pa.Table:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "delay_ms": pa.array([], pa.int64()),
            "fetch_order": pa.array([], pa.int64()),
            "fetch_offset_ms": pa.array([], pa.int64()),
        })

    u_rows = strip_schema_metadata(
        urls.select_columns([id_col, url_col])) \
        .map_batches(add_host, batch_format="pyarrow")

    if strat == "broadcast":
        best = _resolve_parsed(parsed.take_all())
        delay_map = {h: int(r["delay_ms"]) for h, r in best.items()
                     if r["delay_ms"] is not None}
        delays_ref = ray.put(delay_map)

        def schedule(batch: pd.DataFrame, *, ref) -> pa.Table:
            # defensive: hash-shuffle empty partitions are schema-less
            # and the UDF is skipped on them — belt-and-braces
            if len(batch) == 0 or "host" not in batch.columns:
                return _empty()
            return _schedule_frame(batch, _get_broadcast(ref))

        return u_rows.repartition(num_blocks=k, keys=["host"]) \
            .map_batches(schedule, batch_format="pandas",
                         batch_size=None,
                         fn_kwargs={"ref": delays_ref})

    # colocate: delay rows ride the SAME host-keyed exchange the
    # ordering pass already pays; each partition sees every delay row
    # for its hosts and resolves locally.
    id_type = urls.schema().base_schema.field(id_col).type

    def tag_u(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return batch.append_column(
            "body_md5", pa.nulls(n, pa.string())) \
            .append_column("delay_ms", pa.nulls(n, pa.int64())) \
            .append_column("_side",
                           pa.array(["u"] * n, pa.string()))

    def tag_d(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            id_col: pa.nulls(n, id_type),
            url_col: pa.nulls(n, pa.string()),
            "host": batch.column("host"),
            "body_md5": batch.column("body_md5"),
            "delay_ms": batch.column("delay_ms"),
            "_side": pa.array(["d"] * n, pa.string()),
        })

    both = u_rows.map_batches(tag_u, batch_format="pyarrow") \
        .union(parsed.map_batches(tag_d, batch_format="pyarrow")) \
        .repartition(num_blocks=k, keys=["host"])

    def schedule_part(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "_side" not in batch.columns:
            return _empty()
        d = batch[batch["_side"] == "d"]
        u = batch[batch["_side"] == "u"].copy()
        if len(u) == 0:
            return _empty()
        if pa.types.is_integer(id_type):
            # int64-with-nulls arrow columns arrive as float64 in
            # pandas; the u slice is null-free, so cast back
            u[id_col] = u[id_col].astype("int64")
        dmap: dict[str, int] = {}
        if len(d):
            dd = d.sort_values(["host", "body_md5"], kind="stable") \
                .drop_duplicates("host", keep="last")
            for h, ms in zip(dd["host"], dd["delay_ms"]):
                if pd.notna(ms):
                    dmap[h] = int(ms)
        return _schedule_frame(u, dmap)

    return both.map_batches(schedule_part, batch_format="pandas",
                            batch_size=None)


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
                  body_col: str = "robots_txt",
                  strategy: str = "auto",
                  broadcast_budget: int = _BROADCAST_BUDGET,
                  n_partitions: int | None = None) -> ray.data.Dataset:
    """Annotate every URL with its robots verdict.

    ``robots``: (host, robots_txt) — one row per host, the per-host
    fetch a real crawler caches.  Rule parsing is DISTRIBUTED
    (``parse_robots_rows``); with ``strategy="broadcast"`` only the
    compact parsed rows reach the driver and the rule map ships via
    ONE ``ray.put`` (+ per-worker memo) — zero corpus-side shuffle;
    with ``"colocate"`` (the above-budget fallback) parsed rule rows
    and URL rows share one host-keyed exchange and verdicts evaluate
    per partition, so the rule table never centralizes.  Hosts with no
    robots row allow everything (the REP default for 404).  Output:
    input columns + (host, path, allowed:bool) — filter on ``allowed``
    downstream.
    """
    import pandas as pd
    import ray

    from ..state import default_partitions, ensure_hash_shuffle
    from .lmscore import _get_broadcast
    from .util import arrow_out, strip_schema_metadata

    parsed = parse_robots_rows(robots, agent=agent, host_col=host_col,
                               body_col=body_col)
    strat, parsed = _pick_strategy(parsed, strategy, broadcast_budget)

    if strat == "broadcast":
        best = _resolve_parsed(parsed.take_all())
        rule_map = {h: _rules_of(r) for h, r in best.items()}
        rules_ref = ray.put(rule_map)

        def verdicts(batch: pa.Table, *, ref) -> pa.Table:
            rmap = _get_broadcast(ref)
            hosts, paths, allowed = [], [], []
            for u in batch.column(url_col).to_pylist():
                host, path = _host_path(u)
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

    # colocate fallback: URL rows and parsed rule rows tagged, UNIONed
    # and host-key repartitioned (the repo's no-Acero-join idiom); each
    # partition holds every rule row for its hosts and evaluates
    # verdicts locally.  ONE corpus-side exchange.
    ensure_hash_shuffle(urls)
    k = n_partitions or default_partitions()
    url_fields = [(f.name, f.type)
                  for f in urls.schema().base_schema]
    url_names = [n for n, _ in url_fields]

    def tag_u(batch: pa.Table) -> pa.Table:
        hp = [_host_path(u) for u in batch.column(url_col).to_pylist()]
        n = len(batch)
        return batch.append_column(
            "host", pa.array([h for h, _ in hp], pa.string())) \
            .append_column("path",
                           pa.array([p for _, p in hp], pa.string())) \
            .append_column("body_md5", pa.nulls(n, pa.string())) \
            .append_column("patterns",
                           pa.nulls(n, pa.list_(pa.string()))) \
            .append_column("allows", pa.nulls(n, pa.list_(pa.bool_()))) \
            .append_column("_side", pa.array(["u"] * n, pa.string()))

    def tag_r(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols: dict[str, pa.Array] = {}
        for name, typ in url_fields:
            cols[name] = pa.nulls(n, typ)
        cols["host"] = batch.column("host")
        cols["path"] = pa.nulls(n, pa.string())
        cols["body_md5"] = batch.column("body_md5")
        cols["patterns"] = batch.column("patterns")
        cols["allows"] = batch.column("allows")
        cols["_side"] = pa.array(["r"] * n, pa.string())
        return pa.table(cols)

    both = strip_schema_metadata(urls) \
        .map_batches(tag_u, batch_format="pyarrow") \
        .union(parsed.map_batches(tag_r, batch_format="pyarrow")) \
        .repartition(num_blocks=k, keys=["host"])

    out_schema = pa.schema([pa.field(n, t) for n, t in url_fields]
                           + [pa.field("host", pa.string()),
                              pa.field("path", pa.string()),
                              pa.field("allowed", pa.bool_())])

    def verdict_part(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "_side" not in batch.columns:
            return out_schema.empty_table()
        r = batch[batch["_side"] == "r"]
        u = batch[batch["_side"] == "u"]
        if len(u) == 0:
            return out_schema.empty_table()
        rules_by_host: dict[str, list[RobotsRule]] = {}
        if len(r):
            rr = r.sort_values(["host", "body_md5"], kind="stable") \
                .drop_duplicates("host", keep="last")
            for h, pats, flags in zip(rr["host"], rr["patterns"],
                                      rr["allows"]):
                rules_by_host[h] = [
                    RobotsRule(allow=bool(a), pattern=str(p))
                    for a, p in zip(flags, pats)]
        allowed = [True if (rules := rules_by_host.get(h)) is None
                   else robots_allowed(rules, p)
                   for h, p in zip(u["host"], u["path"])]
        out = u[url_names + ["host", "path"]].copy()
        out["allowed"] = allowed
        return arrow_out(out).cast(out_schema)

    return both.map_batches(verdict_part, batch_format="pandas",
                            batch_size=None)


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
