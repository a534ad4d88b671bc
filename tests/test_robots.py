"""robots.txt politeness gate: RFC 9309 parsing, longest-match-wins
evaluation, and the broadcast Ray filter."""

import pyarrow as pa

from readability_ray.functions.robots import (RobotsRule, parse_robots,
                                              robots_allowed,
                                              robots_filter)


def test_parse_groups_and_agent_selection():
    body = """
# comment line
User-agent: googlebot
Disallow: /g

User-agent: *
Disallow: /all
Allow: /all/ok
"""
    star = parse_robots(body, agent="mybot")
    assert [(r.allow, r.pattern) for r in star] == [
        (False, "/all"), (True, "/all/ok")]
    goog = parse_robots(body, agent="Googlebot/2.1")
    assert [(r.allow, r.pattern) for r in goog] == [(False, "/g")]


def test_parse_stacked_agents_share_rules():
    body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert [(r.allow, r.pattern) for r in parse_robots(body, "a-bot")] \
        == [(False, "/x")]
    assert [(r.allow, r.pattern) for r in parse_robots(body, "b-bot")] \
        == [(False, "/x")]


def test_longest_agent_token_wins():
    body = ("User-agent: bot\nDisallow: /short\n\n"
            "User-agent: superbot\nDisallow: /long\n")
    rules = parse_robots(body, agent="SuperBot/1.0")
    assert [r.pattern for r in rules] == ["/long"]


def test_empty_disallow_is_allow_all():
    rules = parse_robots("User-agent: *\nDisallow:\n")
    assert rules == []
    assert robots_allowed(rules, "/anything")


def test_longest_match_wins_and_tie_prefers_allow():
    rules = [RobotsRule(False, "/a"), RobotsRule(True, "/a/b")]
    assert not robots_allowed(rules, "/a/x")
    assert robots_allowed(rules, "/a/b/c")
    # exact tie: allow wins (RFC 9309 2.2.2)
    tie = [RobotsRule(False, "/p"), RobotsRule(True, "/p")]
    assert robots_allowed(tie, "/page")


def test_wildcard_and_anchor():
    rules = [RobotsRule(False, "/*.pdf$")]
    assert not robots_allowed(rules, "/docs/file.pdf")
    assert robots_allowed(rules, "/docs/file.pdf?x=1")  # $ anchored
    assert robots_allowed(rules, "/docs/file.pdfx")
    star = [RobotsRule(False, "/a/*/c")]
    assert not robots_allowed(star, "/a/b/c")
    assert robots_allowed(star, "/a/b/d")


def test_no_match_allows():
    assert robots_allowed([RobotsRule(False, "/x")], "/y")
    assert robots_allowed([], "/anything")


def test_robots_filter_broadcast(ray_session):
    import ray.data
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["a.test"], pa.string()),
        "robots_txt": pa.array(
            ["User-agent: *\nDisallow: /private\nAllow: /private/pub\n"],
            pa.string()),
    }))
    urls = ray.data.from_arrow(pa.table({
        "url": pa.array([
            "https://a.test/private/x",        # disallowed
            "https://a.test/private/pub/y",    # allowed (longer Allow)
            "https://a.test/open",             # no match -> allowed
            "https://NOROBOTS.test/anything",  # no robots row -> allowed
        ], pa.string()),
    }))
    out = robots_filter(urls, robots).to_pandas() \
        .set_index("url")["allowed"]
    assert not out["https://a.test/private/x"]
    assert out["https://a.test/private/pub/y"]
    assert out["https://a.test/open"]
    assert out["https://NOROBOTS.test/anything"]


def test_robots_filter_query_string_in_path(ray_session):
    import ray.data
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["q.test"], pa.string()),
        "robots_txt": pa.array(["User-agent: *\nDisallow: /s?k=\n"],
                               pa.string()),
    }))
    urls = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://q.test/s?k=1",
                         "https://q.test/s?j=1"], pa.string())}))
    out = robots_filter(urls, robots).to_pandas() \
        .set_index("url")["allowed"]
    assert not out["https://q.test/s?k=1"]
    assert out["https://q.test/s?j=1"]


# ---------------------------------------------------------------------------
# hostile-input fuzz (crawl inputs are untrusted)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=400), st.text(max_size=60))
def test_parse_robots_never_raises(body, agent):
    rules = parse_robots(body, agent=agent or "*")
    assert isinstance(rules, list)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="/ab*$%?.", max_size=30),
       st.text(alphabet="/ab?.", max_size=30))
def test_robots_allowed_never_raises(pattern, path):
    verdict = robots_allowed([RobotsRule(False, pattern)], path)
    assert isinstance(verdict, bool)


# ---------------------------------------------------------------------------
# Sitemap discovery + Crawl-delay + fetch_schedule (round 4)
# ---------------------------------------------------------------------------

from readability_ray.functions.robots import (fetch_schedule,
                                              parse_crawl_delay,
                                              parse_robots_sitemaps)


def test_parse_robots_sitemaps_filewide_and_deduped():
    body = """User-agent: a
Disallow: /x
Sitemap: https://h.test/sm1.xml
User-agent: b
Sitemap: https://h.test/sm2.xml  # trailing comment
Sitemap: https://h.test/sm1.xml
sitemap: https://h.test/sm3.xml
"""
    assert parse_robots_sitemaps(body) == [
        "https://h.test/sm1.xml", "https://h.test/sm2.xml",
        "https://h.test/sm3.xml"]
    assert parse_robots_sitemaps("User-agent: *\nDisallow:") == []


def test_parse_crawl_delay_group_selection():
    body = """User-agent: *
Crawl-delay: 2

User-agent: special-bot
Crawl-delay: 0.5
"""
    assert parse_crawl_delay(body, agent="other") == 2.0
    assert parse_crawl_delay(body, agent="My-Special-Bot/1.0") == 0.5
    assert parse_crawl_delay("User-agent: *\nDisallow: /x") is None
    # unparseable / negative delays ignored
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: fast") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: -3") is None


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=400), st.text(max_size=60))
def test_sitemaps_and_delay_never_raise(body, agent):
    assert isinstance(parse_robots_sitemaps(body), list)
    d = parse_crawl_delay(body, agent=agent or "*")
    assert d is None or d >= 0


def test_fetch_schedule_per_host_slots(ray_session):
    import pyarrow as pa
    import ray.data
    urls = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "url": pa.array([
            "https://slow.test/b", "https://slow.test/a",
            "https://fast.test/x", "https://fast.test/y",
            "https://nodelay.test/only",
        ], pa.string()),
    }))
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["slow.test", "fast.test"], pa.string()),
        "robots_txt": pa.array([
            "User-agent: *\nCrawl-delay: 10",
            "User-agent: *\nCrawl-delay: 0.5",
        ], pa.string()),
    }))
    out = fetch_schedule(urls, robots, default_delay_s=1.0,
                         n_partitions=2).to_pandas() \
        .sort_values(["host", "fetch_order"]).reset_index(drop=True)
    slow = out[out["host"] == "slow.test"]
    # per-host order is (url, id): /a before /b
    assert list(slow["url"]) == ["https://slow.test/a",
                                 "https://slow.test/b"]
    assert list(slow["fetch_offset_ms"]) == [0, 10000]
    fast = out[out["host"] == "fast.test"]
    assert list(fast["fetch_offset_ms"]) == [0, 500]
    nod = out[out["host"] == "nodelay.test"]
    assert list(nod["delay_ms"]) == [1000]
    assert list(nod["fetch_offset_ms"]) == [0]


def test_sitemap_discovery_explode(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import sitemap_discovery
    ds = ray.data.from_arrow(pa.table({
        "host": pa.array(["a.test", "b.test"], pa.string()),
        "robots_txt": pa.array([
            "User-agent: *\nSitemap: https://a.test/1.xml\n"
            "Sitemap: https://a.test/2.xml\n"
            "Sitemap: https://a.test/1.xml",
            "Disallow: /x",
        ], pa.string()),
    }))
    out = sitemap_discovery(ds).to_pandas().sort_values("pos")
    assert list(out["sitemap_url"]) == ["https://a.test/1.xml",
                                        "https://a.test/2.xml"]
    assert list(out["host"]) == ["a.test", "a.test"]
    assert list(out["pos"]) == [0, 1]


# --- round 5: distributed parse + colocate fallback --------------------

def _strategy_fixture():
    import pyarrow as pa
    import ray.data
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["a.test", "b.test", "c.test"], pa.string()),
        "robots_txt": pa.array([
            "User-agent: *\nDisallow: /private\nAllow: /private/pub\n"
            "Crawl-delay: 2\n",
            "User-agent: *\nDisallow: /\nCrawl-delay: 0.25\n",
            "# comments only\n",
        ], pa.string()),
    }))
    urls = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(1, 8)), pa.int64()),
        "url": pa.array([
            "https://a.test/private/x",
            "https://a.test/private/pub/y",
            "https://a.test/open",
            "https://b.test/anything",
            "https://c.test/z",
            "https://norow.test/q?x=1",
            "https://a.test/open2",
        ], pa.string()),
    }))
    return urls, robots


def test_robots_filter_colocate_equals_broadcast(ray_session):
    """The above-budget host-keyed-join fallback must produce exactly
    the broadcast verdict table (rows, values, dtypes)."""
    import pandas as pd
    urls, robots = _strategy_fixture()
    key = ["doc_id"]
    b = robots_filter(urls, robots, strategy="broadcast").to_pandas() \
        .sort_values(key).reset_index(drop=True)
    c = robots_filter(urls, robots, strategy="colocate",
                      n_partitions=3).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, c[b.columns])


def test_fetch_schedule_colocate_equals_broadcast(ray_session):
    import pandas as pd
    urls, robots = _strategy_fixture()
    b = fetch_schedule(urls, robots, strategy="broadcast",
                       n_partitions=2).to_pandas() \
        .sort_values(["host", "fetch_order"]).reset_index(drop=True)
    c = fetch_schedule(urls, robots, strategy="colocate",
                       n_partitions=3).to_pandas() \
        .sort_values(["host", "fetch_order"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, c)


def test_robots_filter_colocate_partition_invariant(ray_session):
    urls, robots = _strategy_fixture()
    a = robots_filter(urls, robots, strategy="colocate",
                      n_partitions=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = robots_filter(urls, robots, strategy="colocate",
                      n_partitions=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_robots_dup_host_md5_resolution(ray_session):
    """Duplicate host rows resolve to the max-md5(body) row in BOTH
    strategies — the distributed-friendly deterministic tiebreak."""
    import hashlib
    import pyarrow as pa
    import ray.data
    bodies = ["User-agent: *\nDisallow: /x\n",
              "User-agent: *\nDisallow: /y\n"]
    winner = max(bodies, key=lambda b: hashlib.md5(b.encode()).hexdigest())
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["d.test", "d.test"], pa.string()),
        "robots_txt": pa.array(bodies, pa.string()),
    }))
    urls = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://d.test/x", "https://d.test/y"],
                        pa.string())}))
    expect_x_blocked = "/x" in winner
    for strat in ("broadcast", "colocate"):
        out = robots_filter(urls, robots, strategy=strat,
                            n_partitions=2).to_pandas() \
            .set_index("url")["allowed"]
        assert out["https://d.test/x"] == (not expect_x_blocked)
        assert out["https://d.test/y"] == expect_x_blocked


def test_parse_robots_rows_compact(ray_session):
    """The distributed parse emits compact rows — patterns/flags/delay,
    never the body."""
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import parse_robots_rows
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["a.test"], pa.string()),
        "robots_txt": pa.array(
            ["User-agent: *\nDisallow: /p\nAllow: /p/q\n"
             "Crawl-delay: 1.5\n"], pa.string()),
    }))
    df = parse_robots_rows(robots).to_pandas()
    assert list(df.columns) == ["host", "body_md5", "patterns",
                                "allows", "delay_ms"]
    assert list(df["patterns"][0]) == ["/p", "/p/q"]
    assert list(df["allows"][0]) == [False, True]
    assert df["delay_ms"][0] == 1500
