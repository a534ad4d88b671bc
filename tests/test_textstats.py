

def test_top_users_per_type_rank_and_ties(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import top_users_per_type
    types = ["a"] * 7 + ["b"] * 3
    users = [1, 1, 1, 2, 2, 3, 4, 9, 9, 8]
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "user_id": pa.array(users, pa.int64()),
    }))
    out = top_users_per_type(ds, k=2, n_partitions=2).to_pandas()
    a = out[out["event_type"] == "a"].sort_values("rank")
    assert list(a["user_id"]) == [1, 2]
    assert list(a["n_events"]) == [3, 2]
    b = out[out["event_type"] == "b"].sort_values("rank")
    # 9 has 2 events, then tie 3/4... for b: user 9 n=2, user 8 n=1
    assert list(b["user_id"]) == [9, 8]
    assert list(b["rank"]) == [1, 2]


def test_events_hourly_rollup_margins(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import events_hourly_rollup
    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50",
                         "2024-01-01 01:10", "2024-01-01 00:20"])
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["c", "c", "c", "v"], pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }))
    out = events_hourly_rollup(ds).to_pandas()
    # detail rows
    detail = out[out["hour"].notna() & out["event_type"].notna()]
    assert len(detail) == 3
    # per-type margins
    marg = out[out["hour"].isna() & out["event_type"].notna()] \
        .set_index("event_type")["n_events"]
    assert marg["c"] == 3 and marg["v"] == 1
    # grand total
    total = out[out["event_type"].isna()]
    assert len(total) == 1 and total["n_events"].iloc[0] == 4


def test_lang_source_chisq_hand_computed(ray_session):
    """2x2 contingency: exact marginals, E = rt*ct/n, contrib floor-6;
    partition invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import lang_source_chisq

    rows = (["en", "web"] * 30 + ["en", "books"] * 10
            + ["de", "web"] * 10 + ["de", "books"] * 10)
    ds = ray.data.from_arrow(pa.table({
        "lang": pa.array(rows[0::2], pa.string()),
        "source": pa.array(rows[1::2], pa.string())}))
    out = lang_source_chisq(ds).to_pandas()
    assert len(out) == 4
    cell = out.set_index(["lang", "source"])
    # n=60, row en=40, col web=40 -> E(en,web) = 40*40/60 = 26.666...
    assert cell.loc[("en", "web"), "observed"] == 30
    e = 40.0 * 40.0 / 60.0
    assert abs(cell.loc[("en", "web"), "expected"]
               - np.floor(e * 1e6) / 1e6) < 1e-12
    d = 30.0 - e
    assert abs(cell.loc[("en", "web"), "contrib"]
               - np.floor(d * d / e * 1e6) / 1e6) < 1e-12
    out2 = lang_source_chisq(ds.repartition(4)).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_negative_event_samples(ray_session):
    """Users 1 (heavy on 'a' only) and 2 (heavy on both): negatives
    are the under-min_count cells, md5-draw order, k-capped."""
    import hashlib

    import pyarrow as pa
    import ray.data
    from readability_ray.functions import negative_event_samples
    rows = [(1, "a")] * 3 + [(1, "b")] * 1 + [(2, "a")] * 3 \
        + [(2, "b")] * 3 + [(2, "c")] * 1
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows])}))
    out = negative_event_samples(ds, k=2, min_count=3,
                                 n_partitions=2).to_pandas()
    got = {(int(r.user_id), r.event_type, int(r.rank))
           for r in out.itertuples()}
    # user 1 candidates: b (1 hit), c (never) -> both kept, md5 order
    order1 = sorted(["b", "c"],
                    key=lambda t: hashlib.md5(f"1:{t}".encode())
                    .hexdigest())
    # user 2 candidates: only c
    want = {(1, order1[0], 1), (1, order1[1], 2), (2, "c", 1)}
    assert got == want
    # k truncates
    out1 = negative_event_samples(ds, k=1, min_count=3,
                                  n_partitions=3).to_pandas()
    assert len(out1[out1.user_id == 1]) == 1


def test_power_users_threshold(ray_session):
    """10 users with counts 1..10: p90 nearest-rank threshold is the
    ceil(0.9*10)=9th smallest count (9); cohort is counts >= 9."""
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import power_users
    uid, rows = 0, []
    for n in range(1, 11):
        uid += 1
        rows += [uid] * n
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(rows, pa.int64())}))
    out = power_users(ds.repartition(3), q=0.9,
                      n_partitions=2).to_pandas()
    got = dict(zip(out["user_id"].astype(int),
                   out["n_events"].astype(int)))
    assert got == {9: 9, 10: 10}
    # q=1.0 keeps only the max; never empty
    out1 = power_users(ds, q=1.0, n_partitions=2).to_pandas()
    assert dict(zip(out1["user_id"].astype(int),
                    out1["n_events"].astype(int))) == {10: 10}


def test_token_entropy_hand_computed(ray_session):
    """Hand-checkable docs: uniform tokens -> ln(k); single repeated
    token -> 0; empty -> 0; lattice matches DuckDB exhaustively."""
    import math

    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import token_entropy
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c d", "x x x x", "", "a a b b"])}))
    out = token_entropy(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 4 and out.loc[1, "n_types"] == 4
    assert abs(out.loc[1, "entropy"] - math.log(4)) < 2e-6
    assert out.loc[2, "entropy"] == 0.0 and out.loc[2, "n_types"] == 1
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "entropy"] == 0.0
    assert abs(out.loc[4, "entropy"] - math.log(2)) < 2e-6
    # the c*ln(c) integer lattice agrees with DuckDB for every count
    # a document could produce (finite domain -> exhaustive check);
    # MUST be libm math.log — numpy's SIMD log is 1 ulp off for ~2.5%
    # of integers, which crosses the 1e9-lattice rounding boundary
    lut = np.array([math.log(c) for c in range(1, 131073)])
    cs = np.arange(1, 131073, dtype=np.float64)
    ours = np.floor(cs * lut * 1e9 + 0.5).astype(np.int64)
    theirs = duckdb.sql(
        "SELECT floor(c * ln(c) * 1000000000 + 0.5)::BIGINT "
        "FROM (SELECT unnest(range(1, 131073)) AS c) ORDER BY c"
    ).fetchnumpy()
    col = list(theirs.values())[0].astype(np.int64)
    assert (ours == col).all()


def test_lang_source_mi_independent_and_skewed(ray_session):
    """Independent 2x2 table has PMI 0 everywhere; a perfectly
    dependent table has positive diagonal PMI."""
    import math

    import pyarrow as pa
    import ray.data
    from readability_ray.functions import lang_source_mi
    indep = (["en"] * 2 + ["de"] * 2, ["a", "b", "a", "b"])
    ds = ray.data.from_arrow(pa.table({
        "lang": pa.array(indep[0]), "source": pa.array(indep[1])}))
    out = lang_source_mi(ds).to_pandas()
    assert (out["pmi"] == 0.0).all()
    assert (out["mi_contrib"] == 0.0).all()
    dep = ray.data.from_arrow(pa.table({
        "lang": pa.array(["en", "en", "de", "de"]),
        "source": pa.array(["a", "a", "b", "b"])}))
    out2 = lang_source_mi(dep).to_pandas().set_index(["lang",
                                                      "source"])
    want = math.floor(math.log(2.0) * 1e6) / 1e6
    assert out2.loc[("en", "a"), "pmi"] == want
    assert out2.loc[("de", "b"), "pmi"] == want
    # total MI of a deterministic 2-symbol pairing = ln 2
    assert abs(out2["mi_contrib"].sum() - math.log(2)) < 4e-6


def test_first_touch_attribution(ray_session):
    """Two sessions for user 1 (gap > 30 min), one for user 2; ties
    at a session start break by event_id."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import first_touch_attribution
    m = 60 * 1_000_000
    rows = [
        # user 1, session 1: starts with click (tie: eid 1 < 2), one
        # purchase inside
        (1, 0 * m, 1, "click"), (1, 0 * m, 2, "view"),
        (1, 5 * m, 3, "purchase"),
        # user 1, session 2 (gap 60 min): starts with view
        (1, 65 * m, 4, "view"), (1, 70 * m, 5, "purchase"),
        # user 2: one session starting with signup, no purchase
        (2, 0 * m, 6, "signup"), (2, 10 * m, 7, "click"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows])}))
    out = first_touch_attribution(ds.repartition(3),
                                  n_partitions=2).to_pandas() \
        .set_index("first_type")
    assert out.loc["click", "n_sessions"] == 1
    assert out.loc["click", "n_conversions"] == 1
    assert out.loc["view", "n_sessions"] == 1
    assert out.loc["view", "n_conversions"] == 1
    assert out.loc["signup", "n_conversions"] == 0
    assert int(out["n_sessions"].sum()) == 3
