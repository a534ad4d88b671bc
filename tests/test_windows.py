

def test_events_hopping_counts(ray_session):
    """60/15 hopping windows: each event lands in exactly 4 windows;
    counts match a hand explode."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import events_hopping_counts

    ts = np.array(["2024-01-01T00:05:00", "2024-01-01T00:20:00",
                   "2024-01-01T01:05:00"], dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a", "a", "b"], pa.string()),
        "ts": pa.array(ts),
    }))
    out = events_hopping_counts(ds, window_min=60,
                                hop_min=15).to_pandas()
    got = {(r.event_type, int(r.window_start_min)): int(r.n_events)
           for r in out.itertuples(index=False)}
    base = 28401120  # 2024-01-01T00:00 in epoch minutes
    # event at 00:05 -> window starts 00:00, -15, -30, -45
    for j in range(4):
        assert got[("a", base - 15 * j)] >= 1
    # both 'a' events share the 00:00-start window (00:05 and 00:20)
    assert got[("a", base)] == 2
    # every event appears in exactly 4 windows
    assert sum(v for (t, _), v in got.items() if t == "a") == 8
    assert sum(v for (t, _), v in got.items() if t == "b") == 4
    # determinism across partitionings
    out2 = events_hopping_counts(ds.repartition(3), window_min=60,
                                 hop_min=15).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(out, out2)


def test_user_event_paths(ray_session):
    """Ordered string_agg: path follows (ts, id) order regardless of
    input row order or partitioning."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import user_event_paths

    ts = np.array(["2024-01-01T00:02:00", "2024-01-01T00:01:00",
                   "2024-01-01T00:01:00", "2024-01-01T00:03:00",
                   "2024-01-01T00:00:30"], dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
        "event_type": pa.array(["c", "b", "a", "z", "y"], pa.string()),
        "ts": pa.array(ts),
        "event_id": pa.array([5, 2, 1, 3, 4], pa.int64()),
    }))
    out = user_event_paths(ds, n_partitions=2).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    # user 7: ties at 00:01 broken by event_id (1 then 2) -> a>b>c
    assert out.loc[0, "path"] == "a>b>c"
    assert int(out.loc[0, "n_events"]) == 3
    assert out.loc[1, "path"] == "y>z"
    # partition-count invariance
    out2 = user_event_paths(ds.repartition(4),
                            n_partitions=3).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_event_interarrival_stats(ray_session):
    """LAG-diff moments: exact vs a hand computation; gaps only
    within a user; single-event users contribute nothing."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import event_interarrival_stats

    ts = np.array(["2024-01-01T00:00:00", "2024-01-01T00:00:10",
                   "2024-01-01T00:00:40", "2024-01-01T00:05:00",
                   "2024-01-01T00:00:00"], dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array(ts),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }))
    out = event_interarrival_stats(ds, n_partitions=2).to_pandas()
    # user 1 gaps: 10s, 30s (us). users 2,3: single events, no gap.
    gaps = np.array([10_000_000, 30_000_000], dtype=np.int64)
    n, s = len(gaps), int(gaps.sum())
    ssq = int((gaps.astype(object) ** 2).sum())
    mean = np.floor((s / n) * 1e6) / 1e6
    var = np.floor(((n * ssq - s * s) / (n * n)) * 1e6) / 1e6
    assert int(out.loc[0, "n_gaps"]) == 2
    assert out.loc[0, "mean_gap_us"] == mean
    assert out.loc[0, "var_pop_gap_us"] == var
    # partition-count invariance (exact integer partials)
    out2 = event_interarrival_stats(ds.repartition(5),
                                    n_partitions=4).to_pandas()
    assert out.equals(out2)


def test_event_interarrival_empty(ray_session):
    """No repeated users -> zero gaps, null moments, no crash."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import event_interarrival_stats

    ts = np.array(["2024-01-01T00:00:00"], dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array(ts),
        "event_id": pa.array([1], pa.int64()),
    }))
    out = event_interarrival_stats(ds, n_partitions=2).to_pandas()
    assert int(out.loc[0, "n_gaps"]) == 0
    assert out.loc[0, "mean_gap_us"] is None or \
        np.isnan(out.loc[0, "mean_gap_us"])


def test_funnel_counts(ray_session):
    """Greedy subsequence funnel: prefix depth per user, order from
    (ts, id); all levels present even when empty."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import funnel_counts

    # u1: view,click,purchase (full).  u2: click,view,click (stops
    # at 2 — the view must precede a click).  u3: purchase only (0).
    # u4: view only (1).  Ties at equal ts break by event_id.
    ts = np.array(["2024-01-01T00:00:00"] * 3 +
                  ["2024-01-01T00:00:00"] * 3 +
                  ["2024-01-01T00:00:00",
                   "2024-01-01T00:00:00"], dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["view", "click", "purchase",
                                "click", "view", "click",
                                "purchase", "view"], pa.string()),
        "ts": pa.array(ts),
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
    }))
    out = funnel_counts(ds, n_partitions=3).to_pandas() \
        .sort_values("steps_completed").reset_index(drop=True)
    assert out["steps_completed"].tolist() == [0, 1, 2, 3]
    assert out["n_users"].tolist() == [1, 1, 1, 1]
    # partition-count invariance
    out2 = funnel_counts(ds.repartition(5),
                         n_partitions=2).to_pandas() \
        .sort_values("steps_completed").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_events_hourly_cube(ray_session):
    """CUBE = cells + both margins + grand total; margin sums check
    out; partition invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import events_hourly_cube

    ts = np.array(["2024-01-01T00:10:00", "2024-01-01T00:40:00",
                   "2024-01-01T01:10:00", "2024-01-01T01:20:00"],
                  dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a", "b", "a", "a"], pa.string()),
        "ts": pa.array(ts),
    }))
    out = events_hourly_cube(ds).to_pandas()
    total = out[(out["event_type"].isna()) & (out["hour"].isna())]
    assert total["n_events"].tolist() == [4]
    a_margin = out[(out["event_type"] == "a") & (out["hour"].isna())]
    assert a_margin["n_events"].tolist() == [3]
    h0 = out[(out["event_type"].isna()) & (out["hour"].notna())]
    assert sorted(h0["n_events"].tolist()) == [2, 2]
    cells = out[(out["event_type"].notna()) & (out["hour"].notna())]
    assert int(cells["n_events"].sum()) == 4
    out2 = events_hourly_cube(ds.repartition(3)).to_pandas()
    key = ["event_type", "hour"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        out2.sort_values(key).reset_index(drop=True))


def test_event_value_histogram(ray_session):
    """floor(value/width) bins, range-bounded merge, invariance."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import event_value_histogram

    ds = ray.data.from_arrow(pa.table({
        "value": pa.array([0.5, 9.99, 10.0, 19.99, 25.0, 25.0],
                          pa.float64())}))
    out = event_value_histogram(ds, width=10.0).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    assert out["bin"].tolist() == [0, 1, 2]
    assert out["n_events"].tolist() == [2, 2, 2]
    assert out["lo"].tolist() == [0.0, 10.0, 20.0]
    out2 = event_value_histogram(ds.repartition(4),
                                 width=10.0).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_doc_length_percentiles_by_group(ray_session):
    """Per-group nearest-rank quantiles equal numpy's on each slice."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import doc_length_percentiles_by_group

    texts = ["a" * n for n in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]]
    langs = ["en"] * 5 + ["de"] * 5
    ds = ray.data.from_arrow(pa.table({
        "lang": pa.array(langs, pa.string()),
        "text": pa.array(texts, pa.string())}))
    out = doc_length_percentiles_by_group(
        ds, quantiles=(0.5,)).to_pandas() \
        .sort_values(["group"]).reset_index(drop=True)
    # en lengths 1..5 -> median rank ceil(0.5*5)=3 -> 3
    # de lengths 6..10 -> 8
    assert out["group"].tolist() == ["de", "en"]
    assert out["n_chars"].tolist() == [8, 3]
    out2 = doc_length_percentiles_by_group(
        ds.repartition(4), quantiles=(0.5,)).to_pandas() \
        .sort_values(["group"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_user_modal_event_type(ray_session):
    """Grouped argmax with lexicographic tie-break; invariance."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import user_modal_event_type

    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["b", "b", "a", "z", "a", "q"],
                               pa.string()),
    }))
    out = user_modal_event_type(ds, n_partitions=2).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out["event_type"].tolist() == ["b", "a", "q"]  # tie: a<z
    assert out["n_events"].tolist() == [2, 1, 1]
    out2 = user_modal_event_type(ds.repartition(4),
                                 n_partitions=3).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_events_hourly_unique_users(ray_session):
    """Exact distinct users per hour; duplicates within and across
    batches collapse; partition invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import events_hourly_unique_users

    ts = np.array(["2024-01-01T00:05:00", "2024-01-01T00:45:00",
                   "2024-01-01T00:50:00", "2024-01-01T01:05:00",
                   "2024-01-01T01:30:00"], dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array(ts),
        "user_id": pa.array([1, 1, 2, 2, 2], pa.int64()),
    }))
    out = events_hourly_unique_users(ds, n_partitions=2).to_pandas() \
        .sort_values("hour").reset_index(drop=True)
    assert out["unique_users"].tolist() == [2, 1]
    out2 = events_hourly_unique_users(ds.repartition(5),
                                      n_partitions=3).to_pandas() \
        .sort_values("hour").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_event_prop_stats(ray_session):
    """JSON prop extraction: missing keys drop, negatives parse,
    per-type mergeable stats; partition invariance."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import event_prop_stats

    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "props": pa.array(['{"k": 5}', '{"k": -2}', '{"x": 9}',
                           '{"k": 7}', '{}'], pa.string()),
    }))
    out = event_prop_stats(ds).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert out["n"].tolist() == [2, 1]
    assert out["sum_k"].tolist() == [3, 7]
    assert out["min_k"].tolist() == [-2, 7]
    assert out["max_k"].tolist() == [5, 7]
    out2 = event_prop_stats(ds.repartition(4)).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_token_pmi_pairs(ray_session):
    """Doc-level PMI: hand-computed on a tiny corpus; top-V and
    min_pair gates; partition invariance."""
    import math
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import token_pmi_pairs

    # "x y" co-occur in 4 docs; x alone in 2; y alone in 2; z noise
    texts = (["x y"] * 4) + (["x z"] * 2) + (["y z"] * 2)
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())}))
    out = token_pmi_pairs(ds, top_v=10, k=10,
                          min_pair=2).to_pandas()
    got = {(r.token_a, r.token_b): (r.n_pair, r.pmi)
           for r in out.itertuples(index=False)}
    n = 8
    nx, ny, nxy = 6, 6, 4
    exp = math.floor(math.log(float(nxy * n) / float(nx * ny))
                     * 1e6) / 1e6
    assert got[("x", "y")][0] == 4
    assert got[("x", "y")][1] == exp
    # pairs below min_pair=2 still present: x-z and y-z have n=2
    assert got[("x", "z")][0] == 2
    out2 = token_pmi_pairs(ds.repartition(4), top_v=10, k=10,
                           min_pair=2).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_events_hourly_pivot(ray_session):
    """Long-to-wide: absent cells zero, columns sorted, invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import events_hourly_pivot

    ts = np.array(["2024-01-01T00:10:00", "2024-01-01T00:40:00",
                   "2024-01-01T01:10:00"], dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array(ts),
        "event_type": pa.array(["a", "b", "a"], pa.string()),
    }))
    out = events_hourly_pivot(ds).to_pandas() \
        .sort_values("hour").reset_index(drop=True)
    assert list(out.columns) == ["hour", "n_a", "n_b"]
    assert out["n_a"].tolist() == [1, 1]
    assert out["n_b"].tolist() == [1, 0]  # zero, not null
    out2 = events_hourly_pivot(ds.repartition(3)).to_pandas() \
        .sort_values("hour").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_events_asof_forward(ray_session):
    """Forward as-of: next view at ts >= click ts, ties to smaller
    id; no later view -> nulls."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import events_asof_join

    ts = np.array(["2024-01-01T00:00:00",   # click (u1)
                   "2024-01-01T00:00:10",   # view  (u1)
                   "2024-01-01T00:00:10",   # view  (u1) same ts
                   "2024-01-01T00:05:00",   # click (u2), no view after
                   "2024-01-01T00:04:00"],  # view  (u2) BEFORE click
                  dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(ts),
        "event_type": pa.array(["click", "view", "view", "click",
                                "view"], pa.string()),
    }))
    out = events_asof_join(ds, direction="forward",
                           n_partitions=2).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["next_event_id"].tolist()[0] == 2  # tie -> smaller id
    assert out["gap_sec"].tolist()[0] == 10.0
    assert pd.isna(out.loc[1, "next_event_id"])
    out2 = events_asof_join(ds.repartition(3), direction="forward",
                            n_partitions=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_doc_length_mad(ray_session):
    """Median + MAD by histogram folding equals direct numpy
    nearest-rank; invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import doc_length_mad

    lens = [1, 3, 3, 7, 20]
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(["a" * n for n in lens], pa.string())}))
    out = doc_length_mad(ds).to_pandas()
    # nearest-rank median of [1,3,3,7,20] -> rank ceil(2.5)=3 -> 3
    assert int(out.loc[0, "median_len"]) == 3
    # deviations [2,0,0,4,17] sorted [0,0,2,4,17] -> rank 3 -> 2
    assert int(out.loc[0, "mad_len"]) == 2
    assert int(out.loc[0, "n_docs"]) == 5
    out2 = doc_length_mad(ds.repartition(3)).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_events_report(ray_session):
    """Composed long-form report: all four members present with the
    right totals."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import events_report

    ts = np.array(["2024-01-01T00:10:00", "2024-01-01T00:40:00",
                   "2024-01-01T01:10:00"], dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array(ts),
        "event_type": pa.array(["view", "click", "view"], pa.string()),
        "value": pa.array([5.0, 15.0, 25.0], pa.float64()),
    }))
    df = events_report(ds).to_pandas()
    by = df.groupby("metric")["value"].sum()
    assert by["hourly"] == 3
    assert by["unique_users"] == 2  # h0: u1 only; h1: u2
    assert by["value_hist"] == 3
    funnel = df[df.metric == "funnel"].set_index("k")["value"]
    assert funnel["2"] == 1  # u1: view->click
    assert funnel["1"] == 1  # u2: view only


def test_events_throttle(ray_session):
    """First event per (user, 5-min window); ties by id; invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import events_throttle

    ts = np.array(["2024-01-01T00:00:00", "2024-01-01T00:00:00",
                   "2024-01-01T00:03:00", "2024-01-01T00:06:00",
                   "2024-01-01T00:01:00"], dtype="datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([2, 1, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array(ts),
    }))
    out = events_throttle(ds, window_min=5,
                          n_partitions=2).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # u1 window 0: ids 1,2 tie at t0 -> keep 1; id 3 same window drops
    # u1 window 1: id 4; u2 window 0: id 5
    assert out["event_id"].tolist() == [1, 4, 5]
    out2 = events_throttle(ds.repartition(4), window_min=5,
                           n_partitions=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_event_value_zscores(ray_session):
    """z vs hand-computed exact-int moments; single-event hour null."""
    import math
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import event_value_zscores

    ts = np.array(["2024-01-01T00:10:00", "2024-01-01T00:20:00",
                   "2024-01-01T00:30:00", "2024-01-01T01:10:00"],
                  dtype="datetime64[us]")
    vals = [1.00, 2.00, 3.00, 9.99]
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts),
        "value": pa.array(vals, pa.float64()),
    }))
    out = event_value_zscores(ds).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    c = [100, 200, 300]
    n, s = 3, sum(c)
    ssq = sum(x * x for x in c)
    mean = float(s) / n
    std = math.sqrt(float(n * ssq - s * s) / float(n * n))
    exp0 = np.floor((100 - mean) / std * 1e6) / 1e6
    assert out.loc[0, "z"] == exp0
    assert pd.isna(out.loc[3, "z"])  # lone event in its hour
    out2 = event_value_zscores(ds.repartition(3)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_doc_length_cdf(ray_session):
    """CDF: one row per distinct length, cumulative counts and
    floor-6 fractions; invariance."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import doc_length_cdf

    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(["a", "aa", "aa", "aaaa"], pa.string())}))
    out = doc_length_cdf(ds).to_pandas()
    assert out["n_chars"].tolist() == [1, 2, 4]
    assert out["cum_docs"].tolist() == [1, 3, 4]
    assert out["cum_frac"].tolist() == [0.25, 0.75, 1.0]
    out2 = doc_length_cdf(ds.repartition(3)).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_value_time_correlation_by_type(ray_session):
    """Per-type r vs numpy corrcoef on (offset-sec, cents);
    zero-variance group null; invariance."""
    import math
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import value_time_correlation_by_type

    base = np.datetime64("2024-01-01T00:00:00", "us")
    secs = np.array([0, 60, 120, 180, 0, 60], dtype=np.int64)
    ts = base + (secs * 1_000_000).astype("timedelta64[us]")
    vals = [1.0, 2.0, 3.5, 4.0, 7.0, 7.0]
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 4 + ["b"] * 2, pa.string()),
        "ts": pa.array(ts),
        "value": pa.array(vals, pa.float64()),
    }))
    out = value_time_correlation_by_type(ds).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    x = secs[:4].astype(float)
    y = np.rint(np.array(vals[:4]) * 100)
    exp = np.corrcoef(x, y)[0, 1]
    assert abs(out.loc[0, "corr_value_time"] - exp) < 2e-6
    # 'b' values constant -> zero variance -> null
    assert pd.isna(out.loc[1, "corr_value_time"])
    out2 = value_time_correlation_by_type(
        ds.repartition(4)).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_events_time_range_sums_range_semantics(ray_session):
    """RANGE frame: value-distance window, ALL timestamp peers
    included (even 'later' rows at the same ts), boundary ts−m
    inclusive, users never bleed; partition invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import events_time_range_sums

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = [0, 5, 5, 15, 0]          # user 1: 0,5,5,15; user 2: 0
    user = [1, 1, 1, 1, 2]
    vals = [1.00, 2.00, 4.00, 8.00, 16.00]
    ts = base + (np.array(mins, dtype=np.int64)
                 * 60_000_000).astype("timedelta64[us]")
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(ts),
        "value": pa.array(vals, pa.float64()),
    }))
    out = events_time_range_sums(ds, minutes=10).to_pandas() \
        .set_index("event_id")
    # event 1 (t=0): only itself
    assert out.loc[1, "win_n"] == 1 and out.loc[1, "win_value_c2"] == 100
    # events 2 and 3 are ts-peers at t=5: BOTH include each other
    # plus event 1 (t=0 >= 5-10)
    for e in (2, 3):
        assert out.loc[e, "win_n"] == 3
        assert out.loc[e, "win_value_c2"] == 100 + 200 + 400
    # event 4 (t=15): peers at t=5 are exactly at the 10-min boundary
    # (inclusive), t=0 excluded
    assert out.loc[4, "win_n"] == 3
    assert out.loc[4, "win_value_c2"] == 200 + 400 + 800
    # user 2 isolated
    assert out.loc[5, "win_n"] == 1 and out.loc[5, "win_value_c2"] == 1600
    out2 = events_time_range_sums(
        ds.repartition(4), minutes=10, n_partitions=3).to_pandas() \
        .set_index("event_id")
    pd.testing.assert_frame_equal(out, out2)


def test_event_type_transitions_order_and_seams(ray_session):
    """Adjacency in (ts, id) order; cross-user seams dropped;
    partition invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import event_type_transitions

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = [0, 1, 2, 0, 1]
    ts = base + (np.array(mins, dtype=np.int64)
                 * 60_000_000).astype("timedelta64[us]")
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b", "b"],
                               pa.string()),
        "ts": pa.array(ts)}))
    out = event_type_transitions(ds).to_pandas()
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    # user1: a->b, b->a; user2: b->b.  NO a->b seam from u1's last
    # 'a' to u2's first 'b'.
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}
    out2 = event_type_transitions(ds.repartition(4),
                                  n_partitions=3).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_retention_cohorts_min_day(ray_session):
    """Cohort = per-user first day; same-day repeats dedupe;
    partition invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import retention_cohorts

    base = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.int64(86_400_000_000)
    offs = [0, 0, 2, 0, 1]  # u1: d0 (twice), d2; u2: d0, d1
    ts = base + (np.array(offs, dtype=np.int64)
                 * day).astype("timedelta64[us]")
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(ts)}))
    out = retention_cohorts(ds).to_pandas()
    d0 = int(np.datetime64("2024-01-01").astype(
        "datetime64[D]").astype(np.int64))
    got = {(r.cohort_day, r.day_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(d0, 0): 2, (d0, 1): 1, (d0, 2): 1}
    out2 = retention_cohorts(ds.repartition(3),
                             n_partitions=2).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_event_burstiness_hand_computed(ray_session):
    """Uniform 1/hour -> fano 0; all-in-one-hour burst over an
    H-hour span -> fano = n - n/H."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import event_burstiness
    hr = np.int64(3_600_000_000)
    # type u: one event in each of hours 0..3 (fano 0 over H=4)
    # type b: 4 events in hour 0, none in 1..3 (s1=4, s2=16)
    ts = [0, 1, 2, 3] + [0, 0, 0, 0]
    types = ["u"] * 4 + ["b"] * 4
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(types),
        "ts": pa.array(np.array(ts, dtype=np.int64) * hr,
                       pa.timestamp("us"))}))
    out = event_burstiness(ds.repartition(3)).to_pandas() \
        .set_index("event_type")
    assert (out["n_hours"] == 4).all()
    assert out.loc["u", "mean_per_hour"] == 1.0
    assert out.loc["u", "fano"] == 0.0  # s2/s1 - s1/H = 1 - 1
    assert out.loc["b", "mean_per_hour"] == 1.0
    assert out.loc["b", "fano"] == 3.0  # 16/4 - 4/4
