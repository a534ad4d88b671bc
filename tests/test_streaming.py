"""sessionize_incremental: carried-state streaming fold equals the
batch sessionizer at any chunking."""


def _events(ray):
    import numpy as np
    import pyarrow as pa
    import ray.data
    # u1: a session straddling every chunk boundary (events every
    # 10 min — never a 30-min gap), u2: two well-separated sessions,
    # u3: a single event.
    ts1 = np.arange(0, 6 * 3600, 600)[:30]
    ts2 = np.array([100, 700, 20000, 20600])
    ts3 = np.array([5000])
    all_ts = np.concatenate([ts1, ts2, ts3]) * 1_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    users = np.array([1] * len(ts1) + [2] * len(ts2) +
                     [3] * len(ts3), dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array(users),
        "ts": pa.array(base + all_ts.astype("timedelta64[us]")),
    }))


def test_incremental_equals_batch(ray_session):
    import pandas as pd
    import ray
    from readability_ray.functions.textstats import events_sessionize
    from readability_ray.pipelines import sessionize_incremental

    ds = _events(ray)
    batch = events_sessionize(ds).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    for n_chunks in (1, 3, 5):
        inc = sessionize_incremental(
            ds, n_chunks=n_chunks, n_partitions=2).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(batch, inc)
    # hand-check: u1 one long session of 30; u2 two sessions of 2
    assert batch.loc[0, "n_sessions"] == 1
    assert batch.loc[0, "longest_session_events"] == 30
    assert batch.loc[1, "n_sessions"] == 2
    assert batch.loc[1, "longest_session_events"] == 2
    assert batch.loc[2, "n_events"] == 1


def test_incremental_partition_invariance(ray_session):
    import pandas as pd
    import ray
    from readability_ray.pipelines import sessionize_incremental

    ds = _events(ray)
    a = sessionize_incremental(ds, n_chunks=3,
                               n_partitions=2).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    b = sessionize_incremental(ds.repartition(5), n_chunks=4,
                               n_partitions=3).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
