

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
