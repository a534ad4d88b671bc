"""Distributed-correctness invariance: keyed-exchange operators must
produce IDENTICAL results at different partition counts — the
single-box stand-in for 'same answer on any cluster size'."""

import pandas as pd
import pyarrow as pa


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_fetch_schedule_partition_invariant(ray_session):
    import ray.data
    from readability_ray.functions import fetch_schedule

    def urls():
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "url": pa.array([f"https://h{i % 5}.test/p/{i % 7}/{i}"
                             for i in range(40)], pa.string()),
        }))

    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["h0.test", "h2.test"], pa.string()),
        "robots_txt": pa.array(["User-agent: *\nCrawl-delay: 3",
                                "User-agent: *\nCrawl-delay: 0.5"],
                               pa.string()),
    }))
    a = _sorted(fetch_schedule(urls(), robots,
                               n_partitions=2).to_pandas())
    b = _sorted(fetch_schedule(urls(), robots,
                               n_partitions=7).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_host_stats_partition_invariant(ray_session):
    import ray.data
    from readability_ray.functions import host_stats

    def docs():
        return ray.data.from_arrow(pa.table({
            "url": pa.array([f"https://s{i % 4}.test/{i}"
                             for i in range(60)], pa.string()),
            "text": pa.array(["w " * (i % 9) for i in range(60)],
                             pa.string()),
            "lang": pa.array([["en", "fr", "de"][i % 3]
                              for i in range(60)], pa.string()),
        }))

    a = _sorted(host_stats(docs(), n_partitions=2).to_pandas())
    b = _sorted(host_stats(docs(), n_partitions=6).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_top_users_partition_invariant(ray_session):
    import ray.data
    from readability_ray.functions import top_users_per_type

    def events():
        return ray.data.from_arrow(pa.table({
            "event_type": pa.array([["c", "v"][i % 2]
                                    for i in range(80)], pa.string()),
            "user_id": pa.array([i % 11 for i in range(80)],
                                pa.int64()),
        }))

    a = _sorted(top_users_per_type(events(), k=3,
                                   n_partitions=2).to_pandas())
    b = _sorted(top_users_per_type(events(), k=3,
                                   n_partitions=5).to_pandas())
    pd.testing.assert_frame_equal(a, b)
