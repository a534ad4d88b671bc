"""zorder: Morton interleave differential, layout co-location, and
manifest partition invariance."""

import numpy as np
import pyarrow as pa

from readability_ray.functions.zorder import (morton_interleave,
                                              zorder_manifest)


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for j in range(16):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_morton_differential():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 65536, 500, dtype=np.int64)
    y = rng.integers(0, 65536, 500, dtype=np.int64)
    z = morton_interleave(x, y)
    exp = np.array([_morton_ref(int(a), int(b))
                    for a, b in zip(x, y)], dtype=np.int64)
    assert (z == exp).all()
    # corners
    assert morton_interleave(np.array([0xFFFF]),
                             np.array([0]))[0] == 0x55555555
    assert morton_interleave(np.array([0]),
                             np.array([0xFFFF]))[0] == 0xAAAAAAAA


def _ds(n=400):
    import ray.data
    rng = np.random.default_rng(5)
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array(rng.integers(0, 150, n), pa.int64()),
        "value": pa.array(rng.uniform(0, 500, n).round(2),
                          pa.float64())}))


def test_manifest_counts_and_ranges(ray_session):
    ds = _ds()
    out = zorder_manifest(ds, x_col="user_id", y_col="value",
                          y_scale=2, bucket_bits=8,
                          n_partitions=4).to_pandas()
    assert out["n"].sum() == 400
    # z ranges nest inside their bucket: z >> 24 == zbucket
    assert ((out["z_min"].to_numpy() >> 24)
            == out["zbucket"].to_numpy()).all()
    assert ((out["z_max"].to_numpy() >> 24)
            == out["zbucket"].to_numpy()).all()
    assert (out["x_min"] <= out["x_max"]).all()
    assert (out["y_min"] <= out["y_max"]).all()
    # locality: each bucket's y-range is a narrow slice of the global
    glob = out["y_max"].max() - out["y_min"].min()
    assert ((out["y_max"] - out["y_min"]) <= glob / 2).all()


def test_manifest_partition_invariance(ray_session):
    ds = _ds(300)
    a = zorder_manifest(ds, x_col="user_id", y_col="value",
                        n_partitions=2).to_pandas() \
        .reset_index(drop=True)
    b = zorder_manifest(ds, x_col="user_id", y_col="value",
                        n_partitions=7).to_pandas() \
        .reset_index(drop=True)
    assert a.equals(b) and len(a) > 1


def test_negative_input_raises(ray_session):
    import pytest
    import ray.data
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([-1, 2], pa.int64()),
        "value": pa.array([1.0, 2.0], pa.float64())}))
    with pytest.raises(Exception, match="modulo parity"):
        zorder_manifest(ds, x_col="user_id",
                        y_col="value").to_pandas()
