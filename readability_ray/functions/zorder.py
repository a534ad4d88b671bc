"""Z-order (Morton) clustering layout — the multi-dimensional data-
layout primitive lakehouses use (Delta OPTIMIZE ZORDER, Iceberg
sort orders) so that range predicates on EITHER dimension prune
blocks: rows are keyed by the bit-interleave of two quantized
dimensions and co-located by the z-key's high bits.

``zorder_layout`` computes the z-value (16+16-bit interleave) and
moves rows with ONE hash-keyed exchange on the z-bucket (the top
``bucket_bits`` of z) — at 100 TB this is the write path's
partitioning key, one shuffle, then ``write_parquet`` per bucket.
``zorder_manifest`` emits the verifiable artifact of the layout: one
row per bucket with exact row count and per-dimension min/max — the
block-pruning index a reader would consult.  All integers, so the
oracle is exact; the SQL re-derives the interleave as a 32-term
shift/mask sum (generated programmatically, mirrored op-for-op).

Quantization: ``x = x_int % 2^16``, ``y = floor(y*10^scale + 0.5) %
2^16`` (the embedding_quantize rounding form; inputs must be
non-negative for Python/SQL ``%`` parity — guarded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each int64 so bit j lands at 2j."""
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def morton_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton code of two 16-bit non-negative int64 arrays
    (x at even bits, y at odd bits)."""
    return _spread16(x & 0xFFFF) | (_spread16(y & 0xFFFF) << 1)


def zorder_layout(ds: ray.data.Dataset, *,
                  x_col: str, y_col: str, y_scale: int = 2,
                  bucket_bits: int = 8,
                  n_partitions: int | None = None) -> ray.data.Dataset:
    """Rows + (zval, zbucket), co-located by zbucket via one keyed
    exchange.  ``x_col`` must be integral, ``y_col`` is quantized at
    ``y_scale`` decimals; both taken mod 2^16 (non-negative only)."""
    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata

    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()
    shift = 32 - bucket_bits

    def key(batch: pd.DataFrame) -> pa.Table:
        x = batch[x_col].to_numpy(np.int64)
        y = np.floor(batch[y_col].to_numpy(np.float64)
                     * float(10 ** y_scale) + 0.5).astype(np.int64)
        if len(x) and (x.min() < 0 or y.min() < 0):
            raise ValueError("zorder_layout: negative inputs break "
                             "Python/SQL modulo parity; shift first")
        out = batch.copy()
        out["zval"] = morton_interleave(x % 65536, y % 65536)
        out["zbucket"] = out["zval"].to_numpy(np.int64) >> shift
        return arrow_out(out)

    return strip_schema_metadata(ds) \
        .map_batches(key, batch_format="pandas") \
        .repartition(num_blocks=n_parts, keys=["zbucket"])


def zorder_manifest(ds: ray.data.Dataset, *,
                    x_col: str, y_col: str, y_scale: int = 2,
                    bucket_bits: int = 8,
                    n_partitions: int | None = None
                    ) -> ray.data.Dataset:
    """Block-pruning manifest of the z-ordered layout: per zbucket the
    exact row count, z range and quantized per-dimension ranges —
    computed AFTER the layout exchange (each bucket is whole in one
    partition), then merged through an idempotent single-block pass
    (min/max/sum are re-aggregation-safe)."""
    from .util import arrow_out

    laid = zorder_layout(ds, x_col=x_col, y_col=y_col,
                         y_scale=y_scale, bucket_bits=bucket_bits,
                         n_partitions=n_partitions)

    empty = pd.DataFrame({
        "zbucket": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "z_min": pd.Series([], dtype="int64"),
        "z_max": pd.Series([], dtype="int64"),
        "x_min": pd.Series([], dtype="int64"),
        "x_max": pd.Series([], dtype="int64"),
        "y_min": pd.Series([], dtype="int64"),
        "y_max": pd.Series([], dtype="int64")})

    def stats(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "zbucket" not in batch.columns:
            return arrow_out(empty.copy())
        b = batch.copy()
        b["xq"] = b[x_col].to_numpy(np.int64) % 65536
        b["yq"] = (np.floor(b[y_col].to_numpy(np.float64)
                            * float(10 ** y_scale) + 0.5)
                   .astype(np.int64) % 65536)
        g = b.groupby("zbucket", sort=True).agg(
            n=("zval", "size"),
            z_min=("zval", "min"), z_max=("zval", "max"),
            x_min=("xq", "min"), x_max=("xq", "max"),
            y_min=("yq", "min"), y_max=("yq", "max")).reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return arrow_out(g)

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "zbucket" not in batch.columns:
            return arrow_out(empty.copy())
        g = batch.groupby("zbucket", sort=True).agg(
            n=("n", "sum"),
            z_min=("z_min", "min"), z_max=("z_max", "max"),
            x_min=("x_min", "min"), x_max=("x_max", "max"),
            y_min=("y_min", "min"), y_max=("y_max", "max")) \
            .reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return arrow_out(g)

    return laid.map_batches(stats, batch_format="pandas",
                            batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas")
