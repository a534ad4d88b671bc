"""Bloom-filter snapshot novelty — incremental crawl dedup.

A recurring 100 TB-pipeline job: "which documents of today's snapshot
are NEW versus everything already ingested?"  An exact answer is a
full anti-join (one all-to-all exchange of content hashes); the
standard scale shortcut is a Bloom filter of the seen snapshot,
broadcast once, tested batch-locally — the new corpus never shuffles
at all (Bloom 1970; the shape CCNet/Dolma-style dedup services use
between snapshots).

Determinism makes it oracle-able: bits are set by double hashing
(Kirsch-Mitzenmacher 2006) ``pos_i = (h1 + i*h2) mod 2^64 mod m`` with
(h1, h2) the two little-endian uint64 halves of ``md5(text)``, so the
exact bit pattern — false positives included — is re-derivable in
DuckDB HUGEINT SQL (see ``bloom_novelty``'s oracle in
``__ray_entry__``).  No false negatives ever: a text whose hash was
inserted always tests maybe-seen.

Scale shapes:
- ``build_bloom``  partial per-batch bitmaps, RANGE-SHARDED (the bit
  array is split into ``n_ranges`` word ranges; each batch emits only
  the ranges it touched) → ONE keyed exchange on range_id → a
  vectorized per-partition OR → the final m/8-byte bitmap is the only
  thing the driver ever materializes (it must exist in one piece to be
  broadcast).  Partial size per batch ≤ m/8 bytes regardless of rows.
- ``bloom_novelty``  ``ray.put`` the bitmap once; the corpus side is a
  stateless zero-shuffle membership map with a per-worker ``ray.get``
  memo (the decontaminate broadcast pattern, corpus.py:264).

Sizing: m_bits is a knob — at 1e9 seen docs and 1% fp, m ≈ 1.2 GB,
still a sane single broadcast; beyond ~1e10 use per-range sharded
blooms co-partitioned with an h1-range exchange instead of a broadcast
(the build side here already produces exactly those shards).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .util import arrow_out, strip_schema_metadata


def _hash_pair(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) little-endian uint64 halves of md5(text) per row."""
    buf = b"".join(hashlib.md5((t or "").encode("utf-8")).digest()
                   for t in texts)
    arr = np.frombuffer(buf, dtype="<u8").reshape(-1, 2)
    return arr[:, 0].copy(), arr[:, 1].copy()


def _positions(h1: np.ndarray, h2: np.ndarray, k: int,
               m_bits: int) -> np.ndarray:
    """(rows, k) bit positions; uint64 arithmetic wraps mod 2^64 by
    construction (mirrored as % 2^64 in the SQL oracle)."""
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)) \
        .astype(np.int64)


def build_bloom(ds: ray.data.Dataset, *, text_col: str = "text",
                m_bits: int = 1 << 16, k: int = 4, n_ranges: int = 16,
                n_partitions: int | None = None) -> np.ndarray:
    """Distributed Bloom build over ``ds[text_col]``.  Returns the
    final bitmap as ``np.uint64[m_bits/64]`` (driver-side — the
    broadcast artifact).  m_bits must be a multiple of 64*n_ranges."""
    if m_bits % (64 * n_ranges):
        raise ValueError("m_bits must be a multiple of 64*n_ranges")
    words_total = m_bits // 64
    words_per_range = words_total // n_ranges

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        if not texts:
            return pa.table({"range_id": pa.array([], pa.int64()),
                             "bits": pa.array([], pa.binary())})
        h1, h2 = _hash_pair(texts)
        pos = np.unique(_positions(h1, h2, k, m_bits))
        word = pos >> 6
        rid = word // words_per_range
        out_rid, out_bits = [], []
        for r in np.unique(rid):
            arr = np.zeros(words_per_range, dtype=np.uint64)
            p = pos[rid == r]
            w = (p >> 6) - int(r) * words_per_range
            np.bitwise_or.at(arr, w,
                             np.uint64(1) << (p & 63).astype(np.uint64))
            out_rid.append(int(r))
            out_bits.append(arr.tobytes())
        return pa.table({"range_id": pa.array(out_rid, pa.int64()),
                         "bits": pa.array(out_bits, pa.binary())})

    def or_reduce(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "bits" not in batch.columns:
            return arrow_out(pd.DataFrame(
                {"range_id": pd.Series([], dtype="int64"),
                 "bits": pd.Series([], dtype="object")}))
        rows = []
        for r, grp in batch.groupby("range_id", sort=False):
            stacked = np.stack([np.frombuffer(b, dtype=np.uint64)
                                for b in grp["bits"]])
            rows.append((int(r),
                         np.bitwise_or.reduce(stacked, axis=0).tobytes()))
        return arrow_out(pd.DataFrame(rows,
                                      columns=["range_id", "bits"]))

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    n_parts = min(n_partitions or default_partitions(), n_ranges)
    merged = strip_schema_metadata(ds.select_columns([text_col])) \
        .map_batches(partial, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["range_id"]) \
        .map_batches(or_reduce, batch_format="pandas", batch_size=None) \
        .take_all()  # ≤ n_ranges tiny rows — the bitmap itself

    bitmap = np.zeros(words_total, dtype=np.uint64)
    for row in merged:
        r = int(row["range_id"])
        bitmap[r * words_per_range:(r + 1) * words_per_range] = \
            np.frombuffer(row["bits"], dtype=np.uint64)
    return bitmap


def bloom_novelty(ds: ray.data.Dataset, seen: ray.data.Dataset, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  m_bits: int = 1 << 16, k: int = 4,
                  n_ranges: int = 16) -> ray.data.Dataset:
    """Flag each document of ``ds`` as novel vs the ``seen`` snapshot:
    ``maybe_seen`` is the Bloom verdict (false positives possible at
    the configured m/k, false negatives never), ``novel`` its
    negation.  Output: (id_col, maybe_seen, novel)."""
    bitmap = build_bloom(seen, text_col=text_col, m_bits=m_bits, k=k,
                         n_ranges=n_ranges)
    bloom_ref = ray.put(bitmap)
    _memo: dict = {}  # per-worker ray.get memo — one fetch per worker

    def scan(batch: pa.Table, *, ref) -> pa.Table:
        bm = _memo.get("b")
        if bm is None:
            bm = _memo["b"] = ray.get(ref)
        texts = batch.column(text_col).to_pylist()
        if texts:
            h1, h2 = _hash_pair(texts)
            pos = _positions(h1, h2, k, m_bits)
            bits = (bm[pos >> 6] >> (pos.astype(np.uint64) & 63)) & 1
            maybe = bits.all(axis=1)
        else:
            maybe = np.zeros(0, dtype=bool)
        return pa.table({
            id_col: batch.column(id_col),
            "maybe_seen": pa.array(maybe, pa.bool_()),
            "novel": pa.array(~maybe, pa.bool_()),
        })

    return strip_schema_metadata(ds.select_columns([id_col, text_col])) \
        .map_batches(scan, batch_format="pyarrow",
                     fn_kwargs={"ref": bloom_ref})
