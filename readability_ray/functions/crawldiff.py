"""Crawl snapshot diff — the incremental-recrawl primitive: given two
crawls of the same url space, classify every url as added / removed /
changed / unchanged by content hash.  Feeding only the added+changed
set into extraction (and tombstoning the removed set) is how a
recurring 100 TB crawl avoids re-processing the ~90% of the web that
did not change between snapshots.

Shape: a FULL OUTER JOIN by key, built on the engine's union idiom
instead of Acero (hash-shuffle empty blocks crash Acero joins —
CLAUDE.md gotcha): each side is digested batch-locally to
(key, md5, side) rows — 50 B each, the page bytes never move — then
ONE key-keyed exchange co-locates both sides and a vectorized
per-partition pandas pivot emits the verdict.  Exactly one exchange of
hash-sized rows, any corpus size.

No reference counterpart (corpus-level operator).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata


def _digest_side(ds: ray.data.Dataset, side: str, id_col: str,
                 content_col: str) -> ray.data.Dataset:
    def digest(batch: pa.Table) -> pa.Table:
        vals = batch.column(content_col).to_pylist()
        hs = [hashlib.md5(
            v if isinstance(v, bytes) else (v or "").encode()
        ).hexdigest() for v in vals]
        return pa.table({
            id_col: batch.column(id_col).cast(pa.string()),
            "content_md5": pa.array(hs, pa.string()),
            "side": pa.array([side] * batch.num_rows, pa.string()),
        })

    return strip_schema_metadata(
        ds.select_columns([id_col, content_col])) \
        .map_batches(digest, batch_format="pyarrow")


def crawl_diff(old_ds: ray.data.Dataset, new_ds: ray.data.Dataset, *,
               id_col: str = "url", content_col: str = "html",
               n_partitions: int | None = None) -> ray.data.Dataset:
    """(id_col, status, old_md5, new_md5) for every key in either
    snapshot — status ∈ {added, removed, changed, unchanged}.
    Duplicate keys within one snapshot keep the lexicographically
    smallest hash (deterministic; dedup upstream if that matters).
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(old_ds)
    n_parts = n_partitions or default_partitions()

    tagged = _digest_side(old_ds, "old", id_col, content_col) \
        .union(_digest_side(new_ds, "new", id_col, content_col))

    def verdict(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "side" not in batch.columns:
            return arrow_out(pd.DataFrame({
                id_col: pd.Series([], dtype="object"),
                "status": pd.Series([], dtype="object"),
                "old_md5": pd.Series([], dtype="object"),
                "new_md5": pd.Series([], dtype="object")}))
        b = batch.sort_values("content_md5", kind="stable")
        piv = b.drop_duplicates([id_col, "side"]) \
            .pivot(index=id_col, columns="side",
                   values="content_md5")
        old = piv["old"] if "old" in piv.columns \
            else pd.Series(pd.NA, index=piv.index)
        new = piv["new"] if "new" in piv.columns \
            else pd.Series(pd.NA, index=piv.index)
        status = pd.Series("unchanged", index=piv.index, dtype="object")
        status[old.isna()] = "added"
        status[new.isna()] = "removed"
        both = old.notna() & new.notna()
        status[both & (old != new)] = "changed"
        out = pd.DataFrame({
            id_col: piv.index,
            "status": status.to_numpy(),
            "old_md5": old.fillna("").to_numpy(),
            "new_md5": new.fillna("").to_numpy(),
        })
        return arrow_out(out.reset_index(drop=True))

    return tagged.repartition(num_blocks=n_parts, keys=[id_col]) \
        .map_batches(verdict, batch_format="pandas", batch_size=None)
