"""Training-shard assembly: deterministic corpus shuffle + sequence
packing — the last mile of a pre-training data pipeline (corpus →
shuffled shards → fixed-length token sequences).

- ``shard_shuffle``   content-independent pseudo-random shard + position
  for every document (the "global shuffle" a trainer needs, without a
  ``random_shuffle`` all-to-all: ONE keyed exchange of ids only).
- ``pack_sequences``  concat-and-chunk packing: per shard, documents are
  concatenated in shuffle order and chopped into fixed ``seq_len``
  token windows (the standard GPT-style pretraining layout); emits each
  document's token span and the sequence range it lands in.

Both are exactly reproducible (md5-of-id ordering, integer outputs),
so both carry value-level DuckDB oracles in ``__ray_entry__``.

Scale shapes: shard/rank/token-count are computed in a stateless
vectorized map (the text never crosses an exchange — ids, shard keys
and token counts do); each op is then ONE hash shuffle
(``repartition(keys=["shard"])``) + a single vectorized per-partition
pandas pass (sort + arange / cumsum) — the round-3 keyed-repartition
shape, no Dataset-level HashAggregate, no driver materialization.
Partitioning assumption: one shard's id rows fit in one partition —
with ``n_shards`` sized ≥ cluster cores (the normal setting: shard
count = training-worker count × files-per-worker), a shard of a 100 TB
corpus is ids+counts only, a few GB at most.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata

_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")


def _shard_keys(batch: pa.Table, n_shards: int,
                count_tokens: bool) -> pa.Table:
    """Vectorized map stage: md5-of-id shard + in-shard rank key (and
    optionally the whitespace token count) — everything the exchange
    needs, so the text column is dropped before any shuffle."""
    ids = batch.column("doc_id").to_pylist()
    digests = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    shards = np.fromiter((int(d[:8], 16) % n_shards for d in digests),
                         dtype=np.int64, count=len(ids))
    cols = {
        "doc_id": batch.column("doc_id"),
        "shard": pa.array(shards, pa.int64()),
        "rank_key": pa.array(digests, pa.string()),
    }
    if count_tokens:
        texts = batch.column("text").to_pylist()
        n_tok = np.fromiter((len(_TOKEN_RE.findall(t or ""))
                             for t in texts),
                            dtype=np.int64, count=len(texts))
        cols["n_tokens"] = pa.array(n_tok, pa.int64())
    return pa.table(cols)


def _keyed_by_shard(ds: ray.data.Dataset, n_shards: int,
                    count_tokens: bool,
                    n_partitions: int | None) -> ray.data.Dataset:
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()
    cols = ["doc_id", "text"] if count_tokens else ["doc_id"]
    return strip_schema_metadata(ds.select_columns(cols)) \
        .map_batches(_shard_keys, batch_format="pyarrow",
                     fn_kwargs={"n_shards": n_shards,
                                "count_tokens": count_tokens}) \
        .repartition(num_blocks=n_parts, keys=["shard"])


def shard_shuffle(ds: ray.data.Dataset, n_shards: int = 8,
                  n_partitions: int | None = None) -> ray.data.Dataset:
    """Deterministic global shuffle: every document gets a
    pseudo-random ``(shard, pos)`` — shard = first-8-hex of
    md5(doc_id) mod ``n_shards`` (the hash_split convention), pos =
    dense 0-based rank within the shard by (md5(doc_id), doc_id).

    Reproducible across runs, cluster sizes and partitionings — the
    property a resumable 100 TB shard build needs and
    ``Dataset.random_shuffle`` cannot give (its placement depends on
    the execution).  Output: (doc_id, shard, pos).
    """

    def rank(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "shard" not in batch.columns:
            # hash-shuffle empty partitions arrive as schema-less blocks
            return arrow_out(pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "shard": pd.Series([], dtype="int64"),
                 "pos": pd.Series([], dtype="int64")}))
        b = batch.sort_values(["shard", "rank_key", "doc_id"])
        pos = b.groupby("shard", sort=False).cumcount()
        return arrow_out(b.assign(pos=pos)[["doc_id", "shard", "pos"]]
                         .reset_index(drop=True))

    return _keyed_by_shard(ds, n_shards, False, n_partitions) \
        .map_batches(rank, batch_format="pandas", batch_size=None)


def pack_sequences(ds: ray.data.Dataset, seq_len: int = 256,
                   n_shards: int = 8,
                   n_partitions: int | None = None) -> ray.data.Dataset:
    """Concat-and-chunk sequence packing: within each shard, documents
    are laid out in shuffle order (md5(doc_id), doc_id), their
    whitespace-token streams concatenated, and the stream chopped into
    fixed ``seq_len`` windows.  Emits, per document:

    - ``begin_token``  exclusive-prefix-sum offset in the shard stream
    - ``n_tokens``     the document's own token count
    - ``first_seq`` / ``last_seq``  the window range the document's
      tokens land in (0-based within the shard; a zero-token document
      occupies no window — both are the window its offset points at,
      ``n_seqs`` below makes the emptiness explicit)
    - ``n_seqs``       number of windows the document touches

    This is the standard GPT-style pretraining layout (no per-bin
    reset, so the boundary math is a pure prefix sum — exactly the
    property that keeps it a one-exchange distributed op AND
    window-SQL-expressible for the oracle).  Documents longer than
    ``seq_len`` simply span several windows.
    """

    def pack(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "shard" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "shard": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
                "begin_token": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "first_seq": pd.Series([], dtype="int64"),
                "last_seq": pd.Series([], dtype="int64"),
                "n_seqs": pd.Series([], dtype="int64")}))
        b = batch.sort_values(["shard", "rank_key", "doc_id"])
        pos = b.groupby("shard", sort=False).cumcount()
        end = b.groupby("shard", sort=False)["n_tokens"].cumsum()
        begin = end - b["n_tokens"]
        first_seq = begin // seq_len
        # last token of the doc sits in window (end-1)//seq_len; a
        # zero-token doc touches no window at all
        last_seq = np.where(b["n_tokens"] > 0,
                            (end - 1) // seq_len, first_seq)
        n_seqs = np.where(b["n_tokens"] > 0,
                          last_seq - first_seq + 1, 0)
        out = b.assign(pos=pos, begin_token=begin,
                       first_seq=first_seq,
                       last_seq=last_seq.astype("int64"),
                       n_seqs=n_seqs.astype("int64"))
        return arrow_out(out[["doc_id", "shard", "pos", "begin_token",
                              "n_tokens", "first_seq", "last_seq",
                              "n_seqs"]].reset_index(drop=True))

    return _keyed_by_shard(ds, n_shards, True, n_partitions) \
        .map_batches(pack, batch_format="pandas", batch_size=None)
