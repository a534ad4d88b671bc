"""Edit-distance-verified near-duplicate pairs — the record-linkage
member of the dedup family (Levenshtein over a normalized prefix,
candidates from cheap key blocking; the classic blocking+verify shape
of Hernandez & Stolfo's merge/purge and modern entity resolution).

MinHash/SimHash answer "mostly the same shingles"; edit distance
answers "literally almost the same string" — the right notion for
boilerplate variants, OCR noise and template drift where token-set
similarity over- or under-fires.  Blocking on the first
``block_chars`` of the normalized text is a recall heuristic (two
texts differing inside the block key are never candidates) — standard
for linkage, documented, and mirrored EXACTLY by the SQL oracle so
verification is value-level on the same family.

Scale shape: one stateless normalize+shed map (compact
(id, block_key, prefix) rows — full text never moves), ONE hash-keyed
exchange on the block key, then a vectorized per-partition pass:
blocks larger than ``max_block`` are skipped outright (a hot block key
means the prefix is boilerplate; the cap is mirrored in SQL via a
window count), in-block pairs are verified with a FULLY VECTORIZED
Levenshtein DP across all pairs at once — the insertion-chain
dependency is folded into a prefix-min (``new[j] = j +
min_{k<=j}(base[k]-k)``, one ``np.minimum.accumulate`` per DP row), so
the per-partition cost is ``prefix_chars`` numpy ops over a
(pairs × prefix_chars) lattice, no Python-level pair loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_WS_RUN = r"[ \t\n\r\f\v]+"  # explicit ASCII class: Python/RE2 parity


def _levenshtein_block(a_codes: np.ndarray, la: np.ndarray,
                       b_codes: np.ndarray, lb: np.ndarray
                       ) -> np.ndarray:
    """Exact Levenshtein distance for n pairs at once.

    ``a_codes``/``b_codes``: (n, L) int32 codepoint lattices padded
    with -1; ``la``/``lb``: true lengths.  Row recurrence
    ``new[j] = min(new[j-1]+1, prev[j]+1, prev[j-1]+cost)`` is
    vectorized by unrolling the in-row dependency:
    ``new[j] = j + min_{k<=j}(base[k]-k)`` with
    ``base[0]=i, base[j]=min(prev[j]+1, prev[j-1]+cost_j)`` — a
    prefix-min per row (np.minimum.accumulate), so the whole DP is
    ``max(la)`` vector steps over (n, L+1) arrays.
    """
    n, L = a_codes.shape
    idx = np.arange(L + 1, dtype=np.int32)
    prev = np.broadcast_to(idx, (n, L + 1)).copy()
    dist = lb.astype(np.int32).copy()  # pairs with la == 0
    base = np.empty((n, L + 1), dtype=np.int32)
    for i in range(1, int(la.max(initial=0)) + 1):
        cost = (a_codes[:, i - 1][:, None] != b_codes).astype(np.int32)
        base[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost,
                   out=base[:, 1:])
        new = np.minimum.accumulate(base - idx, axis=1) + idx
        hit = la == i
        if hit.any():
            dist[hit] = new[hit, lb[hit]]
        prev = new
    return dist


def edit_distance_pairs(ds: ray.data.Dataset, *,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        block_chars: int = 16,
                        prefix_chars: int = 64,
                        max_dist: int = 6,
                        max_block: int = 64,
                        n_partitions: int | None = None
                        ) -> ray.data.Dataset:
    """Pairs (doc_a < doc_b, dist) whose normalized ``prefix_chars``
    prefixes are within ``max_dist`` edits, candidates blocked on the
    first ``block_chars`` of the normalized text.  Normalization =
    lower + collapse ASCII-whitespace runs to one space + trim spaces
    (op-for-op the SQL oracle's ``trim(regexp_replace(lower(text),
    '[ \\t\\n\\r\\f\\v]+', ' ', 'g'))``)."""
    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata

    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()
    proj = strip_schema_metadata(ds.select_columns([id_col, text_col]))

    def shed(batch: pd.DataFrame) -> pa.Table:
        nt = (batch[text_col].astype(str).str.lower()
              .str.replace(_WS_RUN, " ", regex=True).str.strip(" "))
        return arrow_out(pd.DataFrame({
            "doc_id": batch[id_col].to_numpy(),
            "bk": nt.str.slice(0, block_chars),
            "pfx": nt.str.slice(0, prefix_chars)}))

    empty = pd.DataFrame({
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
        "dist": pd.Series([], dtype="int64")})

    def verify(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "bk" not in batch.columns:
            return arrow_out(empty.copy())
        b = batch.sort_values(["bk", "doc_id"]).reset_index(drop=True)
        sizes = b.groupby("bk", sort=False)["doc_id"].transform("size")
        b = b[(sizes >= 2) & (sizes <= max_block)]
        if len(b) == 0:
            return arrow_out(empty.copy())
        # in-block (i < j) index pairs, vectorized: runs are contiguous
        b = b.reset_index(drop=True)
        run_id, run_start = np.unique(b["bk"].to_numpy(dtype=object),
                                      return_index=True)
        run_start = np.sort(run_start)
        run_len = np.diff(np.append(run_start, len(b)))
        # pair counts per run: m*(m-1)/2
        ia, ib = [], []
        for s, m in zip(run_start, run_len):
            iu, ju = np.triu_indices(m, k=1)
            ia.append(s + iu)
            ib.append(s + ju)
        ia = np.concatenate(ia) if ia else np.empty(0, np.int64)
        ib = np.concatenate(ib) if ib else np.empty(0, np.int64)
        if len(ia) == 0:
            return arrow_out(empty.copy())
        pfx = b["pfx"].tolist()
        L = prefix_chars
        lat = np.full((len(b), L), -1, dtype=np.int32)
        lens = np.empty(len(b), dtype=np.int32)
        for r, s in enumerate(pfx):
            cp = np.frombuffer(s.encode("utf-32-le"),
                               dtype=np.uint32).astype(np.int32)
            lat[r, :len(cp)] = cp
            lens[r] = len(cp)
        dist = _levenshtein_block(lat[ia], lens[ia], lat[ib], lens[ib])
        keep = dist <= max_dist
        da = b["doc_id"].to_numpy()[ia[keep]]
        db = b["doc_id"].to_numpy()[ib[keep]]
        out = pd.DataFrame({"doc_a": da.astype("int64"),
                            "doc_b": db.astype("int64"),
                            "dist": dist[keep].astype("int64")})
        return arrow_out(out.sort_values(["doc_a", "doc_b"])
                         .reset_index(drop=True))

    return proj.map_batches(shed, batch_format="pandas") \
        .repartition(num_blocks=n_parts, keys=["bk"]) \
        .map_batches(verify, batch_format="pandas", batch_size=None)
