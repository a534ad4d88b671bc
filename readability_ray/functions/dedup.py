"""Deduplication operators: exact, MinHash+LSH, SimHash.

Scale shapes (ray_guide patterns):
- exact: vectorized content-hash column → ``groupby(hash)`` (the one
  hash shuffle) → first-per-group.  At 100 TB the hash column is 16
  bytes/row, so the shuffle moves hashes + ids, never the text.
- MinHash+LSH: shingle→minhash per batch (numpy, vectorized per doc),
  explode to (band, band_hash, doc_id) rows, groupby band bucket →
  candidate pairs → exact n-gram Jaccard verification.  Signatures are
  64 bytes/doc; buckets are tiny relative to the corpus.
- SimHash: 64-bit signature per doc; near-dup = hamming ≤ k via
  band-exact-match buckets (4 bands of 16 bits → hamming ≤ 3
  candidates).

All hashing is seeded md5 (stable across processes/machines — never
Python's randomized ``hash``).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_MERSENNE = (1 << 61) - 1


def _md5_64(data: bytes) -> int:
    return struct.unpack("<Q", hashlib.md5(data).digest()[:8])[0]


def _content_hash_batch(batch: pa.Table) -> pa.Table:
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in batch.column("text").to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_hash": pa.array(hashes, pa.string()),
    })


def content_hashes(ds: ray.data.Dataset) -> ray.data.Dataset:
    """md5 content hash per document (matches DuckDB ``md5(text)``)."""
    return ds.map_batches(_content_hash_batch, batch_format="pyarrow")


def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Hash-partition + first-per-group: one row per distinct text with
    the kept doc_id (min) and duplicate count.

    Vectorized aggregate (Min/Count) — a per-group ``map_groups`` costs
    a pandas call per distinct hash, which at mostly-unique corpora is
    one call per row."""
    from ray.data.aggregate import Count, Min
    hashed = content_hashes(ds)
    agg = hashed.groupby("text_hash").aggregate(Min("doc_id"), Count())

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "text_hash": batch.column("text_hash"),
            "keeper_doc_id": batch.column("min(doc_id)").cast(pa.int64()),
            "dup_count": batch.column("count()").cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


# ---- MinHash + LSH ---------------------------------------------------------

def _shingles(text: str, k: int) -> set:
    tokens = text.split()
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)}


class MinHasher:
    """Stateful minhash stage: permutation parameters built once per
    actor (map_batches callable class)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 bands: int = 16, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def signature(self, text: str) -> np.ndarray:
        shingles = _shingles(text, self.shingle_k)
        if not shingles:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        base = np.fromiter(
            (_md5_64(s.encode("utf-8")) for s in shingles),
            dtype=np.uint64, count=len(shingles))
        # (a*x + b) mod p for all perms × shingles, min over shingles
        products = (self.a[:, None] * (base[None, :] % _MERSENNE)
                    + self.b[:, None]) % _MERSENNE
        return products.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc into (band, band_hash, doc_id) rows."""
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = self.signature(text)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:
                            (band + 1) * self.rows_per_band]
                band_hash = _md5_64(chunk.tobytes())
                out_doc.append(doc_id)
                out_band.append(band)
                out_hash.append(band_hash)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.uint64()),
        })


def _ngram_jaccard(text_a: str, text_b: str, k: int) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def minhash_lsh_pairs(ds: ray.data.Dataset, *, num_perm: int = 64,
                      shingle_k: int = 3, bands: int = 16,
                      jaccard_threshold: float = 0.5,
                      verify: bool = True) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash banding.

    shingle→minhash→band rows → groupby(band, band_hash) → candidate
    pairs → exact n-gram Jaccard verify (broadcast text lookup).
    Partitioning assumption: each LSH bucket fits in one worker (holds
    unless one band hash is pathologically hot — salt the band hash with
    a doc-id prefix in that case).
    """
    import ray as _ray

    band_rows = ds.map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   bands=bands),
        # autoscaling (min=1): a fixed pool can reserve every CPU on a
        # small cluster and starve upstream tasks (executor deadlock)
        concurrency=(1, 4))

    # Coarse-partition the band rows (band_hash % K) so the shuffle has
    # K groups instead of one per distinct hash; real bucket collisions
    # are found vectorized inside each coarse partition.
    coarse = 64

    def add_coarse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        bucket = pc.bit_wise_and(batch.column("band_hash"),
                                 np.uint64(coarse - 1))
        return batch.append_column("coarse", bucket.cast(pa.int64()))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        dup = group[group.duplicated(["band", "band_hash"], keep=False)]
        pairs = set()
        for _, sub in dup.groupby(["band", "band_hash"], sort=False):
            ids = sorted(set(int(x) for x in sub["doc_id"]))
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    pairs.add((a, b))
        if not pairs:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(sorted(pairs), columns=["doc_a", "doc_b"])

    candidates = band_rows.map_batches(add_coarse, batch_format="pyarrow") \
        .groupby("coarse").map_groups(bucket_pairs, batch_format="pandas")
    # dedupe pairs found in multiple coarse partitions/bands: vectorized
    # count-aggregate, then drop the count
    from ray.data.aggregate import Count
    deduped = candidates.groupby(["doc_a", "doc_b"]).aggregate(Count())

    def drop_count(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_a", "doc_b"])

    candidates = deduped.map_batches(drop_count, batch_format="pyarrow")
    if not verify:
        return candidates

    # broadcast the text lookup (small side) — ray.put once, read per actor
    texts = {int(r["doc_id"]): r["text"]
             for r in ds.select_columns(["doc_id", "text"]).take_all()}
    text_ref = _ray.put(texts)

    class VerifyJaccard:
        def __init__(self):
            self.texts = _ray.get(text_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_a = batch.column("doc_a").to_pylist()
            doc_b = batch.column("doc_b").to_pylist()
            jac = [np.floor(_ngram_jaccard(
                self.texts.get(a, ""), self.texts.get(b, ""),
                shingle_k) * 1e6) / 1e6
                for a, b in zip(doc_a, doc_b)]
            out = pa.table({
                "doc_a": pa.array(doc_a, pa.int64()),
                "doc_b": pa.array(doc_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            })
            mask = pa.array([j >= jaccard_threshold for j in jac])
            return out.filter(mask)

    return candidates.map_batches(VerifyJaccard, batch_format="pyarrow",
                                  concurrency=(1, 2))


# ---- SimHash ---------------------------------------------------------------

_TOKEN_HASH_CACHE: dict[str, int] = {}
_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def _simhash64(text: str) -> int:
    tokens = text.split()
    if not tokens:
        return 0
    cache = _TOKEN_HASH_CACHE
    hashes = np.empty(len(tokens), dtype=np.uint64)
    for i, token in enumerate(tokens):
        h = cache.get(token)
        if h is None:
            h = _md5_64(token.encode("utf-8"))
            if len(cache) < 200_000:  # bounded per-worker memo
                cache[token] = h
        hashes[i] = h
    # one vectorized bit-expansion per document instead of per token
    bits = ((hashes[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1))
    acc = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
    bits_out = (acc > 0).astype(np.uint64)
    return int((bits_out << _BIT_SHIFTS).sum())


def _simhash_batch(batch: pa.Table) -> pa.Table:
    sims = [_simhash64(t) for t in batch.column("text").to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array(sims, pa.uint64()),
    })


def simhash_signatures(ds: ray.data.Dataset) -> ray.data.Dataset:
    """64-bit SimHash per document (document fingerprinting)."""
    return ds.map_batches(_simhash_batch, batch_format="pyarrow")


def simhash_near_pairs(ds: ray.data.Dataset, max_hamming: int = 3
                       ) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: 4 bands of 16 bits — two signatures
    within hamming distance ≤ 3 must agree exactly on ≥ 1 band
    (pigeonhole), so banding finds ALL such pairs with a groupby on
    (band, band_value); candidates are verified by exact hamming.
    For max_hamming > 3 the band guarantee no longer covers every pair
    (recall < 1); results are the band-colliding subset."""
    signatures = simhash_signatures(ds)

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sims = batch.column("simhash").to_pylist()
        out_doc, out_band, out_val, out_sig = [], [], [], []
        for doc_id, sig in zip(doc_ids, sims):
            for band in range(4):
                out_doc.append(doc_id)
                out_band.append(band)
                out_val.append((sig >> (band * 16)) & 0xFFFF)
                out_sig.append(sig)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_value": pa.array(out_val, pa.int32()),
            "simhash": pa.array(out_sig, pa.uint64()),
        })

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        dup = group[group.duplicated(["band", "band_value"], keep=False)]
        rows = set()
        for _, sub in dup.groupby(["band", "band_value"], sort=False):
            entries = sorted(
                {(int(r.doc_id), int(r.simhash)) for r in sub.itertuples()})
            for i, (a, sig_a) in enumerate(entries):
                for b, sig_b in entries[i + 1:]:
                    hamming = bin(sig_a ^ sig_b).count("1")
                    if hamming <= max_hamming:
                        rows.add((a, b, hamming))
        if not rows:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame(sorted(rows),
                            columns=["doc_a", "doc_b", "hamming"])

    def add_coarse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        coarse = pc.bit_wise_and(
            batch.column("band_value").cast(pa.int64()), 63)
        return batch.append_column("coarse", coarse)

    from ray.data.aggregate import Min
    exploded = signatures.map_batches(explode_bands, batch_format="pyarrow")
    pairs = exploded.map_batches(add_coarse, batch_format="pyarrow") \
        .groupby("coarse").map_groups(bucket_pairs, batch_format="pandas")
    # distinct pairs (a pair can collide in several bands)
    agg = pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_a": batch.column("doc_a"),
            "doc_b": batch.column("doc_b"),
            "hamming": batch.column("min(hamming)").cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")
