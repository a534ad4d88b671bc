"""Deduplication operators: exact, MinHash+LSH, SimHash.

Scale shapes (all hash-shuffle, no driver materialization anywhere):
- exact: vectorized content-hash column → ``groupby(hash)`` (the one
  hash shuffle) → vectorized Min/Count aggregate.  At 100 TB the hash
  column is 16 bytes/row, so the shuffle moves hashes + ids, never the
  text.
- MinHash+LSH: shingle→minhash per batch (numpy, vectorized per doc),
  explode to (band, band_hash, doc_id) rows,
  ``repartition(keys=[band, band_hash])`` co-location → vectorized
  per-partition pair scan → verification: exact n-gram Jaccard via two
  text hash-joins, or the zero-join signature-agreement estimator
  (``verify="estimate"``, the lightest 100 TB plan).
- SimHash: 64-bit signature per doc; near-dup = hamming ≤ k via
  band-exact-match co-location (4 bands of 16 bits → hamming ≤ 3
  complete by pigeonhole); signatures ride the band rows so the
  vectorized popcount verify needs no second pass over the corpus.

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


def exact_dedup(ds: ray.data.Dataset,
                n_partitions: int | None = None) -> ray.data.Dataset:
    """Hash-partition + first-per-group: one row per distinct text with
    the kept doc_id (min) and duplicate count.

    Shape: ONE keyed repartition on the content hash, then a single
    vectorized pandas ``groupby.agg`` per partition — globally correct
    because equal hashes co-locate.  (Ray's HashAggregate operator is
    the same exchange but was the measured wall on mostly-unique keys
    — 378 s remote wall at the 50 k-doc probe; the per-partition
    pandas pass costs seconds.)"""
    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()
    hashed = content_hashes(ds)

    def dedupe(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "text_hash" not in batch.columns:
            # hash-shuffle empty partitions arrive as schema-less blocks
            return pa.table({"text_hash": pa.array([], pa.string()),
                             "keeper_doc_id": pa.array([], pa.int64()),
                             "dup_count": pa.array([], pa.int64())})
        g = batch.groupby("text_hash", as_index=False, sort=False).agg(
            keeper_doc_id=("doc_id", "min"),
            dup_count=("doc_id", "size"))
        return arrow_out(g)

    return hashed.repartition(num_blocks=k, keys=["text_hash"]) \
        .map_batches(dedupe, batch_format="pandas", batch_size=None)


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

    def __call__(self, batch: pa.Table,
                 carry_signature: bool = False) -> pa.Table:
        """Explode each doc into (band, band_hash, doc_id) rows;
        with ``carry_signature`` the full num_perm×8-byte signature
        rides along (the estimate-verify path needs it at the pair
        site)."""
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_hash, out_sig = [], [], [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = self.signature(text)
            sig_bytes = sig.tobytes() if carry_signature else None
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:
                            (band + 1) * self.rows_per_band]
                band_hash = _md5_64(chunk.tobytes())
                out_doc.append(doc_id)
                out_band.append(band)
                out_hash.append(band_hash)
                if carry_signature:
                    out_sig.append(sig_bytes)
        cols = {
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.uint64()),
        }
        if carry_signature:
            cols["sig"] = pa.array(out_sig, pa.large_binary())
        return pa.table(cols)


_MINHASHER_MEMO: dict[tuple, "MinHasher"] = {}


def _minhash_band_rows(batch: pa.Table, num_perm: int, shingle_k: int,
                       bands: int,
                       carry_signature: bool = False) -> pa.Table:
    """Stateless-task wrapper around MinHasher: the hasher is memoized
    per worker process (same amortization as an actor's __init__
    without the pool's standing CPU reservation)."""
    key = (num_perm, shingle_k, bands)
    hasher = _MINHASHER_MEMO.get(key)
    if hasher is None:
        hasher = _MINHASHER_MEMO[key] = MinHasher(
            num_perm=num_perm, shingle_k=shingle_k, bands=bands)
    return hasher(batch, carry_signature=carry_signature)


def _ngram_jaccard(text_a: str, text_b: str, k: int) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def _scan_bucket_pairs(batch: pd.DataFrame, key_cols: list[str],
                       out_cols: dict,
                       max_group: int | None = None) -> pd.DataFrame:
    """Vectorized within-partition pair scan: the batch is one hash
    partition (all rows with equal key_cols co-located by
    ``repartition(keys=...)``); emit all same-bucket pairs.

    ``out_cols`` maps output column name → source column (or None for
    the id itself); pair order is (a < b) by doc id.  ``max_group``
    drops buckets with more than that many distinct ids before the
    self-merge (the document-frequency cutoff of set-similarity joins:
    a bucket of d ids explodes into d² pairs, and the hottest buckets
    — stopword shingles, templated band hashes — carry the least
    signal)."""
    names = list(out_cols.keys())
    src_cols = list(out_cols.values())
    id_src = src_cols[0]

    def empty() -> pd.DataFrame:
        return pd.DataFrame({f"{n}_{s}": pd.Series([], dtype="int64")
                             for s in ("a", "b") for n in names})

    if len(batch) == 0 or not set(key_cols) <= set(batch.columns):
        # hash-shuffle empty partitions arrive as schema-less blocks
        return empty()
    dup = batch[batch.duplicated(key_cols, keep=False)]
    if len(dup) == 0:
        return empty()
    # One row per (bucket, doc) so a doc never pairs with itself; then a
    # C-speed self-merge on the bucket key explodes each bucket into its
    # pair set, upper triangle kept (a < b by id).  A pair colliding in
    # several bands of the same partition is emitted per band — the
    # caller's downstream (doc_a, doc_b) aggregate dedupes, so no
    # in-partition seen-set is needed (round-2 hotspot: the itertuples
    # nested loop here was the 50 k-doc probe's ceiling).
    entries = dup.drop_duplicates(key_cols + [id_src])[key_cols + src_cols]
    if max_group is not None:
        sizes = entries.groupby(key_cols)[id_src].transform("size")
        entries = entries[sizes <= max_group]
        if len(entries) == 0:
            return empty()
    merged = entries.merge(entries, on=key_cols, suffixes=("_l", "_r"))
    merged = merged[merged[id_src + "_l"] < merged[id_src + "_r"]]
    if len(merged) == 0:
        return empty()
    data: dict[str, np.ndarray] = {}
    for name, src in zip(names, src_cols):
        data[f"{name}_a"] = merged[src + "_l"].to_numpy()
        data[f"{name}_b"] = merged[src + "_r"].to_numpy()
    return pd.DataFrame(data)


def _dedupe_pair_rows(pairs: ray.data.Dataset, agg_col: str | None,
                      how: str, k: int,
                      out_type: pa.DataType = pa.int64(),
                      a_col: str = "doc_a", b_col: str = "doc_b"
                      ) -> ray.data.Dataset:
    """Global (doc_a, doc_b) pair dedupe as a keyed repartition + ONE
    vectorized pandas pass per partition.

    Ray's HashAggregate operator was the measured wall for the pair
    paths (50 k-doc probe: 378 s remote wall in the aggregate vs 18 s
    in every other stage combined); the equivalent hash-shuffle
    repartition plus a per-partition ``groupby(...).agg`` costs the
    same single exchange and runs at pandas speed.  ``agg_col`` None
    means plain distinct."""
    import pandas as pd

    from .util import arrow_out

    def dedupe(batch: pd.DataFrame) -> pa.Table:
        cols = {a_col: pd.Series([], dtype="int64"),
                b_col: pd.Series([], dtype="int64")}
        if agg_col is not None:
            cols[agg_col] = pd.Series(
                [], dtype="float64" if out_type == pa.float64()
                else "int64")
        if len(batch) == 0 or a_col not in batch.columns:
            return arrow_out(pd.DataFrame(cols))
        if agg_col is None:
            out = batch.drop_duplicates([a_col, b_col])
        else:
            out = batch.groupby([a_col, b_col], as_index=False,
                                sort=False)[agg_col].agg(how)
        return arrow_out(out.reset_index(drop=True))

    keep = [a_col, b_col] + ([agg_col] if agg_col else [])
    return pairs.select_columns(keep) \
        .repartition(num_blocks=k, keys=[a_col, b_col]) \
        .map_batches(dedupe, batch_format="pandas", batch_size=None)


def minhash_lsh_pairs(ds: ray.data.Dataset, *, num_perm: int = 64,
                      shingle_k: int = 3, bands: int = 16,
                      jaccard_threshold: float = 0.5,
                      verify="exact",
                      n_partitions: int | None = None,
                      doc_id_col: str = "doc_id") -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash banding — no driver
    materialization anywhere in the plan.

    Plan shape (every stage streams):
      1. shingle→minhash→(band, band_hash, doc_id) rows (actor pool,
         vectorized numpy per doc; 8 bytes × bands per doc cross the
         shuffle, never the text);
      2. ``repartition(keys=[band, band_hash])`` hash-co-locates equal
         buckets into one of O(cores×4) partitions (scaled via
         ``default_partitions``, overridable) — a partition holds
         corpus/K band rows, bounded as the cluster grows;
      3. per-partition vectorized duplicated-scan emits candidate
         pairs; a (doc_a, doc_b) count-aggregate dedupes pairs found in
         several bands;
      4. verification, two modes:
         - ``verify="exact"`` (default; matches the n-gram-Jaccard
           definition bit-for-bit): attach the two texts via two HASH
           JOINS against the documents table keyed by doc id — the
           corpus text crosses the exchange once per join, never the
           driver (round-1 ``take_all`` broadcast removed per
           VERDICT.md #2);
         - ``verify="estimate"``: the full minhash signature
           (num_perm×8 B) rides the band rows, and Jaccard is the
           standard MinHash estimator — the fraction of agreeing
           permutations — computed at the pair site.  ZERO joins, the
           corpus text never moves; the price is num_perm×8 B × bands
           of signature payload per doc crossing the band shuffle.
           Wins over exact when pair-volume × doc-size outgrows
           corpus × that payload (dup-heavy corpora, large docs);
           loses on dup-light corpora where candidate pairs are rare
           (BASELINE.md round-3 probe).  Expected estimator error is
           ~1/sqrt(num_perm) (±0.125 at 64 perms).
         ``verify=False`` returns raw candidate pairs.

    Partitioning assumption: each (band, band_hash) bucket fits in one
    partition — holds unless a band hash is pathologically hot
    (templated corpora); salt the band hash with a doc-id prefix there.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()

    # Stateless-task stage with a per-worker-process memo of the hasher
    # (the permutation arrays are microseconds to build): unlike an
    # actor pool there is NO standing CPU reservation, which matters
    # here — this plan already runs four shuffle operators (repartition,
    # pair-dedupe groupby, two joins) whose aggregator pools must all
    # fit beside the map stages on a small CPU budget.
    import functools
    if verify == "estimate":
        # Zero-join path: the full signature rides each band row so the
        # MinHash estimator runs at the pair site — the corpus text
        # never crosses an exchange.
        band_fn = functools.partial(
            _minhash_band_rows, num_perm=num_perm, shingle_k=shingle_k,
            bands=bands, carry_signature=True)
        band_rows = ds.map_batches(band_fn, batch_format="pyarrow")
        return _minhash_estimate_pairs(
            band_rows, num_perm=num_perm, threshold=jaccard_threshold,
            n_partitions=k, doc_id_col=doc_id_col)
    band_fn = functools.partial(_minhash_band_rows, num_perm=num_perm,
                                shingle_k=shingle_k, bands=bands)
    band_rows = ds.map_batches(band_fn, batch_format="pyarrow")

    def scan(batch: pd.DataFrame) -> pa.Table:
        from .util import arrow_out
        return arrow_out(_scan_bucket_pairs(batch, ["band", "band_hash"],
                                            {"doc": doc_id_col}))

    candidates = band_rows \
        .repartition(num_blocks=k, keys=["band", "band_hash"]) \
        .map_batches(scan, batch_format="pandas", batch_size=None)
    # dedupe pairs found in multiple bands/partitions (keyed
    # repartition + vectorized distinct — see _dedupe_pair_rows)
    candidates = _dedupe_pair_rows(candidates, None, "", k)
    if not verify:
        return candidates

    # Distributed Jaccard verify: hash-join candidate ids against the
    # documents table (doc_id side) twice to attach text_a/text_b.
    # The block-count repartitions between shuffle ops are schema
    # scrubs: hash-shuffle ops emit SCHEMA-LESS empty blocks for empty
    # partitions, map stages skip empty blocks without running the UDF,
    # and a join partition fed only schema-less blocks fails inside
    # Acero ("no match for key field") — merging blocks drops the
    # empties.  Candidate pairs are tiny relative to the corpus, so the
    # rebalance is cheap.
    from .util import strip_schema_metadata
    scrub = max(2, k // 8)
    docs = strip_schema_metadata(ds.select_columns([doc_id_col, "text"]))
    # Sentinel seed: when the candidate set is EMPTY (dup-free corpus,
    # or a doc sample that kept no pair), every candidate block is a
    # schema-less shuffle empty; repartition PRUNES 0-row blocks, so a
    # typed-empty seed vanishes and Acero gets a schema-less left side
    # ("no match for key field doc_a").  A 1-ROW sentinel pair
    # (doc_a = doc_b = -1, matched by a sentinel doc so it survives
    # BOTH inner joins and keeps every downstream block typed) cannot
    # be pruned; verify_jaccard drops it in its final vectorized mask.
    seed_pair = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([-1], pa.int64()),
        "doc_b": pa.array([-1], pa.int64())}))
    seed_doc = ray.data.from_arrow(pa.table({
        doc_id_col: pa.array([-1], pa.int64()),
        "text": pa.array([""], pa.string())}))
    candidates = candidates.union(seed_pair)
    docs = docs.union(seed_doc)
    with_a = candidates.repartition(scrub) \
        .join(docs, "inner", num_partitions=k,
              on=("doc_a",), right_on=(doc_id_col,))
    with_a = with_a.rename_columns({"text": "text_a"})
    with_b = with_a.repartition(scrub) \
        .join(docs, "inner", num_partitions=k,
              on=("doc_b",), right_on=(doc_id_col,))
    with_b = with_b.rename_columns({"text": "text_b"})

    def verify_jaccard(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # schema-less empty shuffle partition
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        doc_a = batch.column("doc_a").to_pylist()
        doc_b = batch.column("doc_b").to_pylist()
        jac = [np.floor(_ngram_jaccard(ta, tb, shingle_k) * 1e6) / 1e6
               for ta, tb in zip(batch.column("text_a").to_pylist(),
                                 batch.column("text_b").to_pylist())]
        out = pa.table({
            "doc_a": pa.array(doc_a, pa.int64()),
            "doc_b": pa.array(doc_b, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        })
        mask = pa.array([j >= jaccard_threshold and a >= 0
                         for j, a in zip(jac, doc_a)])
        return out.filter(mask)

    return with_b.map_batches(verify_jaccard, batch_format="pyarrow")


def _minhash_estimate_pairs(band_rows: ray.data.Dataset, *, num_perm: int,
                            threshold: float, n_partitions: int,
                            doc_id_col: str) -> ray.data.Dataset:
    """Estimate-verify tail of minhash_lsh_pairs: co-locate band rows
    (signatures aboard), emit pairs with the MinHash Jaccard estimator
    (fraction of agreeing permutations), dedupe across bands with a
    Max aggregate (the estimate is identical in every band, Max is just
    the dedupe)."""
    from .util import arrow_out

    def scan(batch: pd.DataFrame) -> pa.Table:
        pairs = _scan_bucket_pairs(batch, ["band", "band_hash"],
                                   {"doc": doc_id_col, "sig": "sig"})
        if len(pairs) == 0:
            return arrow_out(pd.DataFrame({
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64")}))
        sig_a = np.frombuffer(b"".join(pairs["sig_a"]), dtype=np.uint64) \
            .reshape(len(pairs), num_perm)
        sig_b = np.frombuffer(b"".join(pairs["sig_b"]), dtype=np.uint64) \
            .reshape(len(pairs), num_perm)
        est = np.floor((sig_a == sig_b).mean(axis=1) * 1e6) / 1e6
        out = pd.DataFrame({"doc_a": pairs["doc_a"],
                            "doc_b": pairs["doc_b"],
                            "jaccard": est})
        return arrow_out(out[out["jaccard"] >= threshold]
                         .reset_index(drop=True))

    pairs = band_rows \
        .repartition(num_blocks=n_partitions, keys=["band", "band_hash"]) \
        .map_batches(scan, batch_format="pandas", batch_size=None)
    # cross-band dedupe (the estimate is identical in every band, max
    # is just the dedupe)
    return _dedupe_pair_rows(pairs, "jaccard", "max", n_partitions,
                             pa.float64())


# ---- exact n-gram Jaccard (set-similarity join) -----------------------------

def _gram_rows_batch(batch: pa.Table, shingle_k: int,
                     doc_id_col: str) -> pa.Table:
    """Explode each document into one row per DISTINCT word-k-shingle:
    (gram-hash uint64, doc_id, n_grams).  The per-doc distinct-gram
    count rides every row so the pair stage needs no join back to a
    per-doc table (24 B/gram crosses the shuffle, never the text)."""
    doc_ids = batch.column(doc_id_col).to_pylist()
    texts = batch.column("text").to_pylist()
    out_gram, out_doc, out_n = [], [], []
    for doc_id, text in zip(doc_ids, texts):
        grams = _shingles(text, shingle_k)
        n = len(grams)
        for g in grams:
            out_gram.append(_md5_64(g.encode("utf-8")))
            out_doc.append(doc_id)
            out_n.append(n)
    return pa.table({
        "gram": pa.array(out_gram, pa.uint64()),
        "doc_id": pa.array(out_doc, pa.int64()),
        "n_grams": pa.array(out_n, pa.int64()),
    })


def ngram_jaccard_pairs(ds: ray.data.Dataset, *, shingle_k: int = 3,
                        jaccard_threshold: float = 0.5,
                        max_doc_freq: int | None = None,
                        n_partitions: int | None = None,
                        doc_id_col: str = "doc_id") -> ray.data.Dataset:
    """EXACT n-gram-Jaccard near-duplicate pairs via a distributed
    inverted-index self-join (the classic set-similarity join) —
    full recall at the threshold, unlike the MinHash/SimHash
    approximations, and the ground truth they are measured against.

    Plan shape (two exchanges, text never moves):
      1. explode each doc into (gram-hash, doc_id, n_grams) rows —
         distinct word-k-shingles hashed to uint64 (64-bit md5;
         collision odds ~g²/2⁶⁵ over g distinct grams — negligible
         below ~10¹² grams, and deterministic);
      2. ``repartition(keys=[gram])`` co-locates equal grams; a
         vectorized per-partition self-merge emits one (doc_a, doc_b,
         n_a, n_b) row per SHARED gram — so the downstream per-pair
         row count IS the intersection size;
      3. ``repartition(keys=[doc_a, doc_b])`` + one pandas pass:
         |A∩B| = rows, |A∪B| = n_a + n_b − |A∩B|, floor-6 Jaccard,
         threshold filter.

    Scale: the exact join is quadratic in per-gram document frequency
    — a gram shared by d docs emits d² pair rows.  ``max_doc_freq``
    is the standard DF cutoff (drop grams hotter than F docs before
    the merge; hot shingles are boilerplate and carry no signal, but
    the result is then a documented SUBSET).  Default None = exact =
    the oracle semantics.  At 100 TB prefer ``minhash_lsh_pairs`` and
    use this as the verification ground truth on samples.

    Matches DuckDB: grams from ``regexp_extract_all(text,
    '[^ \\t\\n\\r\\f\\v]+')`` k-windows joined by ' ', DISTINCT per
    doc; docs with fewer than k tokens contribute their whole joined
    token list as the single gram (``_shingles`` semantics)."""
    import functools

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()

    gram_fn = functools.partial(_gram_rows_batch, shingle_k=shingle_k,
                                doc_id_col=doc_id_col)
    gram_rows = ds.map_batches(gram_fn, batch_format="pyarrow")

    def scan(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(_scan_bucket_pairs(
            batch, ["gram"], {"doc": "doc_id", "n": "n_grams"},
            max_group=max_doc_freq))

    shared = gram_rows \
        .repartition(num_blocks=k, keys=["gram"]) \
        .map_batches(scan, batch_format="pandas", batch_size=None)

    def to_jaccard(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "doc_a" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64")}))
        g = batch.groupby(["doc_a", "doc_b"], as_index=False,
                          sort=False).agg(
            inter=("n_a", "size"), n_a=("n_a", "first"),
            n_b=("n_b", "first"))
        union = g["n_a"] + g["n_b"] - g["inter"]
        jac = np.floor(g["inter"] / union * 1e6) / 1e6
        out = pd.DataFrame({"doc_a": g["doc_a"], "doc_b": g["doc_b"],
                            "jaccard": jac})
        return arrow_out(out[out["jaccard"] >= jaccard_threshold]
                         .reset_index(drop=True))

    return shared \
        .repartition(num_blocks=k, keys=["doc_a", "doc_b"]) \
        .map_batches(to_jaccard, batch_format="pandas", batch_size=None)


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


def simhash_near_pairs(ds: ray.data.Dataset, max_hamming: int = 3,
                       n_partitions: int | None = None
                       ) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: 4 bands of 16 bits — two signatures
    within hamming distance ≤ 3 must agree exactly on ≥ 1 band
    (pigeonhole), so banding finds ALL such pairs with a hash shuffle
    keyed on the EXACT (band, band_value); candidates are verified by
    exact hamming.  For max_hamming > 3 the band guarantee no longer
    covers every pair (recall < 1); results are the band-colliding
    subset.  The output self-describes this: a constant ``complete``
    column is true iff ``max_hamming <= 3`` (the pigeonhole-complete
    regime), so a consumer can't mistake the subset for full recall.

    Scale shape (cf. VERDICT.md #3 — the round-1 64-coarse-bucket
    ``map_groups`` is gone): band rows are co-located by
    ``repartition(keys=[band, band_value])`` into O(cores×4)
    partitions, each scanned vectorized; full signatures ride along (8
    bytes) so verification never rejoins the corpus.  Hot templated
    buckets concentrate in one partition — salt band_value with a
    doc-id prefix if a single bucket outgrows a block."""
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()
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

    from .util import arrow_out

    def scan(batch: pd.DataFrame) -> pa.Table:
        pairs = _scan_bucket_pairs(batch, ["band", "band_value"],
                                   {"doc": "doc_id", "sig": "simhash"})
        if len(pairs) == 0:
            return arrow_out(
                pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")}))
        sig_x = (pairs["sig_a"].to_numpy(dtype=np.uint64)
                 ^ pairs["sig_b"].to_numpy(dtype=np.uint64))
        # vectorized popcount via 8-bit lookup over the raw bytes
        lut = np.array([bin(v).count("1") for v in range(256)],
                       dtype=np.uint8)
        hamming = lut[sig_x.view(np.uint8).reshape(len(sig_x), 8)] \
            .sum(axis=1).astype(np.int64)
        out = pd.DataFrame({"doc_a": pairs["doc_a"],
                            "doc_b": pairs["doc_b"],
                            "hamming": hamming})
        return arrow_out(out[out["hamming"] <= max_hamming]
                         .reset_index(drop=True))

    pairs = signatures.map_batches(explode_bands, batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["band", "band_value"]) \
        .map_batches(scan, batch_format="pandas", batch_size=None)
    # distinct pairs (a pair can collide in several bands)
    deduped = _dedupe_pair_rows(pairs, "hamming", "min", k)

    complete = max_hamming <= 3  # pigeonhole guarantee regime

    def mark(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # schema-less empty shuffle partition
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64()),
                             "complete": pa.array([], pa.bool_())})
        return batch.append_column(
            "complete", pa.array([complete] * batch.num_rows, pa.bool_()))

    return deduped.map_batches(mark, batch_format="pyarrow")


# ---- near-dup clusters → keepers -------------------------------------------

def near_dup_keepers(pairs: ray.data.Dataset, *, n_iter: int = 16,
                     n_partitions: int | None = None) -> ray.data.Dataset:
    """Resolve near-duplicate PAIRS into per-document keeper
    assignments: connected components by iterative min-label
    propagation, keeper = smallest doc_id in each component.

    This is the step a training-data pipeline actually needs after
    minhash/simhash/embedding pair generation — "drop every doc whose
    keeper isn't itself".  Distributed shape: labels and (undirected)
    edges are tiny relative to the corpus (ids only); each iteration is
    one hash join (attach the source's current label to each edge) and
    one min-aggregate per destination.  Output: (doc_id, keeper_doc_id)
    for every doc appearing in some pair — docs with no pair keep
    themselves by definition and are not emitted.

    Convergence: min-propagation is MONOTONE (labels only ever
    decrease), so the label-sum — one tiny aggregate on the
    already-materialized id-only label table — is an exact signal:
    unchanged sum ⟺ no label changed.  Rounds stop early at the first
    unchanged sum; ``n_iter`` is the hard cap (a chain of diameter d
    needs ~d rounds), and hitting the cap while labels are still
    moving emits a ``RuntimeWarning`` — the keepers returned would be
    non-minimal for the unconverged components.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(pairs)
    k = n_partitions or default_partitions()
    scrub = max(2, k // 8)

    def both_directions(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # schema-less empty shuffle partition
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        a = batch.column("doc_a").cast(pa.int64())
        b = batch.column("doc_b").cast(pa.int64())
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(),
                                     b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(),
                                     a.combine_chunks()]),
        })

    edges = pairs.select_columns(["doc_a", "doc_b"]) \
        .map_batches(both_directions, batch_format="pyarrow") \
        .repartition(scrub)

    def init_labels(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        return pa.table({"doc_id": batch.column("src"),
                         "label": batch.column("src")})

    import pandas as pd

    from .util import arrow_out

    def min_label(label_rows: ray.data.Dataset) -> ray.data.Dataset:
        """Per-doc min label: keyed repartition + one vectorized
        pandas pass (Ray's HashAggregate operator pays a large fixed
        cost per invocation, and this runs every round)."""

        def pass_(batch: pd.DataFrame) -> pa.Table:
            if len(batch) == 0 or "doc_id" not in batch.columns:
                return arrow_out(pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "label": pd.Series([], dtype="int64")}))
            return arrow_out(
                batch.groupby("doc_id", as_index=False,
                              sort=False)["label"].min())

        return label_rows.repartition(num_blocks=scrub,
                                      keys=["doc_id"]) \
            .map_batches(pass_, batch_format="pandas", batch_size=None)

    # Iterative algorithm on a DAG engine: each round MATERIALIZES the
    # label table (distributed, object store — ids only, 16 B/row;
    # never the driver) so the plan stays a bounded 2-3 shuffle ops per
    # round instead of accreting 3×n_iter concurrent shuffle operators,
    # which starves small CPU budgets.  Edges are materialized once for
    # the same reason (reused every round).
    edges = edges.materialize()
    labels = min_label(
        edges.map_batches(init_labels, batch_format="pyarrow")) \
        .materialize()
    prev_sum = labels.sum("label", ignore_nulls=True)
    converged = prev_sum is None  # no pairs at all

    for _ in range(n_iter):
        if converged:
            break
        # attach src's label to each edge, propose it to dst, take min
        proposals = edges.join(labels, "inner", num_partitions=k,
                               on=("src",), right_on=("doc_id",))

        def to_proposal(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "label": pa.array([], pa.int64())})
            return pa.table({"doc_id": batch.column("dst"),
                             "label": batch.column("label")})

        merged = proposals.map_batches(to_proposal,
                                       batch_format="pyarrow") \
            .union(labels)
        labels = min_label(merged).materialize()
        new_sum = labels.sum("label", ignore_nulls=True)
        converged = new_sum == prev_sum  # monotone → exact signal
        prev_sum = new_sum

    if not converged:
        import warnings
        warnings.warn(
            f"near_dup_keepers hit the round cap n_iter={n_iter} while "
            "labels were still propagating — a component with diameter "
            "> n_iter is unconverged and its keepers are non-minimal; "
            "raise n_iter.", RuntimeWarning, stacklevel=2)

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "keeper_doc_id": pa.array([], pa.int64())})
        return pa.table({"doc_id": batch.column("doc_id"),
                         "keeper_doc_id": batch.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")


def minhash_recall_stats(ds: ray.data.Dataset, *,
                         shingle_k: int = 3,
                         jaccard_threshold: float = 0.5,
                         num_perm: int = 64, bands: int = 16,
                         sample_pct: int | None = None,
                         n_partitions: int | None = None
                         ) -> ray.data.Dataset:
    """Dedup-quality metrology: MinHash-LSH recall measured against
    the exact set-similarity join at the SAME threshold, as a gated
    value rather than prose — (n_exact, n_minhash, n_common,
    recall, precision).

    With verify="exact" both operators apply the identical jaccard
    gate, so minhash pairs ⊆ exact pairs (precision pinned at 1.0
    whenever any pair exists); recall measures what LSH banding
    misses.  Scale shape: both pair sets are tagged and UNIONed, ONE
    (doc_a, doc_b)-keyed exchange co-locates each pair's tags, and
    per-partition scalar partials merge in a single tiny block —
    pair sets never centralize.

    ``sample_pct``: recall at corpus scale is measured on a
    deterministic md5-bucket sample of docs (the exact set-similarity
    join is the one thing you cannot run over the full corpus) —
    keep docs where ``md5(str(doc_id))[:8] % 100 < sample_pct``, the
    hash_split bucket arithmetic, so DuckDB re-derives the identical
    sample.  None / 100 = full corpus (tiny-table tests).
    """
    import math

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()

    if sample_pct is not None and sample_pct < 100:
        import hashlib

        def keep_sample(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return batch
            mask = pa.array(
                [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                 % 100 < sample_pct
                 for i in batch.column("doc_id").to_pylist()],
                pa.bool_())
            return batch.filter(mask)

        ds = ds.map_batches(keep_sample, batch_format="pyarrow")

    exact = ngram_jaccard_pairs(
        ds, shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold,
        n_partitions=n_partitions) \
        .select_columns(["doc_a", "doc_b"])
    mh = minhash_lsh_pairs(
        ds, num_perm=num_perm, shingle_k=shingle_k, bands=bands,
        jaccard_threshold=jaccard_threshold, verify="exact",
        n_partitions=n_partitions) \
        .select_columns(["doc_a", "doc_b"])

    def tag(which):
        def run(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "src", pa.array([which] * batch.num_rows, pa.string()))
        return run

    # Neutral sentinel row (src="x": counted by no stat) so the merged
    # stream is never fully empty — a pair-free sample would otherwise
    # leave only schema-less blocks, every pandas stage skipped, and
    # the query would emit 0 rows instead of the recall=1.0 row.
    seed = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([-1], pa.int64()),
        "doc_b": pa.array([-1], pa.int64()),
        "src": pa.array(["x"], pa.string())}))
    both = strip_schema_metadata(exact).map_batches(
        tag("e"), batch_format="pyarrow") \
        .union(strip_schema_metadata(mh).map_batches(
            tag("m"), batch_format="pyarrow")) \
        .union(seed) \
        .repartition(num_blocks=k, keys=["doc_a", "doc_b"])

    def partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "src" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "n_exact": pd.Series([0], dtype="int64"),
                "n_minhash": pd.Series([0], dtype="int64"),
                "n_common": pd.Series([0], dtype="int64")}))
        g = batch.groupby(["doc_a", "doc_b"])["src"] \
            .agg(lambda s: "".join(sorted(set(s))))
        n_e = int((g.str.contains("e")).sum())
        n_m = int((g.str.contains("m")).sum())
        n_c = int((g == "em").sum())
        return arrow_out(pd.DataFrame({
            "n_exact": pd.Series([n_e], dtype="int64"),
            "n_minhash": pd.Series([n_m], dtype="int64"),
            "n_common": pd.Series([n_c], dtype="int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        ne = int(batch["n_exact"].sum())
        nm = int(batch["n_minhash"].sum())
        nc = int(batch["n_common"].sum())
        rec = math.floor((nc / ne if ne else 1.0) * 1e6) / 1e6
        prec = math.floor((nc / nm if nm else 1.0) * 1e6) / 1e6
        return arrow_out(pd.DataFrame({
            "n_exact": pd.Series([ne], dtype="int64"),
            "n_minhash": pd.Series([nm], dtype="int64"),
            "n_common": pd.Series([nc], dtype="int64"),
            "recall": pd.Series([rec], dtype="float64"),
            "precision": pd.Series([prec], dtype="float64")}))

    return both.map_batches(partials, batch_format="pandas",
                            batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def ngram_containment_pairs(ds: ray.data.Dataset, *,
                            shingle_k: int = 3,
                            containment_threshold: float = 0.8,
                            max_doc_freq: int | None = None,
                            n_partitions: int | None = None,
                            doc_id_col: str = "doc_id"
                            ) -> ray.data.Dataset:
    """EXACT n-gram CONTAINMENT pairs — the asymmetric cousin of
    :func:`ngram_jaccard_pairs` that catches quotes / excerpts /
    supersets symmetric dedup misses: containment(A in B) =
    |A∩B| / |A| can be ~1 while Jaccard is tiny (a paragraph quoted
    inside a book).

    Identical plan to the Jaccard join (same gram explode, same two
    keyed exchanges, text never moves); only the final per-pair pass
    differs — each co-located (doc_a, doc_b) pair emits up to TWO
    directional rows (contained, container, containment floor-6),
    one per direction clearing the threshold.

    Output: (contained, container, containment), sorted.
    """
    import functools

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()

    gram_fn = functools.partial(_gram_rows_batch,
                                shingle_k=shingle_k,
                                doc_id_col=doc_id_col)
    gram_rows = ds.map_batches(gram_fn, batch_format="pyarrow")

    def scan(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(_scan_bucket_pairs(
            batch, ["gram"], {"doc": "doc_id", "n": "n_grams"},
            max_group=max_doc_freq))

    shared = gram_rows \
        .repartition(num_blocks=k, keys=["gram"]) \
        .map_batches(scan, batch_format="pandas", batch_size=None)

    def to_containment(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "contained": pd.Series([], dtype="int64"),
            "container": pd.Series([], dtype="int64"),
            "containment": pd.Series([], dtype="float64")})
        if len(batch) == 0 or "doc_a" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby(["doc_a", "doc_b"], as_index=False,
                          sort=False).agg(
            inter=("n_a", "size"), n_a=("n_a", "first"),
            n_b=("n_b", "first"))
        c_ab = np.floor(g["inter"] / g["n_a"] * 1e6) / 1e6
        c_ba = np.floor(g["inter"] / g["n_b"] * 1e6) / 1e6
        out = pd.concat([
            pd.DataFrame({"contained": g["doc_a"],
                          "container": g["doc_b"],
                          "containment": c_ab}),
            pd.DataFrame({"contained": g["doc_b"],
                          "container": g["doc_a"],
                          "containment": c_ba}),
        ], ignore_index=True)
        return arrow_out(
            out[out["containment"] >= containment_threshold]
            .reset_index(drop=True))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "contained" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "contained": pd.Series([], dtype="int64"),
                "container": pd.Series([], dtype="int64"),
                "containment": pd.Series([], dtype="float64")}))
        return arrow_out(batch.sort_values(["contained", "container"])
                         .reset_index(drop=True))

    return shared \
        .repartition(num_blocks=k, keys=["doc_a", "doc_b"]) \
        .map_batches(to_containment, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def dup_rate_by_source(ds: ray.data.Dataset, *,
                       text_col: str = "text",
                       source_col: str = "source",
                       n_partitions: int | None = None
                       ) -> ray.data.Dataset:
    """Corpus-governance metrology: exact duplicate RATE per source —
    which feeds are shipping copies (the go/no-go signal corpus
    curation runs before paying near-dup compute on a new source).

    Shape: per-batch rows shed to (md5(text), source) — text never
    crosses the exchange — then ONE hash-keyed repartition.  Equal
    hashes co-locate, so a per-partition pandas pass computes EXACT
    partials per source (row count + distinct-hash count: a given
    (source, hash) pair lives in exactly one partition, hence the
    partial distinct counts sum without overlap).  Sources are a
    bounded vocabulary, so the merge is the repartition(1) + pandas
    shape (bounded-key merges never pay a keyed shuffle).

    dup_rate is computed in integer arithmetic —
    (1e6 * n_dups) // n_docs / 1e6 — so the float is bit-identical to
    the SQL oracle's.  Output: (source, n_docs, n_dups, dup_rate).
    """
    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()

    def to_hash_rows(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(t.encode("utf-8")).hexdigest()
                  for t in batch.column(text_col).to_pylist()]
        return pa.table({
            "h": pa.array(hashes, pa.string()),
            "source": batch.column(source_col)})

    def partials(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_distinct": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "source" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby("source", sort=False).agg(
            n_docs=("h", "size"), n_distinct=("h", "nunique")) \
            .reset_index()
        return arrow_out(pd.DataFrame({
            "source": g["source"],
            "n_docs": g["n_docs"].astype("int64"),
            "n_distinct": g["n_distinct"].astype("int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_dups": pd.Series([], dtype="int64"),
            "dup_rate": pd.Series([], dtype="float64")})
        if len(batch) == 0 or "source" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby("source", as_index=False, sort=False).sum()
        n_docs = g["n_docs"].to_numpy(dtype=np.int64)
        n_dups = n_docs - g["n_distinct"].to_numpy(dtype=np.int64)
        rate = (1_000_000 * n_dups // n_docs) / 1e6
        out = pd.DataFrame({
            "source": g["source"], "n_docs": n_docs,
            "n_dups": n_dups, "dup_rate": rate}) \
            .sort_values("source")
        return arrow_out(out.reset_index(drop=True))

    return strip_schema_metadata(
        ds.select_columns([text_col, source_col])) \
        .map_batches(to_hash_rows, batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["h"]) \
        .map_batches(partials, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)
