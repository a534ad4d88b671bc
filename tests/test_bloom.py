"""Bloom snapshot novelty: exact-bitmap equality vs a local reference
implementation, the no-false-negative guarantee, and deterministic
false positives at adversarially small m.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from readability_ray.functions.bloom import (bloom_novelty, build_bloom,
                                             _hash_pair, _positions)


def _local_bloom(texts, m_bits, k):
    bm = np.zeros(m_bits // 64, dtype=np.uint64)
    for t in texts:
        d = hashlib.md5((t or "").encode()).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little")
        for i in range(k):
            p = ((h1 + i * h2) % (1 << 64)) % m_bits
            bm[p >> 6] |= np.uint64(1 << (p & 63))
    return bm


def _ds(ray, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_hash_pair_matches_reference():
    texts = ["alpha", "", "記事本文", "x" * 1000]
    h1, h2 = _hash_pair(texts)
    for j, t in enumerate(texts):
        d = hashlib.md5(t.encode()).digest()
        assert h1[j] == int.from_bytes(d[:8], "little")
        assert h2[j] == int.from_bytes(d[8:], "little")
    pos = _positions(h1, h2, 4, 1 << 16)
    want = [((int(h1[0]) + i * int(h2[0])) % (1 << 64)) % (1 << 16)
            for i in range(4)]
    assert list(pos[0]) == want


def test_build_bloom_exact_bitmap(ray_session):
    texts = [f"document number {i} words" for i in range(300)]
    got = build_bloom(_ds(ray_session, texts), m_bits=1 << 14, k=4,
                      n_ranges=8)
    np.testing.assert_array_equal(got, _local_bloom(texts, 1 << 14, 4))


def test_no_false_negatives_and_planted_dup(ray_session):
    seen_texts = [f"seen doc {i}" for i in range(100)]
    corpus = seen_texts[:10] + [f"new doc {i}" for i in range(50)]
    out = bloom_novelty(_ds(ray_session, corpus),
                        _ds(ray_session, seen_texts, ids=list(range(100))),
                        m_bits=1 << 16, k=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # the 10 planted duplicates (same text, new ids) must flag seen
    assert out.loc[:9, "maybe_seen"].all()
    # at m=65536, n=100: fp ~ 1e-10 — the 50 new docs are all novel
    assert out.loc[10:, "novel"].all()
    assert (out["novel"] == ~out["maybe_seen"]).all()


def test_false_positives_deterministic_at_tiny_m(ray_session):
    seen_texts = [f"seen {i}" for i in range(64)]
    new_texts = [f"probe {i}" for i in range(64)]
    bm = _local_bloom(seen_texts, 256, 2)
    want = []
    for t in new_texts:
        d = hashlib.md5(t.encode()).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little")
        positions = [((h1 + i * h2) % (1 << 64)) % 256 for i in range(2)]
        want.append(all(int(bm[p >> 6]) >> (p & 63) & 1
                        for p in positions))
    assert any(want)  # the point: tiny m forces some false positives
    out = bloom_novelty(
        _ds(ray_session, new_texts),
        _ds(ray_session, seen_texts, ids=list(range(64))),
        m_bits=256, k=2, n_ranges=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["maybe_seen"]) == want


def test_m_bits_validation(ray_session):
    with pytest.raises(ValueError):
        build_bloom(_ds(ray_session, ["x"]), m_bits=1000, n_ranges=16)
