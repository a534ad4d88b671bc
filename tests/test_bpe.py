"""Distributed BPE: exact differential against the textbook
single-process learner (same corpus → identical merge sequence),
encoder semantics, determinism, and degenerate corpora.
"""

import pyarrow as pa

from readability_ray.functions.bpe import (
    _merge_symbols, bpe_encode_stats, encode_bpe_word, learn_bpe,
    reference_bpe,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the the the quick quick fox",
    "pack my box with five dozen liquor jugs",
    "lazy lazy lazy dogs dream of quick brown foxes",
]


def _ds(texts):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def _merge_rows(t: pa.Table):
    return list(zip(t.column("step").to_pylist(),
                    t.column("left").to_pylist(),
                    t.column("right").to_pylist(),
                    t.column("pair_count").to_pylist()))


def test_matches_textbook_learner(ray_session):
    got = _merge_rows(learn_bpe(_ds(TEXTS), n_merges=20))
    assert got == reference_bpe(TEXTS, 20)
    assert len(got) > 5  # the corpus supports a real merge sequence


def test_matches_textbook_on_sf0001(ray_session):
    import ray.data
    path = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    texts = [r["text"] for r in ds.take_all()]
    got = _merge_rows(learn_bpe(ds, n_merges=16))
    assert got == reference_bpe(texts, 16)


def test_early_stop_when_no_repeats(ray_session):
    # every adjacent pair occurs once → no merge reaches count 2
    got = _merge_rows(learn_bpe(_ds(["abcdefg"]), n_merges=10))
    assert got == []


def test_deterministic(ray_session):
    a = _merge_rows(learn_bpe(_ds(TEXTS), n_merges=12))
    b = _merge_rows(learn_bpe(_ds(TEXTS), n_merges=12))
    assert a == b


def test_merge_symbols_greedy_non_overlapping():
    # "aaa" with merge (a, a): greedy left-to-right → [aa, a]
    assert _merge_symbols(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_symbols(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]


def test_encoder_applies_ranks_in_order():
    # ranks: (l,o)→0 then (lo,w</w>)→1; "low" → ["low</w>"]? No —
    # "w" and "</w>" never merged, so ["lo", "w", "</w>"]
    ranks = {("l", "o"): 0, ("lo", "w"): 1}
    assert encode_bpe_word("low", ranks) == ["low", "</w>"]
    assert encode_bpe_word("lot", ranks) == ["lo", "t", "</w>"]
    assert encode_bpe_word("x", {}) == ["x", "</w>"]


def test_encode_stats_counts(ray_session):
    ds = _ds(TEXTS)
    merges = learn_bpe(ds, n_merges=20)
    out = bpe_encode_stats(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ranks = {(l, r): s for s, l, r, _ in _merge_rows(merges)}
    import re
    tok = re.compile(r"[^ \t\n\r\f\v]+")
    for i, t in enumerate(TEXTS):
        words = tok.findall(t)
        exp_sub = sum(len(encode_bpe_word(w, ranks)) for w in words)
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_subwords"] == exp_sub
    # merges compress: subwords strictly fewer than raw chars+EOW
    raw = [sum(len(w) + 1 for w in tok.findall(t)) for t in TEXTS]
    assert (out["n_subwords"] < raw).all()
