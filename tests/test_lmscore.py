"""Bigram-LM quality scoring: hand-computed probabilities on a planted
corpus, vocab pruning determinism, UNK mapping, external train corpus,
and degenerate docs.
"""

import math

import pyarrow as pa
import pytest

from readability_ray.functions.lmscore import (
    lm_quality_scores, train_bigram_lm,
)


def _ds(texts, ids=None):
    import ray.data
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_hand_computed_model(ray_session):
    # corpus: "a b" x3, "a c" x1  → unigram a:4 b:3 c:1
    ds = _ds(["a b", "a b", "a b", "a c"])
    uni, big, v = train_bigram_lm(ds, vocab_size=10, min_bigram_count=1)
    assert uni == {"a": 4, "b": 3, "c": 1} and v == 3
    assert big == {("a", "b"): 3, ("a", "c"): 1}

    out = lm_quality_scores(ds, vocab_size=10, min_bigram_count=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc "a b": ln((3+1)/(4+3+1)) = ln(1/2)
    expected = math.floor(math.log(4 / 8) * 1e6) / 1e6
    assert out.loc[0, "avg_logprob"] == pytest.approx(expected)
    # doc "a c": ln((1+1)/(4+4)) = ln(1/4)
    expected_c = math.floor(math.log(2 / 8) * 1e6) / 1e6
    assert out.loc[3, "avg_logprob"] == pytest.approx(expected_c)
    assert list(out["n_bigrams"]) == [1, 1, 1, 1]
    assert list(out["n_oov"]) == [0, 0, 0, 0]


def test_vocab_pruning_and_unk(ray_session):
    # vocab_size=1 keeps only the most frequent token ("a"); ties
    # between b and c are irrelevant here
    ds = _ds(["a a a b", "a c a"])
    uni, big, v = train_bigram_lm(ds, vocab_size=1, min_bigram_count=1)
    assert set(uni) == {"a"} and v == 1
    # bigrams over UNK-mapped streams: a a, a a, a UNK | a UNK, UNK a
    assert big == {("a", "a"): 2, ("a", ""): 2, ("", "a"): 1}
    out = lm_quality_scores(ds, vocab_size=1, min_bigram_count=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_oov"]) == [1, 1]


def test_vocab_tie_break_deterministic(ray_session):
    # b and z tie on count — token asc keeps b
    ds = _ds(["b z b z a a a"])
    uni, _, _ = train_bigram_lm(ds, vocab_size=2, min_bigram_count=1)
    assert set(uni) == {"a", "b"}


def test_min_bigram_count_prunes(ray_session):
    ds = _ds(["a b a b a c"])
    _, big, _ = train_bigram_lm(ds, vocab_size=10, min_bigram_count=2)
    # "a b" x2 and "b a" x2 survive; "a c" seen once is pruned
    assert big == {("a", "b"): 2, ("b", "a"): 2}


def test_external_train_corpus(ray_session):
    train = _ds(["x y x y x y"])
    target = _ds(["x y", "q q"], ids=[0, 1])
    out = lm_quality_scores(target, train, vocab_size=10,
                            min_bigram_count=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # "x y" is in-model and scores higher than the all-OOV "q q"
    assert out.loc[0, "avg_logprob"] > out.loc[1, "avg_logprob"]
    assert out.loc[1, "n_oov"] == 2


def test_degenerate_docs(ray_session):
    out = lm_quality_scores(_ds(["", "solo", "a b"]),
                            vocab_size=10, min_bigram_count=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_tokens"]) == [0, 1, 2]
    assert list(out["n_bigrams"]) == [0, 0, 1]
    assert out.loc[0, "avg_logprob"] == 0.0
    assert out.loc[1, "avg_logprob"] == 0.0
