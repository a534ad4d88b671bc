"""DSIR importance weights: hand-checkable direction (target-like docs
score higher), shared event space, degenerate docs.
"""

import pyarrow as pa

from readability_ray.functions.dsir import dsir_weights


def _ds(texts, ids=None):
    import ray.data
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_target_like_docs_score_higher(ray_session):
    # raw pool mixes two styles; target is pure style A
    style_a = ["the cat sat on the mat", "the dog sat on the rug",
               "the cat ran to the mat"]
    style_b = ["xs qq zz ww vv kk", "qq zz xs ww kk vv"]
    raw = _ds(style_a + style_b)
    target = _ds(style_a)
    out = dsir_weights(raw, target, vocab_size=50,
                       min_bigram_count=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    a_scores = out.loc[:2, "log_ratio"]
    b_scores = out.loc[3:, "log_ratio"]
    assert a_scores.min() > b_scores.max()
    # ratio = target - raw exactly (floor-6 of the difference of the
    # unfloored sums — allow the 1e-6 truncation slack)
    diff = (out["logprob_target"] - out["logprob_raw"]
            - out["log_ratio"]).abs()
    assert (diff <= 2e-6 + 1e-12).all()


def test_shared_vocab_from_raw_pool(ray_session):
    # a token seen ONLY in the target corpus is OOV for both models
    # (vocabulary comes from the raw pool), so it cannot inflate the
    # ratio: doc "zzz zzz" scores ratio ~ln of smoothed-unk terms both
    # sides with equal denominators except unigram counts
    raw = _ds(["a b a b", "a b a b"])
    target = _ds(["zzz zzz a b"])
    out = dsir_weights(raw, target, vocab_size=10,
                       min_bigram_count=1).to_pandas()
    assert len(out) == 2
    assert (out["n_bigrams"] == 3).all()


def test_degenerate_docs(ray_session):
    raw = _ds(["", "one", "a b"])
    out = dsir_weights(raw, _ds(["a b"]), vocab_size=10,
                       min_bigram_count=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_bigrams"]) == [0, 0, 1]
    assert out.loc[0, "log_ratio"] == 0.0
    assert out.loc[1, "log_ratio"] == 0.0
