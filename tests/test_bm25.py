"""BM25 ranked retrieval: hand-computed scores on a tiny corpus,
exact-token semantics, tie-break, partition invariance."""

import math

import numpy as np
import pyarrow as pa


def _docs(texts):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_bm25_hand_computed(ray_session):
    from readability_ray.functions import bm25_topk
    texts = ["cat dog", "cat cat fish", "bird", "catalog dog"]
    ds = _docs(texts)
    out = bm25_topk(ds, query_terms=("cat",), k=10).to_pandas()
    # exact-token: 'catalog' must NOT match 'cat'
    assert set(out["doc_id"]) == {0, 1}
    n, df = 4, 2
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    avgdl = (2 + 3 + 1 + 2) / 4
    k1, b = 1.2, 0.75

    def score(tf, dl):
        return idf * (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = np.floor(score(2, 3) * 1e6) / 1e6   # doc 1: tf=2, dl=3
    exp0 = np.floor(score(1, 2) * 1e6) / 1e6   # doc 0: tf=1, dl=2
    got = out.set_index("doc_id")["score"]
    assert abs(got.loc[1] - exp1) < 1e-12
    assert abs(got.loc[0] - exp0) < 1e-12
    # tf=2 in a slightly longer doc still outscores tf=1
    assert list(out["doc_id"]) == [1, 0]


def test_bm25_multi_term_and_invariance(ray_session):
    import pandas as pd
    from readability_ray.functions import bm25_topk
    texts = ["a b c d", "b c", "c d a", "e f", "a a a b"]
    ds = _docs(texts)
    out = bm25_topk(ds, query_terms=("a", "d"), k=3).to_pandas()
    assert len(out) == 3
    assert (out["score"] > 0).all()
    out2 = bm25_topk(ds.repartition(4),
                     query_terms=("a", "d"), k=3).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_bm25_no_match(ray_session):
    from readability_ray.functions import bm25_topk
    out = bm25_topk(_docs(["x y", "z"]),
                    query_terms=("missing",), k=5).to_pandas()
    assert len(out) == 0
