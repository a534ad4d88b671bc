"""Naive Bayes classifier: hand-checkable separable corpus, priors on
empty docs, tie determinism, external train corpus, vocab cap.
"""

import pyarrow as pa

from readability_ray.functions.nbayes import (
    naive_bayes_classify, train_naive_bayes,
)


def _ds(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string())}))


SEPARABLE = [
    ("the cat sat on the mat", "en"),
    ("the dog ran to the house", "en"),
    ("le chat et le chien", "fr"),
    ("le monde est grand", "fr"),
]


def test_separable_corpus_classified(ray_session):
    out = naive_bayes_classify(_ds(SEPARABLE), vocab_size=100) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["pred_label"]) == ["en", "en", "fr", "fr"]


def test_model_counts(ray_session):
    m = train_naive_bayes(_ds(SEPARABLE), vocab_size=100)
    assert m["priors"] == {"en": 2, "fr": 2}
    assert m["cond"][("en", "the")] == 4
    assert m["cond"][("fr", "le")] == 3
    assert ("fr", "the") not in m["cond"]
    assert m["totals"]["en"] == 12 and m["totals"]["fr"] == 9
    assert m["n_docs"] == 4


def test_empty_doc_gets_max_prior_smallest_label(ray_session):
    # train on the 2-2 corpus; an external empty doc scores prior-only
    # → exact tie → label asc picks "en"
    import ray.data
    target = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array([""], pa.string())}))
    out = naive_bayes_classify(target, _ds(SEPARABLE),
                               vocab_size=100).to_pandas()
    assert out.loc[0, "pred_label"] == "en"


def test_external_train_corpus(ray_session):
    import ray.data
    target = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["the cat", "le chien"], pa.string())}))
    out = naive_bayes_classify(target, _ds(SEPARABLE),
                               vocab_size=100).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["pred_label"]) == ["en", "fr"]


def test_vocab_cap_drops_rare_tokens(ray_session):
    # vocab_size=1 keeps only "the"; docs without "the" score prior-only
    m = train_naive_bayes(_ds(SEPARABLE), vocab_size=1)
    assert m["vocab"] == frozenset({"the"})
    assert set(m["cond"]) == {("en", "the")}
