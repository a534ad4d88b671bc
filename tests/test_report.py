"""corpus_report: hand-countable corpus, empty corpus, dup counting."""

import pyarrow as pa

from readability_ray.functions.report import corpus_report


def _ds(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string())}))


def test_hand_counted(ray_session):
    rows = [("a b c", "en"), ("a b c", "en"), ("d e", "fr"),
            ("", "en"), ("f", "de")]
    out = corpus_report(_ds(rows)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_docs"] == 5 and r["n_empty"] == 1
    assert r["total_tokens"] == 3 + 3 + 2 + 0 + 1
    assert r["total_chars"] == 5 + 5 + 3 + 0 + 1
    assert r["n_langs"] == 3
    assert r["top_lang"] == "en" and r["top_lang_docs"] == 3
    assert r["distinct_texts"] == 4  # "a b c" duplicated
    assert r["dup_docs"] == 1


def test_top_lang_tie_breaks_asc(ray_session):
    rows = [("x", "fr"), ("y", "en")]
    out = corpus_report(_ds(rows)).to_pandas().iloc[0]
    assert out["top_lang"] == "en"


def test_empty_corpus(ray_session):
    out = corpus_report(_ds([])).to_pandas().iloc[0]
    assert out["n_docs"] == 0 and out["distinct_texts"] == 0
    assert out["top_lang"] == "" and out["n_langs"] == 0
