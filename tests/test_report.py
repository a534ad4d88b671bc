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


def test_table_profile_hand_counted(ray_session):
    import math

    import ray.data
    from readability_ray.functions import table_profile
    t = pa.table({
        "x": pa.array([1.25, 2.50, None, 4.25], pa.float64()),
        "c": pa.array(["a", "b", "a", None], pa.string())})
    out = table_profile(ray.data.from_arrow(t),
                        numeric_cols={"x": 2},
                        categorical_cols=["c"]).to_pandas()
    d = {(r.col_name, r.stat): r.value for r in out.itertuples()}
    assert d[("*", "rows")] == 4
    assert d[("x", "rows")] == 3 and d[("x", "nulls")] == 1
    assert d[("x", "min")] == 1.25 and d[("x", "max")] == 4.25
    # mean = ((125+250+425)/100)/3 = 8.0/3, floor-6
    assert d[("x", "mean")] == math.floor(8.0 / 3 * 1e6) / 1e6
    assert d[("c", "rows")] == 3 and d[("c", "nulls")] == 1
    assert d[("c", "n_distinct")] == 2
    # ordered output, exactly the expected stat rows
    assert list(out.columns) == ["col_name", "stat", "value"]
    assert out["col_name"].tolist() == sorted(out["col_name"].tolist())


def test_table_profile_distinct_cap(ray_session):
    import pytest
    import ray.data
    from readability_ray.functions import table_profile
    t = pa.table({"c": pa.array([str(i) for i in range(50)])})
    # Ray wraps the worker's ValueError in RayTaskError
    with pytest.raises(Exception, match="max_distinct"):
        table_profile(ray.data.from_arrow(t), numeric_cols={},
                      categorical_cols=["c"],
                      max_distinct=10).to_pandas()


def test_key_skew_stats_hand_counted(ray_session):
    import ray.data
    from readability_ray.functions import key_skew_stats
    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "e": pa.array(["a", "b", "b", "a", "c", None], pa.string())})
    out = key_skew_stats(ray.data.from_arrow(t),
                         ["e", "u"], n_partitions=3).to_pandas()
    assert out["key_col"].tolist() == ["e", "u"]
    e = out.iloc[0]
    # e: a=2, b=2, c=1 (null dropped) -> tie at 2, min key "a"
    assert e["n_keys"] == 3 and e["total"] == 5
    assert e["max_count"] == 2 and e["top_key"] == "a"
    assert e["top_share"] == 0.4
    u = out.iloc[1]
    assert u["n_keys"] == 3 and u["total"] == 6
    assert u["max_count"] == 3 and u["top_key"] == "1"
    assert u["top_share"] == 0.5


def test_dq_check_planted_violations(ray_session):
    """Plant one violation per rule kind and hand-count the report."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import dq_check
    t = pa.table({
        "qty": pa.array([5.0, 60.0, 1.0, np.nan], pa.float64()),
        "flag": pa.array(["A", "N", "X", "A"]),
        "lo_col": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "hi_col": pa.array([2.0, 1.0, 3.0, 5.0], pa.float64()),
        "name": pa.array(["ok", "ok", None, "bad!"]),
    })
    rules = [
        {"rule": "qty_range", "kind": "range", "col": "qty",
         "lo": 1.0, "hi": 50.0},
        {"rule": "flag_domain", "kind": "in_set", "col": "flag",
         "values": ["A", "N"]},
        {"rule": "lo_le_hi", "kind": "col_le", "left": "lo_col",
         "right": "hi_col"},
        {"rule": "name_not_null", "kind": "not_null", "col": "name"},
        {"rule": "name_word", "kind": "regex", "col": "name",
         "pattern": "^[a-z]+$"},
    ]
    out = dq_check(ray.data.from_arrow(t).repartition(3), rules) \
        .to_pandas().set_index("rule")
    assert (out["n_checked"] == 4).all()
    assert out.loc["qty_range", "n_violations"] == 2     # 60, NaN
    assert out.loc["flag_domain", "n_violations"] == 1   # X
    assert out.loc["lo_le_hi", "n_violations"] == 1      # 2>1
    assert out.loc["name_not_null", "n_violations"] == 1
    assert out.loc["name_word", "n_violations"] == 2     # None, bad!
    # rule names sorted, duplicate names rejected
    assert list(out.index) == sorted(out.index)
    try:
        dq_check(ray.data.from_arrow(t), rules + [rules[0]])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
