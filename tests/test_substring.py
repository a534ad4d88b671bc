"""substring_dedup: ExactSubstr drop-all semantics at token-gram
granularity — planted duplicate runs, within-doc repeats, long-span
window union, strategy agreement, and a DuckDB value differential
(the same SQL the driver oracle runs, at unit scale).
"""

import duckdb
import pyarrow as pa
import pytest

from readability_ray.functions.substring import (
    _covered_mask, substring_dedup,
)

DUP4 = "alpha beta gamma delta"


def _docs():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([
            f"unique one text here {DUP4} tail one",
            f"prefix two {DUP4} closing words two",
            "totally unique document number three with words",
            "short doc",                     # < k tokens: no grams
            f"{DUP4} {DUP4} inner repeat",   # within-doc repeat
            "",                              # empty
        ]),
    })


def _run(ray_ds, **kw):
    return substring_dedup(ray_ds, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_planted_duplicate_run_removed(ray_session):
    import ray.data
    out = _run(ray.data.from_arrow(_docs()), k=4, min_count=2)
    by_id = out.set_index("doc_id")
    # the shared 4-token run is cut from BOTH docs (drop-all)
    assert by_id.loc[1, "clean_text"] == "unique one text here tail one"
    assert by_id.loc[2, "clean_text"] == "prefix two closing words two"
    assert by_id.loc[1, "n_removed"] == 4 == by_id.loc[2, "n_removed"]
    # unique doc untouched (whitespace-normalized)
    assert by_id.loc[3, "n_removed"] == 0
    assert by_id.loc[3, "clean_text"].startswith("totally unique")
    # < k tokens: passes through
    assert by_id.loc[4, "clean_text"] == "short doc"
    # within-doc repeat counts toward min_count; the union of the two
    # hit windows [0,4) and [4,8) covers all 8 tokens of the run
    assert by_id.loc[5, "clean_text"] == "inner repeat"
    assert by_id.loc[5, "n_removed"] == 8
    # empty doc passes through
    assert by_id.loc[6, "clean_text"] == ""
    assert by_id.loc[6, "n_tokens"] == 0


def test_long_span_union(ray_session):
    """A duplicated run LONGER than k is removed in full: every k-gram
    of the span is duplicated and the covering windows union."""
    import ray.data
    run = " ".join(f"w{j}" for j in range(10))  # 10-token shared span
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([f"head {run} tail", f"other {run} ending"]),
    })
    out = _run(ray.data.from_arrow(docs), k=4, min_count=2)
    assert list(out["n_removed"]) == [10, 10]
    assert list(out["clean_text"]) == ["head tail", "other ending"]


def test_strategies_value_identical(ray_session):
    import ray.data
    a = _run(ray.data.from_arrow(_docs()), k=4, strategy="colocate")
    b = _run(ray.data.from_arrow(_docs()), k=4, strategy="broadcast")
    assert a.equals(b)


def test_duckdb_differential(ray_session):
    """The driver oracle's SQL, run at unit scale on the planted docs
    (k=8 — the driver query's constant)."""
    import ray.data
    import __ray_entry__ as entry
    run8 = " ".join(f"tok{j}" for j in range(8))
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            f"a b c {run8} x y z",
            f"p q {run8} r s",
            "completely different words " + " ".join(
                f"u{j}" for j in range(10)),
        ]),
    })
    out = _run(ray.data.from_arrow(docs), k=8, min_count=2)
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(entry.oracle_sql()["substring_dedup"]
                      + " ORDER BY d.doc_id").df()
    assert out.equals(exp)


def test_covered_mask():
    import numpy as np
    m = _covered_mask(10, np.array([0, 6]), 3)
    assert m.tolist() == [True, True, True, False, False, False,
                          True, True, True, False]
    # window clipped at the end
    m = _covered_mask(4, np.array([2]), 3)
    assert m.tolist() == [False, False, True, True]


def test_bad_args(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs())
    with pytest.raises(ValueError):
        substring_dedup(ds, k=0)
    with pytest.raises(ValueError):
        substring_dedup(ds, min_count=1)
    with pytest.raises(ValueError):
        substring_dedup(ds, strategy="nope")
