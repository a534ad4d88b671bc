"""chunk_documents + line_dedup: window arithmetic edges, md5 value
checks, boilerplate-removal semantics, and a value-level DuckDB
differential for line_dedup over the engine's own extracted markdown
(the pages table is engine-generated, so — like dedup_pages_by_url —
the value check lives here rather than in the driver's oracle gate).
"""

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from readability_ray.functions import chunk_documents, line_dedup


def _docs_ds(ray, rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _chunks(ray, rows, **kw):
    df = chunk_documents(_docs_ds(ray, rows), **kw).to_pandas()
    return df.sort_values(["doc_id", "chunk_index"]).reset_index(drop=True)


def test_chunk_window_edges(ray_session):
    ray = ray_session
    toks = [f"t{i}" for i in range(70)]
    rows = [
        (0, ""),                      # zero tokens -> no chunks
        (1, "   \t  "),               # whitespace only -> no chunks
        (2, " ".join(toks[:5])),      # n < window -> 1 short chunk
        (3, " ".join(toks[:64])),     # n == window -> exactly 1
        (4, " ".join(toks[:65])),     # n == window+1 -> 2
        (5, " ".join(toks[:70])),     # 0..63, 48..69
    ]
    df = _chunks(ray, rows, window=64, stride=48)
    assert set(df["doc_id"]) == {2, 3, 4, 5}
    by = {k: g for k, g in df.groupby("doc_id")}
    assert list(by[2]["n_tokens"]) == [5]
    assert list(by[3]["n_tokens"]) == [64]
    assert list(by[4]["begin_token"]) == [0, 48]
    assert list(by[4]["n_tokens"]) == [64, 17]
    assert list(by[5]["begin_token"]) == [0, 48]
    assert list(by[5]["n_tokens"]) == [64, 22]
    # md5 value check against a hand-built join
    want = hashlib.md5(" ".join(toks[48:70]).encode()).hexdigest()
    assert by[5].iloc[1]["chunk_md5"] == want


def test_chunks_cover_document(ray_session):
    toks = [f"w{i}" for i in range(101)]
    df = _chunks(ray_session, [(7, " ".join(toks))], window=32, stride=24)
    covered = set()
    for _, r in df.iterrows():
        covered.update(range(r["begin_token"],
                             r["begin_token"] + r["n_tokens"]))
    assert covered == set(range(101))
    # last chunk reaches the end; no redundant tail
    last = df.iloc[-1]
    assert last["begin_token"] + 32 >= 101
    assert len(df) >= 2 and df.iloc[-2]["begin_token"] + 32 < 101


def test_chunk_include_text(ray_session):
    df = _chunks(ray_session, [(1, "a  b\tc\nd e")],
                 window=3, stride=2, include_text=True)
    assert list(df["chunk_text"]) == ["a b c", "c d e"]
    assert [hashlib.md5(t.encode()).hexdigest() for t in df["chunk_text"]] \
        == list(df["chunk_md5"])


def _md_ds(ray, rows):
    return ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "markdown": pa.array([r[1] for r in rows], pa.string())}))


def test_line_dedup_removes_hot_lines(ray_session):
    footer = "© 2024 Example Site"
    rows = [(f"u{i}", f"# Title {i}\n\nBody paragraph {i}.\n{footer}")
            for i in range(6)]
    rows.append(("u6", "# Unique page\n\nNothing shared here."))
    out = line_dedup(_md_ds(ray_session, rows), max_doc_freq=5) \
        .to_pandas().set_index("url").sort_index()
    assert len(out) == 7
    # footer appears in 6 > 5 docs -> removed everywhere
    for i in range(6):
        got = out.loc[f"u{i}", "clean_text"]
        assert footer not in got
        assert got == f"# Title {i}\n\nBody paragraph {i}."
        assert out.loc[f"u{i}", "n_removed"] == 1
        assert out.loc[f"u{i}", "n_lines"] == 4
    assert out.loc["u6", "n_removed"] == 0


def test_line_dedup_threshold_is_strict_gt(ray_session):
    shared = "shared exactly five times"
    rows = [(f"u{i}", f"{shared}\nbody {i}") for i in range(5)]
    out = line_dedup(_md_ds(ray_session, rows), max_doc_freq=5).to_pandas()
    assert (out["n_removed"] == 0).all()


def test_line_dedup_blank_lines_and_order(ray_session):
    hot = "NAV"
    rows = [(f"u{i}", f"{hot}\n\nalpha {i}\n   \nomega {i}\n{hot}")
            for i in range(3)]
    out = line_dedup(_md_ds(ray_session, rows), max_doc_freq=2) \
        .to_pandas().set_index("url")
    got = out.loc["u1", "clean_text"]
    # blank / whitespace-only lines are formatting, never dropped;
    # original order preserved
    assert got == "\nalpha 1\n   \nomega 1"
    assert out.loc["u1", "n_removed"] == 2
    # duplicate occurrences within one doc count that doc once
    assert out.loc["u1", "n_lines"] == 6


def test_line_dedup_all_boilerplate_doc(ray_session):
    rows = [(f"u{i}", "only boilerplate") for i in range(4)]
    out = line_dedup(_md_ds(ray_session, rows), max_doc_freq=2).to_pandas()
    assert (out["clean_text"] == "").all()
    assert (out["n_removed"] == 1).all()


LINE_DEDUP_SQL = """
WITH ln AS (
    SELECT url,
           unnest(generate_series(
               1, len(string_split(markdown, chr(10))))) AS idx,
           unnest(string_split(markdown, chr(10))) AS line
    FROM md
), keyed AS (
    SELECT url, idx, line,
           trim(line, ' ' || chr(9) || chr(13) || chr(12) || chr(11)) AS s
    FROM ln
), hot AS (
    SELECT s FROM keyed WHERE s <> ''
    GROUP BY s HAVING count(DISTINCT url) > {k}
), marked AS (
    SELECT k.url, k.idx, k.line,
           (k.s <> '' AND h.s IS NOT NULL) AS removed
    FROM keyed k LEFT JOIN hot h ON k.s = h.s
)
SELECT url,
       coalesce(string_agg(line, chr(10) ORDER BY idx)
                FILTER (WHERE NOT removed), '') AS clean_text,
       count(*)::BIGINT AS n_lines,
       sum(CASE WHEN removed THEN 1 ELSE 0 END)::BIGINT AS n_removed
FROM marked GROUP BY url
"""


def test_line_dedup_strategies_identical(ray_session):
    footer = "shared footer line"
    rows = [(f"u{i}", f"body {i}\n{footer}\n\ntail {i}")
            for i in range(8)]
    a = line_dedup(_md_ds(ray_session, rows), max_doc_freq=3,
                   strategy="broadcast").to_pandas() \
        .sort_values("url").reset_index(drop=True)
    b = line_dedup(_md_ds(ray_session, rows), max_doc_freq=3,
                   strategy="colocate").to_pandas() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_removed"] == 1).all()
    with pytest.raises(ValueError):
        line_dedup(_md_ds(ray_session, rows), strategy="nope")


@pytest.mark.parametrize("k,strategy", [(3, "broadcast"),
                                        (5, "broadcast"),
                                        (5, "colocate")])
def test_line_dedup_matches_duckdb_on_extracted_markdown(ray_session, k,
                                                         strategy):
    """Differential against DuckDB over REAL extraction output: 150
    synthetic pages share site footers/navigation across pages — the
    exact boilerplate the operator exists to remove."""
    import ray.data
    from readability_ray.pipelines import extract_pipeline
    from readability_ray.sources.pages import generate_pages

    pages = generate_pages(150, seed=42)
    md = extract_pipeline(ray.data.from_arrow(pages), use_actors=False,
                          batch_size=64) \
        .select_columns(["url", "markdown"]).to_pandas()
    got = line_dedup(ray.data.from_pandas(md), max_doc_freq=k,
                     strategy=strategy) \
        .to_pandas().sort_values("url").reset_index(drop=True)

    con = duckdb.connect()
    con.register("md", md)
    want = con.sql(LINE_DEDUP_SQL.format(k=k)).df() \
        .sort_values("url").reset_index(drop=True)
    # something must actually be removed for the test to mean anything
    assert got["n_removed"].sum() > 0
    pd.testing.assert_frame_equal(
        got[["url", "clean_text", "n_lines", "n_removed"]], want)
