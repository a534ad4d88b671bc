"""Round-5 sixth-session operators: SCD2 intervals, watermark
late-data accounting, vocabulary coverage, phrase search, k-core
peeling, trimmed mean — brute-force differentials + partition /
strategy invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _events():
    import ray.data
    return ray.data.read_parquet(f"{SF}/events.parquet")


def _docs():
    import ray.data
    return ray.data.read_parquet(f"{SF}/documents.parquet")


# ---------------------------------------------------------------- scd2
def test_scd2_intervals_brute_force(ray_session):
    from readability_ray.functions import scd2_intervals
    got = scd2_intervals(_events()).to_pandas()
    ev = _events().to_pandas()
    ev["tsu"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["user_id", "tsu", "event_id"])
    rows = []
    for uid, g in ev.groupby("user_id"):
        runs = []
        for st, t in zip(g["event_type"], g["tsu"]):
            if runs and runs[-1][0] == st:
                runs[-1][2] += 1
            else:
                runs.append([st, int(t), 1])
        for i, (st, t, n) in enumerate(runs):
            rows.append({
                "user_id": int(uid), "state": st,
                "valid_from_us": t,
                "valid_to_us": runs[i + 1][1]
                if i + 1 < len(runs) else None,
                "n_events": n,
                "is_current": int(i + 1 == len(runs))})
    want = pd.DataFrame(rows)
    got = got.sort_values(["user_id", "valid_from_us"]) \
        .reset_index(drop=True)
    want = want.sort_values(["user_id", "valid_from_us"]) \
        .reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("user_id", "state", "valid_from_us", "n_events",
              "is_current"):
        assert got[c].tolist() == want[c].tolist(), c
    assert [None if pd.isna(v) else int(v)
            for v in got["valid_to_us"]] == \
        [None if pd.isna(v) else int(v)
         for v in want["valid_to_us"]]


def test_scd2_runs_cover_all_events(ray_session):
    from readability_ray.functions import scd2_intervals
    got = scd2_intervals(_events(), n_partitions=3).to_pandas()
    assert int(got["n_events"].sum()) == _events().count()
    # exactly one open interval per user
    cur = got.groupby("user_id")["is_current"].sum()
    assert (cur == 1).all()


def test_scd2_partition_invariant(ray_session):
    from readability_ray.functions import scd2_intervals
    a = scd2_intervals(_events(), n_partitions=2).to_pandas()
    b = scd2_intervals(_events(), n_partitions=7).to_pandas()
    a["valid_to_us"] = a["valid_to_us"].fillna(-1)
    b["valid_to_us"] = b["valid_to_us"].fillna(-1)
    assert _sorted(a).equals(_sorted(b))


# ----------------------------------------------------------- late data
def _late_brute(ev: pd.DataFrame, lateness_min: int) -> pd.DataFrame:
    ev = ev.sort_values("event_id")
    t = ev["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    prev = np.empty(len(t), dtype=np.int64)
    prev[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(t[:-1], out=prev[1:])
    valid = prev > np.iinfo(np.int64).min
    late = valid & (t < np.where(valid, prev, t)
                    - lateness_min * 60_000_000)
    return pd.DataFrame({"event_type": ev["event_type"].to_numpy(),
                         "late": late.astype(np.int64)}) \
        .groupby("event_type", as_index=False) \
        .agg(n_late=("late", "sum"), n_total=("late", "size"))


def test_late_data_brute_force_shuffled_arrivals(ray_session):
    import hashlib
    import struct

    import ray.data
    from readability_ray.functions import events_late_data

    ev = _events().to_pandas()
    # md5-shuffled arrival ids make lateness non-trivial
    ev["event_id"] = [
        ((struct.unpack("<Q", hashlib.md5(
            f"ar:{i}".encode()).digest()[:8])[0] >> 21) << 20)
        | (int(i) & 0xFFFFF) for i in ev["event_id"]]
    got = events_late_data(ray.data.from_pandas(ev),
                           lateness_min=60).to_pandas()
    want = _late_brute(ev, 60)
    assert _sorted(got.astype({"n_late": "int64"})).equals(
        _sorted(want.astype({"n_late": "int64",
                             "n_total": "int64"})))
    assert int(got["n_late"].sum()) > 0  # family actually drops rows


def test_late_data_in_order_stream_never_late(ray_session):
    from readability_ray.functions import events_late_data
    got = events_late_data(_events(), lateness_min=0).to_pandas()
    # the testdata stream arrives in near-ts order with 0 lateness:
    # totals must cover every event either way
    assert int(got["n_total"].sum()) == _events().count()


def test_late_data_partition_invariant(ray_session):
    from readability_ray.functions import events_late_data
    a = events_late_data(_events(), lateness_min=1,
                         n_partitions=2).to_pandas()
    b = events_late_data(_events(), lateness_min=1,
                         n_partitions=9).to_pandas()
    assert _sorted(a).equals(_sorted(b))


# ------------------------------------------------------ vocab coverage
def test_vocab_coverage_brute_force(ray_session):
    import re

    from readability_ray.functions import vocab_coverage
    got = vocab_coverage(_docs(), vocab_size=16).to_pandas()
    docs = _docs().to_pandas()
    tok = re.compile(r"[^ \t\n\r\f\v]+")
    from collections import Counter
    cnt: Counter = Counter()
    for t in docs["text"]:
        cnt.update(tok.findall(t or ""))
    vocab = set(t for t, _ in sorted(
        cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:16])
    rows = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = tok.findall(text or "")
        r = rows.setdefault(lang or "", [0, 0, 0])
        r[0] += 1
        r[1] += len(toks)
        r[2] += sum(1 for x in toks if x not in vocab)
    for _, row in got.iterrows():
        nd, nt, no = rows[row["lang"]]
        assert (int(row["n_docs"]), int(row["n_tokens"]),
                int(row["n_oov"])) == (nd, nt, no)
        assert row["oov_rate"] == np.floor(no / nt * 1e6) / 1e6


# ------------------------------------------------------- phrase search
def test_phrase_search_positions_and_overlap(ray_session):
    import ray.data

    from readability_ray.functions import phrase_search
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a a a b", "x y z", "b a a"], pa.string()),
    }))
    got = phrase_search(docs, ["a a", "x y z", "missing"]) \
        .to_pandas()
    rows = {(int(r["phrase_id"]), int(r["doc_id"])): int(r["n_hits"])
            for _, r in got.iterrows()}
    # overlapping occurrences both counted
    assert rows == {(0, 1): 2, (0, 3): 1, (1, 2): 1}


def test_phrase_search_corpus_hits_own_doc(ray_session):
    import re

    from readability_ray.functions import phrase_search
    tok = re.compile(r"[^ \t\n\r\f\v]+")
    docs = _docs().to_pandas().sort_values("doc_id").head(5)
    phrases, srcs = [], []
    for _, r in docs.iterrows():
        t = tok.findall(r["text"] or "")
        if len(t) >= 6:
            phrases.append(" ".join(t[3:6]))
            srcs.append(int(r["doc_id"]))
    got = phrase_search(_docs(), phrases).to_pandas()
    have = set(zip(got["phrase_id"].astype(int),
                   got["doc_id"].astype(int)))
    for pid, did in enumerate(srcs):
        assert (pid, did) in have  # every phrase hits its source doc


# -------------------------------------------------------------- k-core
def _peel(edges: pd.DataFrame, k: int) -> pd.DataFrame:
    e = edges.copy()
    while True:
        deg = pd.concat([e["a"], e["b"]]).value_counts()
        bad = set(deg[deg < k].index)
        if not bad:
            break
        e = e[~(e["a"].isin(bad) | e["b"].isin(bad))]
    deg = pd.concat([e["a"], e["b"]]).value_counts().sort_index()
    return pd.DataFrame({"node": deg.index.to_numpy(dtype="int64"),
                         "core_deg": deg.to_numpy(dtype="int64")})


def test_k_core_brute_force(ray_session):
    from readability_ray.functions import k_core, synthetic_doc_edges
    edges = synthetic_doc_edges(_docs())
    ep = edges.to_pandas()
    got = _sorted(k_core(edges, k=4).to_pandas())
    want = _sorted(_peel(ep, 4))
    assert got.equals(want)
    assert len(got) > 0 and int(got["core_deg"].min()) >= 4


def test_k_core_colocate_matches_broadcast(ray_session):
    from readability_ray.functions import k_core, synthetic_doc_edges
    a = _sorted(k_core(synthetic_doc_edges(_docs()), k=4,
                       strategy="broadcast").to_pandas())
    b = _sorted(k_core(synthetic_doc_edges(_docs()), k=4,
                       strategy="colocate",
                       n_partitions=3).to_pandas())
    assert a.equals(b)


def test_k_core_everything_survives_k1(ray_session):
    from readability_ray.functions import k_core, synthetic_doc_edges
    edges = synthetic_doc_edges(_docs())
    n_nodes = len(pd.concat([edges.to_pandas()["a"],
                             edges.to_pandas()["b"]]).unique())
    got = k_core(edges, k=1).to_pandas()
    assert len(got) == n_nodes  # deg >= 1 by construction


# -------------------------------------------------------- trimmed mean
def test_trimmed_mean_brute_force(ray_session):
    from readability_ray.functions import trimmed_mean
    got = trimmed_mean(_events(), trim_pct=0.1).to_pandas() \
        .iloc[0]
    ev = _events().to_pandas()
    c = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    order = np.lexsort((ev["event_id"].to_numpy(), c))
    c = c[order]
    lo = int(np.floor(len(c) * 0.1))
    kept = c[lo:len(c) - lo]
    assert int(got["n"]) == len(c)
    assert int(got["kept_n"]) == len(kept)
    want = np.floor(float(kept.sum()) / (100.0 * len(kept))
                    * 1e6) / 1e6
    assert got["trimmed_mean"] == want


def test_trimmed_mean_zero_trim_is_mean(ray_session):
    from readability_ray.functions import trimmed_mean
    got = trimmed_mean(_events(), trim_pct=0.0).to_pandas().iloc[0]
    assert int(got["kept_n"]) == int(got["n"])
    assert int(got["n_trim_each"]) == 0
