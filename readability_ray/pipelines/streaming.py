"""Incremental (streaming) sessionization — the CARRIED-STATE window
operator: events arrive in time-ordered micro-batches and per-user
session state (last event time, open-session length, totals) is
folded forward between rounds, producing exactly the batch
``events_sessionize`` answer without ever holding more than one
micro-batch + the state table.

This is the "streaming window with state" custom operator the engine
brief names: Ray Data has no native carried-state stream, so the state
lives as a user-keyed DATASET folded once per round — per round the
plan is ``state.union(chunk)`` → ONE keyed exchange on user →
a vectorized per-partition fold → the new state (MATERIALIZED per
round, the iterative-op rule: an accreting lazy plan of per-round
exchanges deadlocks small boxes).  Only (user, ts) event rows and the
constant-width state rows ever move.

Correctness: the fold is exact — a session spanning a chunk boundary
continues (first in-chunk session merges into the open one when the
boundary gap ≤ threshold), so the final state projects to the
bit-identical ``events_sessionize`` output at ANY chunking, which is
what the differential test and the shared SQL oracle pin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.util import arrow_out, strip_schema_metadata

_STATE_COLS = ("user_id", "last_ts", "cur_len", "n_sessions",
               "longest", "n_events")


def _empty_state() -> pa.Table:
    return pa.table({
        "user_id": pa.array([], pa.int64()),
        "last_ts": pa.array([], pa.int64()),
        "cur_len": pa.array([], pa.int64()),
        "n_sessions": pa.array([], pa.int64()),
        "longest": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "_side": pa.array([], pa.string()),
    })


def sessionize_incremental(events: ray.data.Dataset, *,
                           gap_minutes: int = 30,
                           n_chunks: int = 4,
                           n_partitions: int | None = None
                           ) -> ray.data.Dataset:
    """Fold time-ordered chunks through carried per-user state;
    returns (user_id, n_events, n_sessions, longest_session_events)
    equal to ``events_sessionize`` at any ``n_chunks``."""
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(events)
    k = n_partitions or default_partitions()
    gap_us = gap_minutes * 60 * 1_000_000

    slim = strip_schema_metadata(
        events.select_columns(["user_id", "ts"]))

    # -- chunk boundaries: one bounded (min, max) pull ---------------
    def ts_bounds(batch: pd.DataFrame) -> pa.Table:
        t = batch["ts"].to_numpy(dtype="datetime64[us]") \
            .astype(np.int64)
        return arrow_out(pd.DataFrame({
            "lo": pd.Series([int(t.min())], dtype="int64"),
            "hi": pd.Series([int(t.max())], dtype="int64")}))

    bounds = slim.map_batches(ts_bounds,
                              batch_format="pandas").take_all()
    lo = min(int(r["lo"]) for r in bounds)
    hi = max(int(r["hi"]) for r in bounds)
    cuts = np.linspace(lo, hi + 1, n_chunks + 1).astype(np.int64)

    def fold(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "user_id" not in batch.columns:
            return _empty_state()
        st = batch.loc[batch["_side"] == "s",
                       list(_STATE_COLS)].set_index("user_id")
        ev = batch[batch["_side"] == "e"]
        if len(ev) == 0:
            agg = pd.DataFrame()
        else:
            b = ev.sort_values(["user_id", "last_ts"], kind="stable")
            users = b["user_id"].to_numpy(dtype=np.int64)
            ts = b["last_ts"].to_numpy(dtype=np.int64)
            user_change = np.empty(len(users), dtype=bool)
            user_change[0] = True
            user_change[1:] = users[1:] != users[:-1]
            gap_break = np.empty(len(ts), dtype=bool)
            gap_break[0] = True
            gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
            new_s = user_change | gap_break
            sid = np.cumsum(new_s) - 1
            lens = np.bincount(sid)
            # per in-chunk session (user, len) in time order — fully
            # vectorized per-user reduction, no Python loop over users
            frame = pd.DataFrame({"u": users[new_s], "ln": lens})
            rank = frame.groupby("u").cumcount()
            g = frame.groupby("u", sort=True)["ln"]
            agg = pd.DataFrame({
                "k_sessions": g.size(), "first_len": g.first(),
                "last_len": g.last()})
            agg["max_rest"] = frame[rank > 0].groupby("u")["ln"] \
                .max().reindex(agg.index, fill_value=0)
            eg = pd.Series(ts).groupby(users)
            agg["first_ts"] = eg.min()
            agg["last_ts_new"] = eg.max()
            agg["ne_chunk"] = eg.size()
        if len(agg) == 0 and len(st) == 0:
            return _empty_state()
        if len(agg) == 0:
            merged = st.copy()
        elif len(st) == 0:
            merged = agg.copy()
            for c in _STATE_COLS[1:]:
                merged[c] = np.nan
        else:
            merged = agg.join(st, how="outer")
        he_s = merged["k_sessions"].notna() \
            if "k_sessions" in merged.columns \
            else pd.Series(False, index=merged.index)
        hs_s = merged["last_ts"].notna() \
            if "last_ts" in merged.columns \
            else pd.Series(False, index=merged.index)
        has_ev, has_st = he_s, hs_s
        f = merged.fillna(0)
        ks = f.get("k_sessions", 0).to_numpy(dtype=np.int64) \
            if "k_sessions" in f else np.zeros(len(f), np.int64)
        fl = f.get("first_len", 0).to_numpy(dtype=np.int64) \
            if "first_len" in f else np.zeros(len(f), np.int64)
        ll = f.get("last_len", 0).to_numpy(dtype=np.int64) \
            if "last_len" in f else np.zeros(len(f), np.int64)
        mr = f.get("max_rest", 0).to_numpy(dtype=np.int64) \
            if "max_rest" in f else np.zeros(len(f), np.int64)
        fts = f.get("first_ts", 0).to_numpy(dtype=np.int64) \
            if "first_ts" in f else np.zeros(len(f), np.int64)
        ltn = f.get("last_ts_new", 0).to_numpy(dtype=np.int64) \
            if "last_ts_new" in f else np.zeros(len(f), np.int64)
        nec = f.get("ne_chunk", 0).to_numpy(dtype=np.int64) \
            if "ne_chunk" in f else np.zeros(len(f), np.int64)
        plt = f["last_ts"].to_numpy(dtype=np.int64)
        pcl = f["cur_len"].to_numpy(dtype=np.int64)
        pns = f["n_sessions"].to_numpy(dtype=np.int64)
        plg = f["longest"].to_numpy(dtype=np.int64)
        pne = f["n_events"].to_numpy(dtype=np.int64)
        he = has_ev.to_numpy()
        hs = has_st.to_numpy()
        cont = he & hs & ((fts - plt) <= gap_us)
        first_adj = fl + np.where(cont, pcl, 0)
        ns_new = np.where(he, pns + ks - cont.astype(np.int64), pns)
        cur_new = np.where(~he, pcl,
                           np.where(cont & (ks == 1), first_adj, ll))
        longest_new = np.maximum.reduce([
            plg, np.where(he, first_adj, 0), np.where(he, mr, 0),
            np.where(he & (ks > 1), ll, 0)])
        last_ts_new = np.where(he, ltn, plt)
        ne_new = pne + nec
        uids = merged.index.to_numpy(dtype=np.int64)
        return pa.table({
            "user_id": pa.array(uids),
            "last_ts": pa.array(last_ts_new),
            "cur_len": pa.array(cur_new),
            "n_sessions": pa.array(ns_new),
            "longest": pa.array(longest_new),
            "n_events": pa.array(ne_new),
            "_side": pa.array(["s"] * len(uids), pa.string()),
        })

    state_ds: ray.data.Dataset | None = None
    for i in range(n_chunks):
        c_lo, c_hi = int(cuts[i]), int(cuts[i + 1])
        last = i == n_chunks - 1

        def chunk_rows(batch: pd.DataFrame, *, c_lo=c_lo, c_hi=c_hi,
                       last=last) -> pa.Table:
            t = batch["ts"].to_numpy(dtype="datetime64[us]") \
                .astype(np.int64)
            m = (t >= c_lo) & ((t <= c_hi) if last else (t < c_hi))
            b = batch[m]
            n = len(b)
            return pa.table({
                "user_id": pa.array(
                    b["user_id"].to_numpy(dtype=np.int64)),
                "last_ts": pa.array(t[m]),
                "cur_len": pa.array(np.zeros(n, np.int64)),
                "n_sessions": pa.array(np.zeros(n, np.int64)),
                "longest": pa.array(np.zeros(n, np.int64)),
                "n_events": pa.array(np.zeros(n, np.int64)),
                "_side": pa.array(["e"] * n, pa.string()),
            })

        chunk = slim.map_batches(chunk_rows, batch_format="pandas")
        plan = chunk if state_ds is None else state_ds.union(chunk)
        ensure_hash_shuffle(plan)
        state_ds = plan.repartition(num_blocks=k, keys=["user_id"]) \
            .map_batches(fold, batch_format="pandas",
                         batch_size=None) \
            .materialize()

    def project(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "user_id" not in batch.columns:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "longest_session_events": pa.array([], pa.int64())})
        # the open session competes for longest exactly as the batch
        # operator counts its final session
        longest = np.maximum(batch["longest"].to_numpy(dtype=np.int64),
                             batch["cur_len"].to_numpy(dtype=np.int64))
        return pa.table({
            "user_id": pa.array(
                batch["user_id"].to_numpy(dtype=np.int64)),
            "n_events": pa.array(
                batch["n_events"].to_numpy(dtype=np.int64)),
            "n_sessions": pa.array(
                batch["n_sessions"].to_numpy(dtype=np.int64)),
            "longest_session_events": pa.array(longest)})

    assert state_ds is not None
    return state_ds.map_batches(project, batch_format="pandas")
