"""Count-Min Sketch heavy-hitter estimation — the streaming-sketch
operator a 100 TB token census runs when exact per-token counts are
too wide to exchange (Cormode & Muthukrishnan 2005).

The sketch is a (d × w) int64 counter matrix; token t increments row
i at column ``md5_64(f"{i}:{t}") % w``; its estimate is the MIN over
its d cells.  Estimates never undercount (every cell ≥ the true
count); overcounts come from hash collisions and shrink with w.

Scale shape: the sketch is MERGEABLE BY ADDITION, so each batch emits
its local d×w matrix as ONE row (a flat list column — 32 KB at the
default 4×1024, constant in corpus size) and a single-block merge
sums them: a tree-reduce over constant-size partials, the canonical
sketch topology.  No keyed exchange anywhere; the token text never
leaves the map tasks.

Oracle: md5-derived positions make every cell — collisions included —
re-derivable in DuckDB HUGEINT SQL (the bloom_novelty technique), so
``cms_top_token_counts`` is value-checked end-to-end: exact counts,
sketch estimates, and the estimate ≥ exact overcount invariant.

No reference counterpart (corpus-level operator).
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata

_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")


def _positions(token: str, d: int, w: int) -> list[int]:
    return [struct.unpack(
        "<Q", hashlib.md5(f"{i}:{token}".encode()).digest()[:8])[0] % w
        for i in range(d)]


def cms_sketch(ds: ray.data.Dataset, *, d: int = 4, w: int = 1024,
               text_col: str = "text") -> np.ndarray:
    """Build the corpus token sketch: per-batch local matrices merged
    in one single-block sum.  Returns the (d, w) int64 matrix to the
    caller (constant-size — the one thing a sketch job SHOULD bring
    to the driver)."""

    def partials(batch: pa.Table) -> pa.Table:
        m = np.zeros((d, w), dtype=np.int64)
        for t in batch.column(text_col).to_pylist():
            for tok in _TOKEN_RE.findall(t or ""):
                for i, p in enumerate(_positions(tok, d, w)):
                    m[i, p] += 1
        return pa.table({"cells": pa.array([m.reshape(-1)],
                                           pa.list_(pa.int64()))})

    def merge(batch: pd.DataFrame) -> pa.Table:
        total = np.zeros(d * w, dtype=np.int64)
        for cells in batch["cells"]:
            total += np.asarray(cells, dtype=np.int64)
        return arrow_out(pd.DataFrame({"cells": [total.tolist()]}))

    out = strip_schema_metadata(ds.select_columns([text_col])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None) \
        .take_all()
    return np.asarray(out[0]["cells"], dtype=np.int64).reshape(d, w)


def cms_top_token_counts(ds: ray.data.Dataset, *, k: int = 50,
                         d: int = 4, w: int = 1024,
                         text_col: str = "text") -> ray.data.Dataset:
    """Exact top-k tokens (count desc, token asc) annotated with their
    sketch estimates: (token, exact_n, cms_estimate, overcount).

    The exact side reuses the proven two-level top-k; the sketch side
    is the constant-size tree-reduce above.  ``cms_estimate ≥
    exact_n`` always (CMS never undercounts); both sides re-derive in
    SQL.  Returned as a Dataset for the driver gate."""
    import ray

    from .textstats import token_frequency_topk

    sketch = cms_sketch(ds, d=d, w=w, text_col=text_col)
    exact = token_frequency_topk(ds, k=k, text_col=text_col).to_pandas()
    # token_frequency_topk output: (token, n) ordered
    tok_col = "token" if "token" in exact.columns else exact.columns[0]
    n_col = "n" if "n" in exact.columns else exact.columns[1]
    tokens = exact[tok_col].tolist()
    est = [int(min(sketch[i, p] for i, p in
                   enumerate(_positions(t, d, w)))) for t in tokens]
    out = pa.table({
        "token": pa.array(tokens, pa.string()),
        "exact_n": pa.array([int(x) for x in exact[n_col]], pa.int64()),
        "cms_estimate": pa.array(est, pa.int64()),
        "overcount": pa.array(
            [int(e - int(x)) for e, x in zip(est, exact[n_col])],
            pa.int64()),
    })
    return ray.data.from_arrow(out)


_HLL_M = 64           # registers (modulo-indexed so SQL mirrors it)
_HLL_WBITS = 58       # remaining hash bits after the index divide
# alpha_64 per Flajolet 2007: 0.7213 / (1 + 1.079/m)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def _hll_register_updates(token: str) -> tuple[int, int]:
    h = struct.unpack("<Q",
                      hashlib.md5(token.encode()).digest()[:8])[0]
    idx = h % _HLL_M
    w = h // _HLL_M  # 58 significant bits
    rho = _HLL_WBITS - w.bit_length() + 1  # w==0 → 59
    return idx, rho


def hll_distinct_tokens(ds: ray.data.Dataset, *,
                        text_col: str = "text") -> ray.data.Dataset:
    """HyperLogLog distinct-token estimate beside the exact count
    (Flajolet et al. 2007) — the cardinality sketch a 100 TB vocab
    census uses when count(distinct) is too wide.

    Registers are MERGEABLE BY MAX: each batch emits its 64-register
    vector as ONE constant-size row; a single-block max-merge closes
    the sketch (same topology as the CMS above — no keyed exchange,
    token text never moves).  Integer register arithmetic (md5-LE
    index + exact bit_length rho) re-derives in DuckDB; the float
    estimate (raw harmonic formula + the small-range linear-counting
    branch) is the same IEEE expression both sides, floor-6.

    Output: one row (exact_distinct, hll_estimate, n_registers).
    """
    import math

    def partials(batch: pa.Table) -> pa.Table:
        regs = np.zeros(_HLL_M, dtype=np.int64)
        toks = set()
        for t in batch.column(text_col).to_pylist():
            toks.update(_TOKEN_RE.findall(t or ""))
        for tok in toks:
            idx, rho = _hll_register_updates(tok)
            if rho > regs[idx]:
                regs[idx] = rho
        return pa.table({"regs": pa.array([regs.tolist()],
                                          pa.list_(pa.int64()))})

    def merge(batch: pd.DataFrame) -> pa.Table:
        total = np.zeros(_HLL_M, dtype=np.int64)
        for r in batch["regs"]:
            total = np.maximum(total, np.asarray(r, dtype=np.int64))
        return arrow_out(pd.DataFrame({"regs": [total.tolist()]}))

    rows = strip_schema_metadata(ds.select_columns([text_col])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None) \
        .take_all()
    regs = np.asarray(rows[0]["regs"], dtype=np.int64)

    est = _HLL_ALPHA * _HLL_M * _HLL_M / float(
        sum(2.0 ** -int(r) for r in regs))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _HLL_M and zeros > 0:
        est = _HLL_M * math.log(_HLL_M / zeros)
    est6 = math.floor(est * 1e6) / 1e6

    # exact side: distinct tokens via the vocab-keyed partial shape
    def tok_partials(batch: pa.Table) -> pa.Table:
        toks = set()
        for t in batch.column(text_col).to_pylist():
            toks.update(_TOKEN_RE.findall(t or ""))
        return pa.table({"token": pa.array(sorted(toks), pa.string())})

    def count_distinct(batch: pd.DataFrame) -> pa.Table:
        n = batch["token"].nunique() if len(batch) else 0
        return arrow_out(pd.DataFrame({"n": [int(n)]}))

    import ray

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    k = default_partitions()
    parts = strip_schema_metadata(ds.select_columns([text_col])) \
        .map_batches(tok_partials, batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["token"]) \
        .map_batches(count_distinct, batch_format="pandas",
                     batch_size=None) \
        .take_all()
    exact = sum(r["n"] for r in parts)

    return ray.data.from_arrow(pa.table({
        "exact_distinct": pa.array([exact], pa.int64()),
        "hll_estimate": pa.array([est6], pa.float64()),
        "n_registers": pa.array([_HLL_M], pa.int64()),
    }))


def hll_distinct_by_group(ds: ray.data.Dataset, *,
                          group_col: str = "lang",
                          text_col: str = "text",
                          strategy: str = "single_block",
                          n_partitions: int | None = None
                          ) -> ray.data.Dataset:
    """GROUPED HyperLogLog: per-group distinct-token estimates beside
    the exact counts — the per-language vocab census shape (one
    register vector per group, constant-size × |groups|).

    Scale shape: register rows are (group, 64 ints) — mergeable by
    per-group element-wise MAX, so each batch emits one row per group
    it saw and the bounded-group single-block merge closes every
    sketch (groups here are languages: ≤ tens).  The exact side
    ships distinct (group, token) pairs per batch through ONE
    token-keyed exchange (the hll_distinct_tokens shape, group
    carried along) and re-enters the same merge via the union idiom —
    no Acero join, the final block sees |groups| register rows +
    |partitions|×|groups| count partials.

    ``strategy="single_block"`` (default) merges every group's rows
    in one block — right when groups are bounded (languages).
    ``strategy="colocate"`` is the UNBOUNDED-group scale path
    (per-host vocab at crawl scale): one group-keyed exchange
    co-locates each group's register rows + count partials and the
    same merge runs per partition — no single block ever sees more
    than its groups.

    Output: (group, exact_distinct, hll_estimate) per group, the
    estimate floor-6 with the linear-counting small-range branch.
    """
    import math

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    k = default_partitions()

    def reg_partials(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        per_group: dict[str, set] = {}
        for g, t in zip(groups, texts):
            per_group.setdefault(g, set()).update(
                _TOKEN_RE.findall(t or ""))
        out_g, out_r = [], []
        for g, toks in per_group.items():
            regs = np.zeros(_HLL_M, dtype=np.int64)
            for tok in toks:
                idx, rho = _hll_register_updates(tok)
                if rho > regs[idx]:
                    regs[idx] = rho
            out_g.append(g)
            out_r.append(regs.tolist())
        return pa.table({
            "group": pa.array(out_g, pa.string()),
            "regs": pa.array(out_r, pa.list_(pa.int64())),
            "n": pa.array([0] * len(out_g), pa.int64()),
            "_side": pa.array(["r"] * len(out_g), pa.string())})

    def pair_partials(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        pairs = set()
        for g, t in zip(groups, texts):
            for tok in _TOKEN_RE.findall(t or ""):
                pairs.add((g, tok))
        gs, ts = (list(x) for x in zip(*sorted(pairs))) \
            if pairs else ([], [])
        return pa.table({"group": pa.array(gs, pa.string()),
                         "token": pa.array(ts, pa.string())})

    def count_partials(batch: pd.DataFrame) -> pa.Table:
        # typed empty (a pandas object column would infer arrow NULL
        # type for regs and break the union's schema unify)
        empty = pa.table({
            "group": pa.array([], pa.string()),
            "regs": pa.array([], pa.list_(pa.int64())),
            "n": pa.array([], pa.int64()),
            "_side": pa.array([], pa.string())})
        if len(batch) == 0 or "token" not in batch.columns:
            return empty
        g = batch.drop_duplicates() \
            .groupby("group", sort=False).size().reset_index(name="n")
        return arrow_out(pd.DataFrame({
            "group": g["group"],
            "regs": pd.Series([[0] * _HLL_M] * len(g), dtype="object"),
            "n": g["n"].astype("int64"),
            "_side": pd.Series(["e"] * len(g), dtype="object")}))

    reg_side = strip_schema_metadata(
        ds.select_columns([group_col, text_col])) \
        .map_batches(reg_partials, batch_format="pyarrow")
    exact_side = strip_schema_metadata(
        ds.select_columns([group_col, text_col])) \
        .map_batches(pair_partials, batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["token"]) \
        .map_batches(count_partials, batch_format="pandas",
                     batch_size=None)
    ensure_hash_shuffle(exact_side)

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "group" not in batch.columns:
            return pa.table({
                "group": pa.array([], pa.string()),
                "exact_distinct": pa.array([], pa.int64()),
                "hll_estimate": pa.array([], pa.float64())})
        out = []
        for g in sorted(batch["group"].unique()):
            b = batch[batch["group"] == g]
            regs = np.zeros(_HLL_M, dtype=np.int64)
            for r in b.loc[b["_side"] == "r", "regs"]:
                regs = np.maximum(regs, np.asarray(r, dtype=np.int64))
            est = _HLL_ALPHA * _HLL_M * _HLL_M / float(
                sum(2.0 ** -int(r) for r in regs))
            zeros = int((regs == 0).sum())
            if est <= 2.5 * _HLL_M and zeros > 0:
                est = _HLL_M * math.log(_HLL_M / zeros)
            out.append((g, int(b.loc[b["_side"] == "e", "n"].sum()),
                        math.floor(est * 1e6) / 1e6))
        return pa.table({
            "group": pa.array([o[0] for o in out], pa.string()),
            "exact_distinct": pa.array([o[1] for o in out],
                                       pa.int64()),
            "hll_estimate": pa.array([o[2] for o in out],
                                     pa.float64())})

    if strategy == "single_block":
        return reg_side.union(exact_side) \
            .repartition(1) \
            .map_batches(merge, batch_format="pandas",
                         batch_size=None)
    if strategy != "colocate":
        raise ValueError(f"unknown strategy {strategy!r}")
    ensure_hash_shuffle(reg_side)
    kk = n_partitions or default_partitions()
    return reg_side.union(exact_side) \
        .repartition(num_blocks=kk, keys=["group"]) \
        .map_batches(merge, batch_format="pandas", batch_size=None)
