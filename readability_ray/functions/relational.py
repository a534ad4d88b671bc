"""Relational analytics over the TPC-H-style tables.

The engine's general-purpose analytics shapes, demonstrated on the
driver's ``lineitem`` / ``orders`` / ``customer`` tables with exact SQL
oracles:

- ``pricing_summary``  (TPC-H Q1 shape): filter → tiny-key aggregate.
- ``segment_top_orders`` (TPC-H Q3 shape): two hash joins → keyed
  aggregate → global top-N.

Money math is FIXED-POINT INTEGER (cents / basis-point products), not
float: distributed partial sums re-associate additions, and float
addition is not associative — integer cents make every sum exact and
order-independent, so the Ray and DuckDB numbers are hash-identical
with no floor-6 smoothing on the aggregates themselves.

Scale shapes: Q1's partial aggregation happens INSIDE map_batches
(≤ |returnflag|×|linestatus| rows per batch leave the map); the merge
is a single tiny block — no hash shuffle, no Dataset-level
HashAggregate (whose lingering aggregator actors starve later shuffle
queries in the same session — BASELINE.md round-3 finding).  Q3 keeps
ids+cents on the exchanges: both joins are hash joins on integer keys,
and the revenue rollup is the keyed-repartition + per-partition pandas
shape with a two-level top-N (partition-local head, single-block
merge).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata

Q1_CUTOFF = np.datetime64("2000-09-02", "us")
Q3_CUTOFF = np.datetime64("1998-03-15", "us")


def _cents(col: pd.Series) -> np.ndarray:
    # 2-decimal money → exact integer cents (np.rint: values are within
    # 1e-6 of integral after ×100, so ties-to-even never fires)
    return np.rint(col.to_numpy() * 100).astype(np.int64)


def pricing_summary(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H Q1 shape: shipped-before filter, per-flag/status pricing
    rollup.  sum_qty / counts are int64; money sums are integer cents
    (``sum_base_price_cents``) and cent×(100−disc) fixed point
    (``sum_disc_price_c4``, 10^-4 dollar units); averages are floor-6
    doubles derived from the exact integer sums."""

    def partials(batch: pd.DataFrame) -> pa.Table:
        m = batch["l_shipdate"].to_numpy(dtype="datetime64[us]") <= Q1_CUTOFF
        b = batch[m]
        if len(b) == 0:
            return arrow_out(pd.DataFrame({
                "l_returnflag": pd.Series([], dtype="object"),
                "l_linestatus": pd.Series([], dtype="object"),
                "sum_qty": pd.Series([], dtype="int64"),
                "sum_base_price_cents": pd.Series([], dtype="int64"),
                "sum_disc_price_c4": pd.Series([], dtype="int64"),
                "count_order": pd.Series([], dtype="int64"),
            }))
        price_c = _cents(b["l_extendedprice"])
        disc_bp = np.rint(b["l_discount"].to_numpy() * 100).astype(np.int64)
        frame = pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_numpy(),
            "l_linestatus": b["l_linestatus"].to_numpy(),
            "sum_qty": b["l_quantity"].to_numpy().astype(np.int64),
            "sum_base_price_cents": price_c,
            "sum_disc_price_c4": price_c * (100 - disc_bp),
            "count_order": np.ones(len(b), dtype=np.int64),
        })
        return arrow_out(frame.groupby(
            ["l_returnflag", "l_linestatus"], as_index=False,
            sort=False).sum())

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return arrow_out(pd.DataFrame({
                "l_returnflag": pd.Series([], dtype="object"),
                "l_linestatus": pd.Series([], dtype="object"),
                "sum_qty": pd.Series([], dtype="int64"),
                "sum_base_price_cents": pd.Series([], dtype="int64"),
                "sum_disc_price_c4": pd.Series([], dtype="int64"),
                "count_order": pd.Series([], dtype="int64"),
                "avg_qty": pd.Series([], dtype="float64"),
                "avg_price_cents": pd.Series([], dtype="float64"),
            }))
        g = batch.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False, sort=True).sum()
        cnt = g["count_order"].to_numpy().astype(np.float64)
        g["avg_qty"] = np.floor(
            g["sum_qty"].to_numpy() / cnt * 1e6) / 1e6
        g["avg_price_cents"] = np.floor(
            g["sum_base_price_cents"].to_numpy() / cnt * 1e6) / 1e6
        return arrow_out(g)

    # partials are ≤ groups-per-batch rows — one merge block suffices;
    # no hash shuffle at any scale
    return lineitem.map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def region_nation_revenue(customer: ray.data.Dataset,
                          orders: ray.data.Dataset,
                          lineitem: ray.data.Dataset,
                          supplier: ray.data.Dataset,
                          nation: ray.data.Dataset,
                          region: ray.data.Dataset, *,
                          region_name: str = "ASIA",
                          date_lo: str = "1996-01-01",
                          date_hi: str = "1997-01-01",
                          n_partitions: int | None = None
                          ) -> ray.data.Dataset:
    """TPC-H Q5 shape: per-nation revenue where customer and supplier
    share a nation inside one region, over an order-date window — the
    star-schema pattern where the DIMENSION tables are broadcast, not
    shuffled.

    nation ⋈ region (25 × 5 rows) and the region's supplier→nation map
    (~|suppliers|/|regions| entries) are collected once on the driver
    and shipped via ``ray.put`` — read by every map task from the
    local object store, never re-shipped per batch and never part of
    an exchange.  Only the two FACT-side joins (orders ⋈ customer on
    custkey, lineitem ⋈ that on orderkey) move data, ids+cents only.
    The final rollup is ≤|nations| partial rows per batch merged in
    one tiny block."""
    import ray as _ray

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(customer)
    k = n_partitions or default_partitions()
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    # dimension broadcast: driver materializes only dim-table rows
    region_keys = {r["r_regionkey"] for r in region.take_all()
                   if r["r_name"] == region_name}
    nr = {row["n_nationkey"]: row["n_name"]
          for row in nation.take_all()
          if row["n_regionkey"] in region_keys}
    supp_nation = {row["s_suppkey"]: row["s_nationkey"]
                   for row in supplier.take_all()
                   if row["s_nationkey"] in nr}
    dims_ref = _ray.put((nr, supp_nation))
    _memo: dict = {}

    def line_partials(batch: pd.DataFrame) -> pa.Table:
        # suppkey → nationkey as a dense numpy lookup table, built once
        # per worker (suppkeys are small contiguous ints); the round-3
        # verdict flagged the per-row dict .get() loop here (#5)
        lut = _memo.get("lut")
        if lut is None:
            _, s_map = _ray.get(dims_ref)
            size = (max(s_map) + 1) if s_map else 1
            lut = np.full(size, -1, dtype=np.int64)
            if s_map:
                lut[np.fromiter(s_map, dtype=np.int64,
                                count=len(s_map))] = \
                    np.fromiter(s_map.values(), dtype=np.int64,
                                count=len(s_map))
            _memo["lut"] = lut
        sk = batch["l_suppkey"].to_numpy().astype(np.int64)
        in_range = (sk >= 0) & (sk < len(lut))
        s_nk = np.where(in_range,
                        lut[np.clip(sk, 0, len(lut) - 1)], -1)
        m = s_nk >= 0
        b = batch[m]
        if len(b) == 0:
            return arrow_out(pd.DataFrame({
                "l_orderkey": pd.Series([], dtype="int64"),
                "s_nationkey": pd.Series([], dtype="int64"),
                "revenue_c4": pd.Series([], dtype="int64")}))
        price_c = _cents(b["l_extendedprice"])
        disc_bp = np.rint(b["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        frame = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(),
            "s_nationkey": s_nk[m],
            "revenue_c4": price_c * (100 - disc_bp),
        })
        return arrow_out(frame.groupby(
            ["l_orderkey", "s_nationkey"], as_index=False,
            sort=False).sum())

    def ord_window(batch: pd.DataFrame) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(dtype="datetime64[us]")
        return arrow_out(batch[(d >= lo) & (d < hi)]
                         [["o_orderkey", "o_custkey"]]
                         .reset_index(drop=True))

    cust = strip_schema_metadata(
        customer.select_columns(["c_custkey", "c_nationkey"]))
    ords = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_custkey",
                               "o_orderdate"])) \
        .map_batches(ord_window, batch_format="pandas")
    line = strip_schema_metadata(lineitem).map_batches(
        line_partials, batch_format="pandas")

    ord_cust = ords.join(cust, "inner", num_partitions=k,
                         on=("o_custkey",), right_on=("c_custkey",)) \
        .repartition(max(2, k // 8))  # scrub schema-less empties
    joined = line.join(ord_cust, "inner", num_partitions=k,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def nation_partials(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "n_name": pd.Series([], dtype="object"),
            "revenue_c4": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "s_nationkey" not in batch.columns:
            return arrow_out(empty)
        dims = _memo.get("d")
        if dims is None:
            dims = _memo["d"] = _ray.get(dims_ref)
        n_map, _ = dims
        b = batch[batch["s_nationkey"].to_numpy()
                  == batch["c_nationkey"].to_numpy()]
        if len(b) == 0:
            return arrow_out(empty)
        frame = pd.DataFrame({
            "n_name": [n_map[int(nk)] for nk in b["s_nationkey"]],
            "revenue_c4": b["revenue_c4"].to_numpy(),
        })
        return arrow_out(frame.groupby("n_name", as_index=False,
                                       sort=False).sum())

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return arrow_out(pd.DataFrame({
                "n_name": pd.Series([], dtype="object"),
                "revenue_c4": pd.Series([], dtype="int64")}))
        return arrow_out(batch.groupby("n_name", as_index=False,
                                       sort=True).sum())

    return joined.map_batches(nation_partials, batch_format="pandas",
                              batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def segment_top_orders(customer: ray.data.Dataset,
                       orders: ray.data.Dataset,
                       lineitem: ray.data.Dataset, *,
                       segment: str = "BUILDING", n: int = 10,
                       n_partitions: int | None = None
                       ) -> ray.data.Dataset:
    """TPC-H Q3 shape: unshipped-revenue top-N for one market segment.
    customer(segment) ⋈ orders(before cutoff) ⋈ lineitem(after cutoff),
    revenue summed per order in exact c4 fixed point, global top-N by
    (revenue desc, orderkey asc).

    Both joins move ids+cents only (columns pruned before the
    exchange); the rollup is keyed-repartition + per-partition pandas;
    top-N is two-level (partition-local head, then one tiny merge
    block)."""
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(customer)
    k = n_partitions or default_partitions()

    cust = strip_schema_metadata(
        customer.filter(expr=f"c_mktsegment == '{segment}'")
        .select_columns(["c_custkey"]))

    def ord_filter(batch: pd.DataFrame) -> pa.Table:
        m = batch["o_orderdate"].to_numpy(
            dtype="datetime64[us]") < Q3_CUTOFF
        return arrow_out(batch[m].reset_index(drop=True))

    ords = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_custkey",
                               "o_orderdate"])) \
        .map_batches(ord_filter, batch_format="pandas")

    def line_partials(batch: pd.DataFrame) -> pa.Table:
        m = batch["l_shipdate"].to_numpy(dtype="datetime64[us]") > Q3_CUTOFF
        b = batch[m]
        if len(b) == 0:
            return arrow_out(pd.DataFrame({
                "l_orderkey": pd.Series([], dtype="int64"),
                "revenue_c4": pd.Series([], dtype="int64")}))
        price_c = _cents(b["l_extendedprice"])
        disc_bp = np.rint(b["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        frame = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(),
            "revenue_c4": price_c * (100 - disc_bp),
        })
        # pre-aggregate per order inside the batch before any exchange
        return arrow_out(frame.groupby("l_orderkey",
                                       as_index=False, sort=False).sum())

    line = strip_schema_metadata(lineitem).map_batches(
        line_partials, batch_format="pandas")

    seg_orders = ords.join(cust, "inner", num_partitions=k,
                           on=("o_custkey",), right_on=("c_custkey",)) \
        .repartition(max(2, k // 8))  # scrub schema-less empties pre-join
    joined = line.join(seg_orders, "inner", num_partitions=k,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def rollup(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "l_orderkey" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "o_orderkey": pd.Series([], dtype="int64"),
                "revenue_c4": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([],
                                         dtype="datetime64[us]")}))
        g = batch.groupby(["l_orderkey", "o_orderdate"],
                          as_index=False, sort=False)["revenue_c4"] \
            .sum()
        g = g.rename(columns={"l_orderkey": "o_orderkey"})
        top = g.sort_values(["revenue_c4", "o_orderkey"],
                            ascending=[False, True]).head(n)
        return arrow_out(top[["o_orderkey", "revenue_c4",
                              "o_orderdate"]].reset_index(drop=True))

    def topn_merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "o_orderkey" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "o_orderkey": pd.Series([], dtype="int64"),
                "revenue_c4": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([],
                                         dtype="datetime64[us]")}))
        # per-order sums are already final (the join co-located each
        # order); the merge only re-heads the partition candidates
        top = batch.sort_values(["revenue_c4", "o_orderkey"],
                                ascending=[False, True]).head(n)
        return arrow_out(top.reset_index(drop=True))

    # joined is already partitioned by l_orderkey (join key), so each
    # order's rows are co-located: per-partition rollup is exact and a
    # partition-local head(n) is a valid candidate set for the merge
    local = joined.map_batches(rollup, batch_format="pandas",
                               batch_size=None)
    return local.repartition(1).map_batches(topn_merge,
                                            batch_format="pandas",
                                            batch_size=None)


def forecast_revenue(lineitem: ray.data.Dataset, *,
                     date_lo: str = "1996-01-01",
                     date_hi: str = "1997-01-01",
                     disc_lo_bp: int = 5, disc_hi_bp: int = 7,
                     qty_below: int = 24) -> ray.data.Dataset:
    """TPC-H Q6 shape: the what-if revenue scan — a pure filter→sum
    with NO shuffle at all (per-batch scalar partials, one tiny merge
    block).  Revenue = Σ extendedprice × discount in exact c4 fixed
    point (cents × basis points, 10^-4 dollar units); the discount
    band compares integer basis points so float representation never
    decides membership.  Output: one row (revenue_c4, n_lines)."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def partials(batch: pd.DataFrame) -> pa.Table:
        d = batch["l_shipdate"].to_numpy(dtype="datetime64[us]")
        disc_bp = np.rint(batch["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        m = ((d >= lo) & (d < hi)
             & (disc_bp >= disc_lo_bp) & (disc_bp <= disc_hi_bp)
             & (batch["l_quantity"].to_numpy() < qty_below))
        b = batch[m]
        rev = int((_cents(b["l_extendedprice"])
                   * disc_bp[m]).sum()) if len(b) else 0
        return arrow_out(pd.DataFrame({
            "revenue_c4": pd.Series([rev], dtype="int64"),
            "n_lines": pd.Series([len(b)], dtype="int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(pd.DataFrame({
            "revenue_c4": pd.Series([int(batch["revenue_c4"].sum())],
                                    dtype="int64"),
            "n_lines": pd.Series([int(batch["n_lines"].sum())],
                                 dtype="int64")}))

    return strip_schema_metadata(
        lineitem.select_columns(["l_shipdate", "l_discount",
                                 "l_quantity", "l_extendedprice"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def priority_line_counts(orders: ray.data.Dataset,
                         lineitem: ray.data.Dataset, *,
                         date_lo: str = "1996-01-01",
                         date_hi: str = "1997-01-01",
                         n_partitions: int | None = None
                         ) -> ray.data.Dataset:
    """TPC-H Q12 shape (adapted to this schema: no shipmode/commit
    dates in the driver's lineitem): per-returnflag counts of lines on
    critical-priority orders vs the rest, over a shipdate window.
    orders ⋈ lineitem is ONE integer-key hash join moving (orderkey,
    is-critical) against (orderkey, returnflag) — ids+flags only; the
    rollup key is bounded (|returnflags|), so partials merge in a
    single block (the pricing_summary rule: bounded-cardinality merges
    never pay a keyed shuffle).  Output per l_returnflag:
    high_line_count, low_line_count (1-URGENT/2-HIGH vs rest)."""
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(orders)
    k = n_partitions or default_partitions()
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def ord_proj(batch: pd.DataFrame) -> pa.Table:
        crit = batch["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        return arrow_out(pd.DataFrame({
            "o_orderkey": batch["o_orderkey"].to_numpy(),
            "critical": crit.to_numpy().astype(np.int64)}))

    def line_proj(batch: pd.DataFrame) -> pa.Table:
        d = batch["l_shipdate"].to_numpy(dtype="datetime64[us]")
        b = batch[(d >= lo) & (d < hi)]
        return arrow_out(b[["l_orderkey", "l_returnflag"]]
                         .reset_index(drop=True))

    ords = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_orderpriority"])) \
        .map_batches(ord_proj, batch_format="pandas")
    line = strip_schema_metadata(
        lineitem.select_columns(["l_orderkey", "l_returnflag",
                                 "l_shipdate"])) \
        .map_batches(line_proj, batch_format="pandas")

    joined = line.join(ords, "inner", num_partitions=k,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def rollup(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "l_returnflag" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "l_returnflag": pd.Series([], dtype="object"),
                "high_line_count": pd.Series([], dtype="int64"),
                "low_line_count": pd.Series([], dtype="int64")}))
        crit = batch["critical"].to_numpy()
        frame = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_numpy(),
            "high_line_count": crit,
            "low_line_count": 1 - crit})
        return arrow_out(frame.groupby("l_returnflag", as_index=False,
                                       sort=False).sum())

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "l_returnflag" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "l_returnflag": pd.Series([], dtype="object"),
                "high_line_count": pd.Series([], dtype="int64"),
                "low_line_count": pd.Series([], dtype="int64")}))
        g = batch.groupby("l_returnflag", as_index=False, sort=False) \
            .sum().sort_values("l_returnflag")
        return arrow_out(g.reset_index(drop=True))

    return joined.map_batches(rollup, batch_format="pandas",
                              batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def promo_revenue_share(lineitem: ray.data.Dataset,
                        part: ray.data.Dataset, *,
                        date_lo: str = "1996-03-01",
                        date_hi: str = "1996-04-01",
                        promo_prefix: str = "PROMO"
                        ) -> ray.data.Dataset:
    """TPC-H Q14 shape: share of revenue from promo parts in one
    month.  The part table contributes ONE BIT per partkey, so it is
    broadcast as a dense numpy bool LUT (partkeys are small contiguous
    ints — the Q5 LUT rule), NOT joined: the plan has zero shuffles —
    per-batch (promo_c4, total_c4) scalar partials and one tiny merge.
    Output: promo_revenue_c4, total_revenue_c4 (exact int64) and
    promo_pct (floor-6 double of 100·promo/total)."""
    import ray as _ray

    from .lmscore import _get_broadcast

    # project to (p_partkey, flag) in a map BEFORE the driver pull —
    # only one int + one bit per part row reaches the driver, never
    # the p_type strings (r4 verdict item 5)
    import pyarrow.compute as pc

    def flag_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": batch.column("p_partkey"),
            "flag": pc.starts_with(batch.column("p_type"),
                                   promo_prefix)})

    flags = {int(r["p_partkey"]): bool(r["flag"])
             for r in part.select_columns(["p_partkey", "p_type"])
             .map_batches(flag_rows, batch_format="pyarrow")
             .take_all()}
    size = (max(flags) + 1) if flags else 1
    lut = np.zeros(size, dtype=bool)
    for pk, f in flags.items():
        if pk >= 0:
            lut[pk] = f
    lut_ref = _ray.put(lut)
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def partials(batch: pd.DataFrame, *, ref) -> pa.Table:
        l = _get_broadcast(ref)
        d = batch["l_shipdate"].to_numpy(dtype="datetime64[us]")
        b = batch[(d >= lo) & (d < hi)]
        if len(b) == 0:
            promo = total = 0
        else:
            price_c = _cents(b["l_extendedprice"])
            disc_bp = np.rint(b["l_discount"].to_numpy() * 100) \
                .astype(np.int64)
            rev = price_c * (100 - disc_bp)
            pk = b["l_partkey"].to_numpy().astype(np.int64)
            is_promo = np.where((pk >= 0) & (pk < len(l)),
                                l[np.clip(pk, 0, len(l) - 1)], False)
            promo = int(rev[is_promo].sum())
            total = int(rev.sum())
        return arrow_out(pd.DataFrame({
            "promo_revenue_c4": pd.Series([promo], dtype="int64"),
            "total_revenue_c4": pd.Series([total], dtype="int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        promo = int(batch["promo_revenue_c4"].sum())
        total = int(batch["total_revenue_c4"].sum())
        pct = np.floor(100.0 * promo / total * 1e6) / 1e6 if total else 0.0
        return arrow_out(pd.DataFrame({
            "promo_revenue_c4": pd.Series([promo], dtype="int64"),
            "total_revenue_c4": pd.Series([total], dtype="int64"),
            "promo_pct": pd.Series([pct], dtype="float64")}))

    return strip_schema_metadata(
        lineitem.select_columns(["l_shipdate", "l_partkey",
                                 "l_extendedprice", "l_discount"])) \
        .map_batches(partials, batch_format="pandas",
                     fn_kwargs={"ref": lut_ref}) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def weighted_order_sample(orders: ray.data.Dataset,
                          lineitem: ray.data.Dataset, *,
                          k: int = 50,
                          n_partitions: int | None = None
                          ) -> ray.data.Dataset:
    """Weighted sampling over a JOIN (the EDBT 2023 'Streaming
    Weighted Sampling over Join Queries' problem shape): draw
    min(k, N) orders without replacement with inclusion probability
    proportional to their JOINED revenue Σ extendedprice×(100−disc) —
    without ever materializing the full join result on the driver.

    Shape: per-batch (orderkey, revenue) combiners → ONE integer-key
    hash join against the orders projection (the join co-locates each
    order, so per-partition revenue sums are exact finals) → the
    A-ES key ln(md5-uniform)/weight computed partition-locally
    (corpus.weighted_sample_k's reproducible draw, Efraimidis &
    Spirakis 2006) → per-partition top-k → one tiny candidate merge.
    Keys floor-6 BEFORE selection, ties orderkey asc — the chosen set
    is bit-reproducible in SQL.  Output: (o_orderkey, o_orderdate,
    revenue_c4, sample_key) ordered by (sample_key desc, key asc).
    """
    from ..state import default_partitions, ensure_hash_shuffle
    from .corpus import _aes_keys_floor6
    ensure_hash_shuffle(orders)
    kparts = n_partitions or default_partitions()

    def line_partials(batch: pd.DataFrame) -> pa.Table:
        price_c = _cents(batch["l_extendedprice"])
        disc_bp = np.rint(batch["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        frame = pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].to_numpy(),
            "revenue_c4": price_c * (100 - disc_bp),
        })
        return arrow_out(frame.groupby("l_orderkey", as_index=False,
                                       sort=False).sum())

    line = strip_schema_metadata(
        lineitem.select_columns(["l_orderkey", "l_extendedprice",
                                 "l_discount"])) \
        .map_batches(line_partials, batch_format="pandas")
    ords = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_orderdate"]))

    joined = line.join(ords, "inner", num_partitions=kparts,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def local_topk(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "revenue_c4": pd.Series([], dtype="int64"),
            "sample_key": pd.Series([], dtype="float64")})
        if len(batch) == 0 or "l_orderkey" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby(["l_orderkey", "o_orderdate"],
                          as_index=False, sort=False)["revenue_c4"] \
            .sum()
        g = g[g["revenue_c4"] > 0]
        if len(g) == 0:
            return arrow_out(empty)
        keys = _aes_keys_floor6(
            [int(okey) for okey in g["l_orderkey"]],
            g["revenue_c4"].to_numpy())
        out = pd.DataFrame({
            "o_orderkey": g["l_orderkey"].to_numpy(),
            "o_orderdate": g["o_orderdate"].to_numpy(),
            "revenue_c4": g["revenue_c4"].to_numpy(),
            "sample_key": keys})
        out = out.sort_values(["sample_key", "o_orderkey"],
                              ascending=[False, True]).head(k)
        return arrow_out(out.reset_index(drop=True))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "o_orderkey" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "revenue_c4": pd.Series([], dtype="int64"),
                "sample_key": pd.Series([], dtype="float64")}))
        out = batch.sort_values(["sample_key", "o_orderkey"],
                                ascending=[False, True]).head(k)
        return arrow_out(out.reset_index(drop=True))

    return joined.map_batches(local_topk, batch_format="pandas",
                              batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def order_priority_counts(orders: ray.data.Dataset,
                          lineitem: ray.data.Dataset, *,
                          date_lo: str = "1996-01-01",
                          date_hi: str = "1997-01-01",
                          returnflag: str = "R",
                          n_partitions: int | None = None
                          ) -> ray.data.Dataset:
    """TPC-H Q4 shape — the distributed SEMI-JOIN (EXISTS) pattern.

    Adapted to this schema (no commitdate/receiptdate): count window
    orders per priority where EXISTS a lineitem of the order carrying
    ``returnflag``.  Unlike an inner join, the answer must not be
    inflated by line multiplicity — the semi-join needs only key
    MEMBERSHIP, so no Acero join: the line side sheds to per-batch
    DISTINCT orderkeys (ids only, one int per matching order per
    batch), the orders side ships (key, priority), ONE keyed exchange
    co-locates each key's rows, and the per-partition pass counts
    priorities of order rows whose key has a line tag — emitting
    bounded (priority, n) partials merged in a single block (the
    pricing_summary bounded-key rule).

    Output: (o_orderpriority, order_count) ordered by priority.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    # The keyed repartition runs on l_side.union(o_side), which carries
    # the FIRST input's context snapshot — flip both sides.
    ensure_hash_shuffle(orders)
    ensure_hash_shuffle(lineitem)
    k = n_partitions or default_partitions()
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def line_keys(batch: pd.DataFrame) -> pa.Table:
        keys = batch.loc[batch["l_returnflag"] == returnflag,
                         "l_orderkey"].unique()
        return arrow_out(pd.DataFrame({
            "key": pd.Series(keys, dtype="int64"),
            "priority": pd.Series([""] * len(keys), dtype="object"),
            "_side": pd.Series(["l"] * len(keys), dtype="object")}))

    def order_rows(batch: pd.DataFrame) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(dtype="datetime64[us]")
        b = batch[(d >= lo) & (d < hi)]
        return arrow_out(pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(dtype=np.int64),
            "priority": b["o_orderpriority"].to_numpy(),
            "_side": np.full(len(b), "o", dtype=object)}))

    l_side = strip_schema_metadata(
        lineitem.select_columns(["l_orderkey", "l_returnflag"])) \
        .map_batches(line_keys, batch_format="pandas")
    o_side = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_orderdate",
                               "o_orderpriority"])) \
        .map_batches(order_rows, batch_format="pandas")

    def partials(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "o_orderpriority": pd.Series([], dtype="object"),
            "order_count": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "_side" not in batch.columns:
            return arrow_out(empty)
        tagged = set(batch.loc[batch["_side"] == "l", "key"])
        o = batch[batch["_side"] == "o"]
        m = o[o["key"].isin(tagged)]
        if len(m) == 0:
            return arrow_out(empty)
        g = m.groupby("priority", sort=False).size() \
            .reset_index(name="order_count")
        return arrow_out(pd.DataFrame({
            "o_orderpriority": g["priority"],
            "order_count": g["order_count"].astype("int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "o_orderpriority" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "o_orderpriority": pd.Series([], dtype="object"),
                "order_count": pd.Series([], dtype="int64")}))
        g = batch.groupby("o_orderpriority", as_index=False,
                          sort=True).sum()
        return arrow_out(g.reset_index(drop=True))

    return l_side.union(o_side) \
        .repartition(num_blocks=k, keys=["key"]) \
        .map_batches(partials, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def inactive_customers(customer: ray.data.Dataset,
                       orders: ray.data.Dataset, *,
                       date_lo: str = "1996-01-01",
                       date_hi: str = "1997-01-01",
                       n_partitions: int | None = None
                       ) -> ray.data.Dataset:
    """Distributed ANTI-JOIN (NOT EXISTS) — the complement of
    ``order_priority_counts``'s semi-join: per market segment, count
    customers with NO order in the window.

    Same membership discipline: the orders side sheds to per-batch
    DISTINCT custkeys (ids only), customers ship (key, segment), ONE
    keyed union exchange co-locates them, and the per-partition pass
    counts customer rows whose key carries no order tag.  Anti-join
    needs the SAME co-location guarantee as semi-join (a key's absence
    is only provable when every occurrence of the key is local), which
    the hash exchange provides; partials are bounded (segment, n) rows
    merged in a single block.

    Output: (c_mktsegment, inactive_customers) ordered by segment.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    # keyed repartition runs on the union — flip both inputs' contexts
    ensure_hash_shuffle(customer)
    ensure_hash_shuffle(orders)
    k = n_partitions or default_partitions()
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def order_keys(batch: pd.DataFrame) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(dtype="datetime64[us]")
        keys = batch.loc[(d >= lo) & (d < hi), "o_custkey"].unique()
        return arrow_out(pd.DataFrame({
            "key": pd.Series(keys, dtype="int64"),
            "segment": pd.Series([""] * len(keys), dtype="object"),
            "_side": pd.Series(["o"] * len(keys), dtype="object")}))

    def cust_rows(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(pd.DataFrame({
            "key": batch["c_custkey"].to_numpy(dtype=np.int64),
            "segment": batch["c_mktsegment"].to_numpy(),
            "_side": np.full(len(batch), "c", dtype=object)}))

    o_side = strip_schema_metadata(
        orders.select_columns(["o_custkey", "o_orderdate"])) \
        .map_batches(order_keys, batch_format="pandas")
    c_side = strip_schema_metadata(
        customer.select_columns(["c_custkey", "c_mktsegment"])) \
        .map_batches(cust_rows, batch_format="pandas")

    def partials(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "c_mktsegment": pd.Series([], dtype="object"),
            "inactive_customers": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "_side" not in batch.columns:
            return arrow_out(empty)
        tagged = set(batch.loc[batch["_side"] == "o", "key"])
        c = batch[batch["_side"] == "c"]
        m = c[~c["key"].isin(tagged)]
        if len(m) == 0:
            return arrow_out(empty)
        g = m.groupby("segment", sort=False).size() \
            .reset_index(name="inactive_customers")
        return arrow_out(pd.DataFrame({
            "c_mktsegment": g["segment"],
            "inactive_customers":
                g["inactive_customers"].astype("int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "c_mktsegment" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "c_mktsegment": pd.Series([], dtype="object"),
                "inactive_customers": pd.Series([], dtype="int64")}))
        g = batch.groupby("c_mktsegment", as_index=False,
                          sort=True).sum()
        return arrow_out(g.reset_index(drop=True))

    return o_side.union(c_side) \
        .repartition(num_blocks=k, keys=["key"]) \
        .map_batches(partials, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def large_order_totals(orders: ray.data.Dataset,
                       lineitem: ray.data.Dataset, *,
                       qty_threshold: int = 250,
                       k: int = 100,
                       n_partitions: int | None = None
                       ) -> ray.data.Dataset:
    """TPC-H Q18 shape — HAVING over a NEAR-UNIQUE key + global top-k.

    Orders whose total lineitem quantity exceeds ``qty_threshold``,
    top ``k`` by (o_totalprice desc, o_orderkey asc).  The per-order
    quantity sum is the mostly-unique-key aggregate a Dataset groupby
    must never pay (CLAUDE.md round-3 finding): per-batch (orderkey,
    qty) combiners shed the line rows to ≤ |orders-in-batch| partials,
    the union idiom co-locates them with order attribute rows on ONE
    keyed exchange, the per-partition pass finishes the sum + HAVING
    filter + attribute attach, and top-k is two-level (partition-local
    head, single-block merge of ≤ k×partitions candidates).

    Money is exact integer cents (o_totalprice_c2); quantities in this
    corpus are integral doubles, summed as int64.

    Output: (o_orderkey, o_custkey, o_orderdate, o_totalprice_c2,
    total_qty), ordered totalprice desc, orderkey asc.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(orders)
    ensure_hash_shuffle(lineitem)
    kparts = n_partitions or default_partitions()

    def line_partials(batch: pd.DataFrame) -> pa.Table:
        qty = np.rint(batch["l_quantity"].to_numpy()).astype(np.int64)
        g = pd.DataFrame({"key": batch["l_orderkey"].to_numpy(),
                          "qty": qty}) \
            .groupby("key", sort=False, as_index=False)["qty"].sum()
        n = len(g)
        return arrow_out(pd.DataFrame({
            "key": g["key"].astype("int64"),
            "qty": g["qty"].astype("int64"),
            "custkey": np.zeros(n, dtype=np.int64),
            "date_us": np.zeros(n, dtype=np.int64),
            "price_c2": np.zeros(n, dtype=np.int64),
            "_side": np.full(n, "l", dtype=object)}))

    def order_rows(batch: pd.DataFrame) -> pa.Table:
        n = len(batch)
        return arrow_out(pd.DataFrame({
            "key": batch["o_orderkey"].to_numpy(dtype=np.int64),
            "qty": np.zeros(n, dtype=np.int64),
            "custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
            "date_us": batch["o_orderdate"]
                .to_numpy(dtype="datetime64[us]").astype(np.int64),
            "price_c2": _cents(batch["o_totalprice"]),
            "_side": np.full(n, "o", dtype=object)}))

    l_side = strip_schema_metadata(
        lineitem.select_columns(["l_orderkey", "l_quantity"])) \
        .map_batches(line_partials, batch_format="pandas")
    o_side = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_custkey",
                               "o_orderdate", "o_totalprice"])) \
        .map_batches(order_rows, batch_format="pandas")

    empty = pd.DataFrame({
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_custkey": pd.Series([], dtype="int64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_totalprice_c2": pd.Series([], dtype="int64"),
        "total_qty": pd.Series([], dtype="int64")})

    def local_head(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "_side" not in batch.columns:
            return arrow_out(empty.copy())
        lines = batch[batch["_side"] == "l"]
        sums = lines.groupby("key", sort=False)["qty"].sum()
        big = sums[sums > qty_threshold]
        if len(big) == 0:
            return arrow_out(empty.copy())
        o = batch[batch["_side"] == "o"].set_index("key")
        o = o.loc[o.index.intersection(big.index)]
        frame = pd.DataFrame({
            "o_orderkey": o.index.to_numpy(dtype=np.int64),
            "o_custkey": o["custkey"].to_numpy(dtype=np.int64),
            "o_orderdate": o["date_us"].to_numpy()
                .astype("datetime64[us]"),
            "o_totalprice_c2": o["price_c2"].to_numpy(dtype=np.int64),
            "total_qty": big.loc[o.index].to_numpy(dtype=np.int64)})
        frame = frame.sort_values(
            ["o_totalprice_c2", "o_orderkey"], ascending=[False, True],
            kind="stable").head(k)
        return arrow_out(frame.reset_index(drop=True))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "o_orderkey" not in batch.columns:
            return arrow_out(empty.copy())
        g = batch.sort_values(
            ["o_totalprice_c2", "o_orderkey"], ascending=[False, True],
            kind="stable").head(k)
        return arrow_out(g.reset_index(drop=True))

    return l_side.union(o_side) \
        .repartition(num_blocks=kparts, keys=["key"]) \
        .map_batches(local_head, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def quantity_moments(lineitem: ray.data.Dataset
                     ) -> ray.data.Dataset:
    """Distributed EXACT second moments — mean and population variance
    of l_quantity per (l_returnflag, l_linestatus).

    The parallel-moments shape: each batch emits ONE bounded-key row of
    integer partials (n, Σq, Σq²) — quantities in this corpus are
    integral, so the partials are exact int64 and re-associate freely
    across any partitioning (float sumsq would be order-dependent and
    could never hash-match the oracle).  The single-block merge sums
    the integers, then takes the ONLY float steps last, mirroring the
    DuckDB expression op-for-op: mean = double(Σq)/double(n), var_pop
    = double(n·Σq² − (Σq)²)/double(n²) — one correctly-rounded IEEE
    division each, floor-6 on both sides.

    Output: (l_returnflag, l_linestatus, n, mean_qty, var_pop_qty).
    """
    FLOOR6 = 1_000_000

    def partials(batch: pd.DataFrame) -> pa.Table:
        qty = np.rint(batch["l_quantity"].to_numpy()).astype(np.int64)
        frame = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_numpy(),
            "l_linestatus": batch["l_linestatus"].to_numpy(),
            "n": np.ones(len(batch), dtype=np.int64),
            "s": qty, "ssq": qty * qty})
        g = frame.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False, sort=False).sum()
        return arrow_out(g)

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "l_returnflag" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "l_returnflag": pd.Series([], dtype="object"),
                "l_linestatus": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "mean_qty": pd.Series([], dtype="float64"),
                "var_pop_qty": pd.Series([], dtype="float64")}))
        g = batch.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False, sort=True).sum()
        mean, var = [], []
        for n, s, ssq in zip(g["n"], g["s"], g["ssq"]):
            n, s, ssq = int(n), int(s), int(ssq)  # arbitrary precision
            m = float(s) / float(n)
            v = float(n * ssq - s * s) / float(n * n)
            mean.append(np.floor(m * FLOOR6) / FLOOR6)
            var.append(np.floor(v * FLOOR6) / FLOOR6)
        return arrow_out(pd.DataFrame({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "n": g["n"].astype("int64"),
            "mean_qty": np.asarray(mean, dtype=np.float64),
            "var_pop_qty": np.asarray(var, dtype=np.float64)}))

    return strip_schema_metadata(
        lineitem.select_columns(["l_returnflag", "l_linestatus",
                                 "l_quantity"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def customer_order_distribution(customer: ray.data.Dataset,
                                orders: ray.data.Dataset, *,
                                exclude_status: str = "P",
                                n_partitions: int | None = None
                                ) -> ray.data.Dataset:
    """TPC-H Q13 shape — the OUTER-join count distribution: how many
    customers placed exactly c orders (excluding ``exclude_status``
    orders), INCLUDING the zero-order customers an inner join would
    drop.

    No Acero join: the orders side sheds to per-batch (custkey,
    partial_n) combiner rows (ids only — distinct custkeys per batch,
    not order rows), ONE keyed exchange finalizes per-customer counts,
    and each partition emits its count-of-counts histogram (bounded:
    max orders per customer).  The LEFT-join zero bucket needs only
    |customer| (FK guarantees order custkeys ⊆ customers): the
    customer side ships one (|batch|) tally row per batch, exchange-
    free, and the single-block merge computes ``custdist(0) =
    |customer| − Σ_{c≥1} custdist(c)`` — the zero row costs one
    subtraction, not an outer join.

    Output: (c_count, custdist), zero row present only when nonempty
    (matching the SQL LEFT JOIN, which emits 0 only if some customer
    has no qualifying order).
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(orders)
    k = n_partitions or default_partitions()

    def order_partials(batch: pd.DataFrame) -> pa.Table:
        b = batch[batch["o_orderstatus"] != exclude_status]
        g = b.groupby("o_custkey", sort=False).size() \
            .reset_index(name="n")
        return arrow_out(pd.DataFrame({
            "key": g["o_custkey"].astype("int64"),
            "n": g["n"].astype("int64")}))

    def hist_partials(batch: pd.DataFrame) -> pa.Table:
        # Zero-row-safe: always emit at least the schema via a
        # sentinel (c_count=-1, 0) so the merge UDF runs even on an
        # all-empty plan (empty-block skip gotcha).
        sentinel = pd.DataFrame({
            "c_count": pd.Series([-1], dtype="int64"),
            "custdist": pd.Series([0], dtype="int64")})
        if len(batch) == 0 or "key" not in batch.columns:
            return arrow_out(sentinel)
        per_cust = batch.groupby("key", sort=False)["n"].sum()
        h = per_cust.value_counts()
        out = pd.DataFrame({
            "c_count": h.index.to_numpy(dtype=np.int64),
            "custdist": h.to_numpy(dtype=np.int64)})
        return arrow_out(pd.concat([out, sentinel],
                                   ignore_index=True))

    o_hist = strip_schema_metadata(
        orders.select_columns(["o_custkey", "o_orderstatus"])) \
        .map_batches(order_partials, batch_format="pandas") \
        .repartition(num_blocks=k, keys=["key"]) \
        .map_batches(hist_partials, batch_format="pandas",
                     batch_size=None)

    def cust_tally(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(pd.DataFrame({
            "c_count": pd.Series([-2], dtype="int64"),
            "custdist": pd.Series([len(batch)], dtype="int64")}))

    c_tally = strip_schema_metadata(
        customer.select_columns(["c_custkey"])) \
        .map_batches(cust_tally, batch_format="pandas")

    def merge(batch: pd.DataFrame) -> pa.Table:
        total = int(batch.loc[batch["c_count"] == -2,
                              "custdist"].sum())
        dist = batch[batch["c_count"] >= 1] \
            .groupby("c_count", as_index=False, sort=True)["custdist"] \
            .sum()
        zero = total - int(dist["custdist"].sum())
        if zero > 0:
            dist = pd.concat([pd.DataFrame({
                "c_count": pd.Series([0], dtype="int64"),
                "custdist": pd.Series([zero], dtype="int64")}),
                dist], ignore_index=True)
        return arrow_out(pd.DataFrame({
            "c_count": dist["c_count"].astype("int64"),
            "custdist": dist["custdist"].astype("int64")}))

    return o_hist.union(c_tally) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def top_returned_customers(customer: ray.data.Dataset,
                           orders: ray.data.Dataset,
                           lineitem: ray.data.Dataset, *,
                           date_lo: str = "1996-01-01",
                           date_hi: str = "1996-07-01",
                           returnflag: str = "R", n: int = 20,
                           n_partitions: int | None = None
                           ) -> ray.data.Dataset:
    """TPC-H Q10 shape — returned-item revenue per customer, top-N
    with customer attributes: lineitem(flag) ⋈ orders(window) ⋈
    customer, revenue in exact c4 fixed point.

    No Acero join: BOTH equi-joins ride the union idiom.  Exchange 1
    (orderkey): lineitem sheds to per-batch (orderkey, rev_c4)
    combiner rows, orders to (orderkey, custkey) window rows — the
    per-partition pass maps each order's revenue onto its custkey and
    re-combines, so only (custkey, rev_c4) partials leave.  Exchange 2
    (custkey): those partials union with customer attribute rows; each
    partition finalizes its custkeys' revenue, attaches attributes
    with an in-partition merge, and heads N — the single merge block
    sees ≤ N × partitions candidate rows.  Ids+cents+one name column
    move; lineitem payload never does.

    Output: (c_custkey, c_name, c_acctbal_cents, revenue_c4), top N
    by (revenue desc, custkey asc).
    """
    from ..state import default_partitions, ensure_hash_shuffle
    for d in (customer, orders, lineitem):
        ensure_hash_shuffle(d)
    k = n_partitions or default_partitions()
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def line_partials(batch: pd.DataFrame) -> pa.Table:
        b = batch[batch["l_returnflag"] == returnflag]
        if len(b) == 0:
            return arrow_out(pd.DataFrame({
                "key": pd.Series([], dtype="int64"),
                "rev_c4": pd.Series([], dtype="int64"),
                "custkey": pd.Series([], dtype="int64"),
                "_side": pd.Series([], dtype="object")}))
        price_c = _cents(b["l_extendedprice"])
        disc_bp = np.rint(b["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        g = pd.DataFrame({
            "key": b["l_orderkey"].to_numpy(dtype=np.int64),
            "rev_c4": price_c * (100 - disc_bp),
        }).groupby("key", as_index=False, sort=False).sum()
        g["custkey"] = np.int64(0)
        g["_side"] = "l"
        return arrow_out(g)

    def order_rows(batch: pd.DataFrame) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(dtype="datetime64[us]")
        b = batch[(d >= lo) & (d < hi)]
        return arrow_out(pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(dtype=np.int64),
            "rev_c4": np.zeros(len(b), dtype=np.int64),
            "custkey": b["o_custkey"].to_numpy(dtype=np.int64),
            "_side": np.full(len(b), "o", dtype=object)}))

    l_side = strip_schema_metadata(
        lineitem.select_columns(["l_orderkey", "l_extendedprice",
                                 "l_discount", "l_returnflag"])) \
        .map_batches(line_partials, batch_format="pandas")
    o_side = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_custkey",
                               "o_orderdate"])) \
        .map_batches(order_rows, batch_format="pandas")

    def to_custkey(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "key": pd.Series([], dtype="int64"),
            "rev_c4": pd.Series([], dtype="int64"),
            "name": pd.Series([], dtype="object"),
            "acctbal_c": pd.Series([], dtype="int64"),
            "_side": pd.Series([], dtype="object")})
        if len(batch) == 0 or "_side" not in batch.columns:
            return arrow_out(empty)
        rev = batch[batch["_side"] == "l"] \
            .groupby("key", as_index=False, sort=False)["rev_c4"].sum()
        o = batch.loc[batch["_side"] == "o", ["key", "custkey"]]
        m = rev.merge(o, on="key", how="inner")
        if len(m) == 0:
            return arrow_out(empty)
        g = m.groupby("custkey", as_index=False, sort=False)["rev_c4"] \
            .sum()
        return arrow_out(pd.DataFrame({
            "key": g["custkey"].astype("int64"),
            "rev_c4": g["rev_c4"].astype("int64"),
            "name": pd.Series([""] * len(g), dtype="object"),
            "acctbal_c": pd.Series([0] * len(g), dtype="int64"),
            "_side": pd.Series(["r"] * len(g), dtype="object")}))

    rev_side = l_side.union(o_side) \
        .repartition(num_blocks=k, keys=["key"]) \
        .map_batches(to_custkey, batch_format="pandas",
                     batch_size=None)
    ensure_hash_shuffle(rev_side)

    def cust_rows(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(pd.DataFrame({
            "key": batch["c_custkey"].to_numpy(dtype=np.int64),
            "rev_c4": np.zeros(len(batch), dtype=np.int64),
            "name": batch["c_name"].to_numpy(),
            "acctbal_c": _cents(batch["c_acctbal"]),
            "_side": np.full(len(batch), "c", dtype=object)}))

    c_side = strip_schema_metadata(
        customer.select_columns(["c_custkey", "c_name",
                                 "c_acctbal"])) \
        .map_batches(cust_rows, batch_format="pandas")

    out_cols = ["c_custkey", "c_name", "c_acctbal_cents", "revenue_c4"]

    def local_topn(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "c_custkey": pd.Series([], dtype="int64"),
            "c_name": pd.Series([], dtype="object"),
            "c_acctbal_cents": pd.Series([], dtype="int64"),
            "revenue_c4": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "_side" not in batch.columns:
            return arrow_out(empty)
        rev = batch[batch["_side"] == "r"] \
            .groupby("key", as_index=False, sort=False)["rev_c4"].sum()
        attrs = batch.loc[batch["_side"] == "c",
                          ["key", "name", "acctbal_c"]]
        m = rev.merge(attrs, on="key", how="inner")
        if len(m) == 0:
            return arrow_out(empty)
        top = m.sort_values(["rev_c4", "key"],
                            ascending=[False, True]).head(n)
        return arrow_out(pd.DataFrame({
            "c_custkey": top["key"].astype("int64"),
            "c_name": top["name"],
            "c_acctbal_cents": top["acctbal_c"].astype("int64"),
            "revenue_c4": top["rev_c4"].astype("int64")}))

    def topn_merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "c_custkey" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype="object"),
                "c_acctbal_cents": pd.Series([], dtype="int64"),
                "revenue_c4": pd.Series([], dtype="int64")}))
        top = batch.sort_values(["revenue_c4", "c_custkey"],
                                ascending=[False, True]).head(n)
        return arrow_out(top[out_cols].reset_index(drop=True))

    return rev_side.union(c_side) \
        .repartition(num_blocks=k, keys=["key"]) \
        .map_batches(local_topn, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(topn_merge, batch_format="pandas",
                     batch_size=None)


def quantity_price_correlation(lineitem: ray.data.Dataset
                               ) -> ray.data.Dataset:
    """Distributed EXACT Pearson correlation between l_quantity and
    l_extendedprice — the five-sum parallel-correlation shape: each
    batch emits ONE row of integer partials (n, Σq, Σp, Σqp, Σq²,
    Σp²) over (quantity, price-cents), both integral in this corpus,
    so the partials re-associate exactly at any partitioning.

    Σp² and Σqp overflow int64 over a large corpus: per-element
    products are exact int64 (≤1e14), the batch total is taken in
    int64-safe chunks of 1024 via np.add.reduceat and summed into a
    Python arbitrary-precision int carried as a STRING partial column
    — the event_interarrival_stats technique, vectorized.  The merge
    sums big ints, then mirrors the only float steps op-for-op with
    the DuckDB HUGEINT oracle: r = double(nΣqp − ΣqΣp) /
    (sqrt(double(nΣq² − Σq²)) · sqrt(double(nΣp² − Σp²))), floor-6.

    Output: one row (n, corr_qty_price).
    """
    import math
    FLOOR6 = 1_000_000

    def _big_sum(arr: np.ndarray) -> int:
        if len(arr) == 0:
            return 0
        cuts = np.arange(0, len(arr), 1024)
        return sum(int(x) for x in np.add.reduceat(arr, cuts))

    def partials(batch: pd.DataFrame) -> pa.Table:
        q = np.rint(batch["l_quantity"].to_numpy()).astype(np.int64)
        p = _cents(batch["l_extendedprice"])
        return arrow_out(pd.DataFrame({
            "n": pd.Series([len(q)], dtype="int64"),
            "sq": pd.Series([str(int(q.sum()))], dtype="object"),
            "sp": pd.Series([str(_big_sum(p))], dtype="object"),
            "sqp": pd.Series([str(_big_sum(q * p))], dtype="object"),
            "sqq": pd.Series([str(int((q * q).sum()))],
                             dtype="object"),
            "spp": pd.Series([str(_big_sum(p * p))],
                             dtype="object")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "n" not in batch.columns or \
                int(batch["n"].sum()) == 0:
            return pa.table({
                "n": pa.array([0], pa.int64()),
                "corr_qty_price": pa.array([None], pa.float64())})
        n = int(batch["n"].sum())
        sq = sum(int(x) for x in batch["sq"])
        sp = sum(int(x) for x in batch["sp"])
        sqp = sum(int(x) for x in batch["sqp"])
        sqq = sum(int(x) for x in batch["sqq"])
        spp = sum(int(x) for x in batch["spp"])
        num = float(n * sqp - sq * sp)
        den = math.sqrt(float(n * sqq - sq * sq)) * \
            math.sqrt(float(n * spp - sp * sp))
        r = num / den if den != 0.0 else None
        if r is not None:
            r = np.floor(r * FLOOR6) / FLOOR6
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "corr_qty_price": pa.array([r], pa.float64())})

    return strip_schema_metadata(
        lineitem.select_columns(["l_quantity", "l_extendedprice"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def brand_quantity_revenue(lineitem: ray.data.Dataset,
                           part: ray.data.Dataset, *,
                           branches: tuple = (
                               ("Brand#1", 1, 15),
                               ("Brand#2", 10, 25),
                               ("Brand#3", 20, 35)),
                           n_partitions: int | None = None
                           ) -> ray.data.Dataset:
    """TPC-H Q19 shape — the DISJUNCTIVE multi-branch predicate join:
    revenue from lines matching ANY (brand, quantity-band) branch,
    per branch and overall.

    The part table contributes one small-int BRAND CODE per partkey,
    broadcast as a dense numpy int8 LUT (the Q14 one-bit rule
    generalized to a code) — zero shuffles in the whole plan: each
    branch mask is one vectorized compare chain, the ANY row ORs the
    masks so an overlapping-branch line counts once, and the partials
    are ≤ |branches|+1 bounded rows per batch, merged in one block.

    Output: (branch, revenue_c4, n_lines), branch ∈ brands ∪ 'ANY'.
    """
    import ray as _ray

    import pyarrow.compute as pc

    from .lmscore import _get_broadcast

    brand_code = {b: i for i, (b, _, _) in enumerate(branches)}
    labels = [b for (b, _, _) in branches] + ["ANY"]

    def code_rows(batch: pa.Table) -> pa.Table:
        # project to (p_partkey, code) BEFORE the driver pull — one
        # int + one small code per part row, never the brand strings;
        # index_in is the vectorized string→code kernel
        idx = pc.index_in(batch.column("p_brand"),
                          value_set=pa.array(list(brand_code)))
        return pa.table({
            "p_partkey": batch.column("p_partkey"),
            "code": pc.fill_null(idx, -1).cast(pa.int8())})

    codes = {int(r["p_partkey"]): int(r["code"])
             for r in part.select_columns(["p_partkey", "p_brand"])
             .map_batches(code_rows, batch_format="pyarrow")
             .take_all()}
    size = (max(codes) + 1) if codes else 1
    lut = np.full(size, -1, dtype=np.int8)
    for pk, c in codes.items():
        if pk >= 0:
            lut[pk] = c
    lut_ref = _ray.put(lut)

    def partials(batch: pd.DataFrame, *, ref) -> pa.Table:
        l = _get_broadcast(ref)
        price_c = _cents(batch["l_extendedprice"])
        disc_bp = np.rint(batch["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        rev = price_c * (100 - disc_bp)
        q = np.rint(batch["l_quantity"].to_numpy()).astype(np.int64)
        pk = batch["l_partkey"].to_numpy().astype(np.int64)
        code = np.where((pk >= 0) & (pk < len(l)),
                        l[np.clip(pk, 0, len(l) - 1)], -1)
        revs, ns = [], []
        any_mask = np.zeros(len(batch), dtype=bool)
        for i, (_, lo, hi) in enumerate(branches):
            m = (code == i) & (q >= lo) & (q <= hi)
            any_mask |= m
            revs.append(int(rev[m].sum()))
            ns.append(int(m.sum()))
        revs.append(int(rev[any_mask].sum()))
        ns.append(int(any_mask.sum()))
        return arrow_out(pd.DataFrame({
            "branch": pd.Series(labels, dtype="object"),
            "revenue_c4": pd.Series(revs, dtype="int64"),
            "n_lines": pd.Series(ns, dtype="int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby("branch", as_index=False, sort=True) \
            [["revenue_c4", "n_lines"]].sum()
        return arrow_out(pd.DataFrame({
            "branch": g["branch"],
            "revenue_c4": g["revenue_c4"].astype("int64"),
            "n_lines": g["n_lines"].astype("int64")}))

    return strip_schema_metadata(
        lineitem.select_columns(["l_partkey", "l_quantity",
                                 "l_extendedprice", "l_discount"])) \
        .map_batches(partials, batch_format="pandas",
                     fn_kwargs={"ref": lut_ref}) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def wealthy_inactive_customers(customer: ray.data.Dataset,
                               orders: ray.data.Dataset, *,
                               n_partitions: int | None = None
                               ) -> ray.data.Dataset:
    """TPC-H Q22 shape — the GLOBAL-SCALAR predicate + anti-join:
    per-segment count and total balance of customers whose balance
    exceeds the positive-balance average AND who placed no orders.

    The scalar subquery is two integers pulled from a single-block
    partial merge (sum of positive cents, count); the predicate is
    evaluated EXACTLY by integer cross-multiplication
    (``acctbal_c * n_pos > sum_pos_c``) — no float average exists on
    either side, so distributed evaluation is hash-identical to SQL.
    The NOT EXISTS rides the inactive_customers union idiom: orders
    shed to per-batch distinct custkeys, one keyed exchange co-locates
    each key (absence is provable only under total co-location),
    bounded per-segment partials merge in one block.

    Output: (c_mktsegment, numcust, totacctbal_cents).
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(customer)
    ensure_hash_shuffle(orders)
    k = n_partitions or default_partitions()

    def avg_partials(batch: pd.DataFrame) -> pa.Table:
        c = _cents(batch["c_acctbal"])
        pos = c[c > 0]
        return arrow_out(pd.DataFrame({
            "s": pd.Series([int(pos.sum())], dtype="int64"),
            "n": pd.Series([len(pos)], dtype="int64")}))

    def avg_merge(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(pd.DataFrame({
            "s": pd.Series([int(batch["s"].sum())], dtype="int64"),
            "n": pd.Series([int(batch["n"].sum())], dtype="int64")}))

    scalars = strip_schema_metadata(
        customer.select_columns(["c_acctbal"])) \
        .map_batches(avg_partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(avg_merge, batch_format="pandas",
                     batch_size=None).take_all()
    sum_pos, n_pos = int(scalars[0]["s"]), int(scalars[0]["n"])

    def cust_rows(batch: pd.DataFrame) -> pa.Table:
        c = _cents(batch["c_acctbal"])
        # exact integer cross-multiply: acctbal > avg(positive)
        m = (c * n_pos > sum_pos) & (c > 0)
        b = batch[m]
        return arrow_out(pd.DataFrame({
            "key": b["c_custkey"].to_numpy(dtype=np.int64),
            "segment": b["c_mktsegment"].to_numpy(),
            "bal_c": c[m],
            "_side": np.full(int(m.sum()), "c", dtype=object)}))

    def order_keys(batch: pd.DataFrame) -> pa.Table:
        keys = batch["o_custkey"].unique()
        return arrow_out(pd.DataFrame({
            "key": pd.Series(keys, dtype="int64"),
            "segment": pd.Series([""] * len(keys), dtype="object"),
            "bal_c": pd.Series([0] * len(keys), dtype="int64"),
            "_side": pd.Series(["o"] * len(keys), dtype="object")}))

    c_side = strip_schema_metadata(
        customer.select_columns(["c_custkey", "c_mktsegment",
                                 "c_acctbal"])) \
        .map_batches(cust_rows, batch_format="pandas")
    o_side = strip_schema_metadata(
        orders.select_columns(["o_custkey"])) \
        .map_batches(order_keys, batch_format="pandas")

    def partials(batch: pd.DataFrame) -> pa.Table:
        # Sentinel zero row, never an empty frame: an all-empty plan
        # (every wealthy customer active) would otherwise skip the
        # merge UDF and emit a schema-less result (empty-block gotcha)
        sentinel = pd.DataFrame({
            "c_mktsegment": pd.Series([""], dtype="object"),
            "numcust": pd.Series([0], dtype="int64"),
            "totacctbal_cents": pd.Series([0], dtype="int64")})
        if len(batch) == 0 or "_side" not in batch.columns:
            return arrow_out(sentinel)
        active = set(batch.loc[batch["_side"] == "o", "key"])
        c = batch[batch["_side"] == "c"]
        m = c[~c["key"].isin(active)]
        if len(m) == 0:
            return arrow_out(sentinel)
        g = m.groupby("segment", sort=False) \
            .agg(numcust=("key", "size"),
                 totacctbal_cents=("bal_c", "sum")).reset_index()
        out = pd.DataFrame({
            "c_mktsegment": g["segment"],
            "numcust": g["numcust"].astype("int64"),
            "totacctbal_cents":
                g["totacctbal_cents"].astype("int64")})
        return arrow_out(pd.concat([out, sentinel],
                                   ignore_index=True))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "c_mktsegment" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "c_mktsegment": pd.Series([], dtype="object"),
                "numcust": pd.Series([], dtype="int64"),
                "totacctbal_cents": pd.Series([], dtype="int64")}))
        b = batch[batch["c_mktsegment"] != ""]
        if len(b) == 0:
            return pa.table({
                "c_mktsegment": pa.array([], pa.string()),
                "numcust": pa.array([], pa.int64()),
                "totacctbal_cents": pa.array([], pa.int64())})
        g = b.groupby("c_mktsegment", as_index=False, sort=True).sum()
        return arrow_out(g.reset_index(drop=True))

    return c_side.union(o_side) \
        .repartition(num_blocks=k, keys=["key"]) \
        .map_batches(partials, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def top_supplier_revenue(lineitem: ray.data.Dataset,
                         supplier: ray.data.Dataset, *,
                         date_lo: str = "1996-01-01",
                         date_hi: str = "1996-04-01",
                         n_partitions: int | None = None
                         ) -> ray.data.Dataset:
    """TPC-H Q15 shape — GLOBAL ARGMAX over a keyed aggregate (the
    "top supplier by quarterly revenue" view), ties included.

    Distributed shape: per-batch combiners shed lineitem to
    (suppkey, revenue_c4) partials, ONE keyed exchange co-locates each
    supplier's partials, the per-partition pass finishes the sums and
    emits only its LOCAL max rows (every supplier tied at the
    partition max — a key's total is complete after the exchange, so
    partition-local maxima are valid global candidates), and the
    single-block merge takes the global max.  Supplier names attach in
    the merge from a ray.put id→name broadcast (the supplier dim is
    the small side; never shuffled, never re-shipped per batch).

    Money is exact cent×(100−bp) fixed point (``total_revenue_c4``),
    so the argmax — unlike a float sum — is partitioning-independent.

    Output: (s_suppkey, s_name, total_revenue_c4), all rows tied at
    the max, ordered by suppkey.
    """
    import ray as _ray

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(lineitem)
    k = n_partitions or default_partitions()
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    names_ref = _ray.put({int(r["s_suppkey"]): r["s_name"]
                          for r in supplier.take_all()})
    _memo: dict = {}

    def partials(batch: pd.DataFrame) -> pa.Table:
        d = batch["l_shipdate"].to_numpy(dtype="datetime64[us]")
        b = batch[(d >= lo) & (d < hi)]
        if len(b) == 0:
            return arrow_out(pd.DataFrame({
                "key": pd.Series([], dtype="int64"),
                "revenue_c4": pd.Series([], dtype="int64")}))
        price_c = _cents(b["l_extendedprice"])
        disc_bp = np.rint(b["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        frame = pd.DataFrame({
            "key": b["l_suppkey"].to_numpy(dtype=np.int64),
            "revenue_c4": price_c * (100 - disc_bp)})
        return arrow_out(frame.groupby("key", as_index=False,
                                       sort=False).sum())

    def local_max(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "key": pd.Series([], dtype="int64"),
            "revenue_c4": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "key" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby("key", as_index=False, sort=False).sum()
        top = g[g["revenue_c4"] == g["revenue_c4"].max()]
        return arrow_out(top.reset_index(drop=True))

    def merge(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "total_revenue_c4": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "key" not in batch.columns:
            return arrow_out(empty)
        names = _memo.get("n")
        if names is None:
            names = _memo["n"] = _ray.get(names_ref)
        top = batch[batch["revenue_c4"] == batch["revenue_c4"].max()] \
            .sort_values("key", kind="stable")
        return arrow_out(pd.DataFrame({
            "s_suppkey": top["key"].to_numpy(dtype=np.int64),
            "s_name": [names[int(s)] for s in top["key"]],
            "total_revenue_c4":
                top["revenue_c4"].to_numpy(dtype=np.int64)}))

    return strip_schema_metadata(
        lineitem.select_columns(["l_suppkey", "l_shipdate",
                                 "l_extendedprice", "l_discount"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(num_blocks=k, keys=["key"]) \
        .map_batches(local_max, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def small_quantity_revenue(lineitem: ray.data.Dataset,
                           part: ray.data.Dataset, *,
                           brand: str = "Brand#4",
                           n_partitions: int | None = None
                           ) -> ray.data.Dataset:
    """TPC-H Q17 shape — CORRELATED SCALAR AGGREGATE: total revenue of
    lineitems whose quantity is below 20% of the average quantity for
    their (brand-filtered) part.

    The correlated subquery (``l_quantity < 0.2 * avg(l_quantity)
    where same part``) needs every part's lines in one place: the part
    side sheds to brand-matching partkey ids map-side, the line side
    ships (partkey, qty, price) rows, ONE keyed union exchange
    co-locates them, and the per-partition pass computes each part's
    (count, Σqty) scalar and applies the predicate in EXACT INTEGER
    form — quantities in this corpus are integral, so
    ``5·qty·cnt < Σqty  ⇔  qty < 0.2·avg`` with no float division
    (the Q22 exact-predicate discipline).  Partials are one
    (Σprice_c2, n) row per partition, merged in a single block.

    Output: one row (total_price_c2, qualifying_lines).
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(lineitem)
    ensure_hash_shuffle(part)
    k = n_partitions or default_partitions()

    def part_keys(batch: pd.DataFrame) -> pa.Table:
        keys = batch.loc[batch["p_brand"] == brand,
                         "p_partkey"].to_numpy(dtype=np.int64)
        n = len(keys)
        return arrow_out(pd.DataFrame({
            "key": keys,
            "qty": np.zeros(n, dtype=np.int64),
            "price_c2": np.zeros(n, dtype=np.int64),
            "_side": np.full(n, "p", dtype=object)}))

    def line_rows(batch: pd.DataFrame) -> pa.Table:
        n = len(batch)
        return arrow_out(pd.DataFrame({
            "key": batch["l_partkey"].to_numpy(dtype=np.int64),
            "qty": np.rint(batch["l_quantity"].to_numpy())
                .astype(np.int64),
            "price_c2": _cents(batch["l_extendedprice"]),
            "_side": np.full(n, "l", dtype=object)}))

    p_side = strip_schema_metadata(
        part.select_columns(["p_partkey", "p_brand"])) \
        .map_batches(part_keys, batch_format="pandas")
    l_side = strip_schema_metadata(
        lineitem.select_columns(["l_partkey", "l_quantity",
                                 "l_extendedprice"])) \
        .map_batches(line_rows, batch_format="pandas")

    def partials(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "total_price_c2": pd.Series([], dtype="int64"),
            "qualifying_lines": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "_side" not in batch.columns:
            return arrow_out(empty)
        # a non-empty partition always emits ONE (possibly zero) row:
        # if every partition came back 0-row, the repartition(1) merge
        # block would be empty and map_batches skipped — dropping the
        # aggregate's mandatory single row (SQL returns one regardless)
        zero = pd.DataFrame({
            "total_price_c2": pd.Series([0], dtype="int64"),
            "qualifying_lines": pd.Series([0], dtype="int64")})
        tagged = set(batch.loc[batch["_side"] == "p", "key"])
        li = batch[(batch["_side"] == "l")
                   & batch["key"].isin(tagged)]
        if len(li) == 0:
            return arrow_out(zero)
        stats = li.groupby("key")["qty"].agg(["count", "sum"])
        cnt = stats["count"].loc[li["key"]].to_numpy(dtype=np.int64)
        sq = stats["sum"].loc[li["key"]].to_numpy(dtype=np.int64)
        m = 5 * li["qty"].to_numpy() * cnt < sq
        return arrow_out(pd.DataFrame({
            "total_price_c2":
                [int(li["price_c2"].to_numpy()[m].sum())],
            "qualifying_lines": [int(m.sum())]}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "total_price_c2" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "total_price_c2": pd.Series([0], dtype="int64"),
                "qualifying_lines": pd.Series([0], dtype="int64")}))
        return arrow_out(pd.DataFrame({
            "total_price_c2":
                [int(batch["total_price_c2"].sum())],
            "qualifying_lines":
                [int(batch["qualifying_lines"].sum())]}))

    return p_side.union(l_side) \
        .repartition(num_blocks=k, keys=["key"]) \
        .map_batches(partials, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def sole_return_suppliers(lineitem: ray.data.Dataset,
                          supplier: ray.data.Dataset, *,
                          returnflag: str = "R",
                          k: int = 100,
                          n_partitions: int | None = None
                          ) -> ray.data.Dataset:
    """TPC-H Q21 shape — EXISTS + NOT-EXISTS SELF-JOIN on the fact
    table: suppliers who were the SOLE returned supplier in
    multi-supplier orders (the "waiting suppliers" pattern, adapted to
    this schema's returnflag in place of commit/receipt dates).

    A supplier scores an order iff (a) one of its lines carries
    ``returnflag``, (b) EXISTS another supplier in the same order, and
    (c) NOT EXISTS another supplier whose line also carries the flag.
    Both quantifiers range over lines of the SAME order, so orderkey
    co-location makes them partition-local: per-batch combiners shed
    lines to (orderkey, suppkey, any_r=max) partials — mergeable by
    max, so batch boundaries never split a pair's evidence — ONE keyed
    exchange on orderkey, and the per-partition pass re-merges pairs,
    counts distinct and flagged suppliers per order, and emits
    (suppkey, numwait) partials.  The single-block merge sums, attaches
    names from the ray.put supplier broadcast, and takes the global
    top-``k`` (numwait desc, suppkey asc).

    Output: (s_suppkey, s_name, numwait).
    """
    import ray as _ray

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(lineitem)
    kparts = n_partitions or default_partitions()

    names_ref = _ray.put({int(r["s_suppkey"]): r["s_name"]
                          for r in supplier.take_all()})
    _memo: dict = {}

    def pair_partials(batch: pd.DataFrame) -> pa.Table:
        frame = pd.DataFrame({
            "key": batch["l_orderkey"].to_numpy(dtype=np.int64),
            "supp": batch["l_suppkey"].to_numpy(dtype=np.int64),
            "any_r": (batch["l_returnflag"] == returnflag)
                .to_numpy().astype(np.int64)})
        g = frame.groupby(["key", "supp"], as_index=False,
                          sort=False).max()
        return arrow_out(g)

    def order_scan(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "supp": pd.Series([], dtype="int64"),
            "numwait": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "key" not in batch.columns:
            return arrow_out(empty)
        pairs = batch.groupby(["key", "supp"], as_index=False,
                              sort=False).max()
        per_order = pairs.groupby("key")["any_r"] \
            .agg(nsupp="size", r_cnt="sum")
        ok = per_order.loc[pairs["key"]]
        m = (pairs["any_r"].to_numpy() == 1) \
            & (ok["nsupp"].to_numpy() > 1) \
            & (ok["r_cnt"].to_numpy() == 1)
        win = pairs[m]
        if len(win) == 0:
            return arrow_out(empty)
        g = win.groupby("supp", sort=False).size() \
            .reset_index(name="numwait")
        return arrow_out(pd.DataFrame({
            "supp": g["supp"].astype("int64"),
            "numwait": g["numwait"].astype("int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "numwait": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "supp" not in batch.columns:
            return arrow_out(empty)
        names = _memo.get("n")
        if names is None:
            names = _memo["n"] = _ray.get(names_ref)
        g = batch.groupby("supp", as_index=False, sort=False).sum() \
            .sort_values(["numwait", "supp"],
                         ascending=[False, True],
                         kind="stable").head(k)
        return arrow_out(pd.DataFrame({
            "s_suppkey": g["supp"].to_numpy(dtype=np.int64),
            "s_name": [names[int(s)] for s in g["supp"]],
            "numwait": g["numwait"].to_numpy(dtype=np.int64)}))

    return strip_schema_metadata(
        lineitem.select_columns(["l_orderkey", "l_suppkey",
                                 "l_returnflag"])) \
        .map_batches(pair_partials, batch_format="pandas") \
        .repartition(num_blocks=kparts, keys=["key"]) \
        .map_batches(order_scan, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def nation_volume_shipping(customer: ray.data.Dataset,
                           orders: ray.data.Dataset,
                           lineitem: ray.data.Dataset,
                           supplier: ray.data.Dataset,
                           nation: ray.data.Dataset, *,
                           nation_a: str = "NATION_19",
                           nation_b: str = "NATION_24",
                           date_lo: str = "1995-01-01",
                           date_hi: str = "1998-01-01",
                           n_partitions: int | None = None
                           ) -> ray.data.Dataset:
    """TPC-H Q7 shape — volume shipping between a NATION PAIR: revenue
    of lines a supplier in one nation shipped against orders of a
    customer in the other, by ship year and direction.

    Same star discipline as Q5 (region_nation_revenue): nation and
    supplier→nation are driver-collected dims shipped once via
    ray.put; customers are FILTERED to the two nations before the
    fact-side joins (orders ⋈ customer on custkey, lineitem partials ⋈
    that on orderkey — ids+cents only); lineitem sheds map-side to
    per-(orderkey, supp-nation, year) revenue combiners.  The final
    rollup is ≤ 2·|years| rows merged in one block.

    Output: (supp_nation, cust_nation, l_year, revenue_c4) ordered.
    """
    import ray as _ray

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(customer)
    ensure_hash_shuffle(orders)
    ensure_hash_shuffle(lineitem)
    k = n_partitions or default_partitions()
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    nk = {row["n_name"]: int(row["n_nationkey"])
          for row in nation.take_all()
          if row["n_name"] in (nation_a, nation_b)}
    names = {v: k2 for k2, v in nk.items()}
    pair_keys = set(nk.values())
    supp_nation = {int(r["s_suppkey"]): int(r["s_nationkey"])
                   for r in supplier.take_all()
                   if int(r["s_nationkey"]) in pair_keys}
    dims_ref = _ray.put((names, supp_nation))
    _memo: dict = {}

    def line_partials(batch: pd.DataFrame) -> pa.Table:
        lut = _memo.get("lut")
        if lut is None:
            _, s_map = _ray.get(dims_ref)
            size = (max(s_map) + 1) if s_map else 1
            lut = np.full(size, -1, dtype=np.int64)
            for s, n in s_map.items():
                lut[s] = n
            _memo["lut"] = lut
        d = batch["l_shipdate"].to_numpy(dtype="datetime64[us]")
        b = batch[(d >= lo) & (d < hi)]
        empty = pd.DataFrame({
            "l_orderkey": pd.Series([], dtype="int64"),
            "s_nationkey": pd.Series([], dtype="int64"),
            "l_year": pd.Series([], dtype="int64"),
            "revenue_c4": pd.Series([], dtype="int64")})
        if len(b) == 0:
            return arrow_out(empty)
        sk = b["l_suppkey"].to_numpy().astype(np.int64)
        in_range = (sk >= 0) & (sk < len(lut))
        s_nk = np.where(in_range, lut[np.clip(sk, 0, len(lut) - 1)],
                        -1)
        m = s_nk >= 0
        b = b[m]
        if len(b) == 0:
            return arrow_out(empty)
        price_c = _cents(b["l_extendedprice"])
        disc_bp = np.rint(b["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        years = b["l_shipdate"].to_numpy(dtype="datetime64[Y]") \
            .astype(np.int64) + 1970
        frame = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(),
            "s_nationkey": s_nk[m],
            "l_year": years,
            "revenue_c4": price_c * (100 - disc_bp)})
        return arrow_out(frame.groupby(
            ["l_orderkey", "s_nationkey", "l_year"],
            as_index=False, sort=False).sum())

    def cust_pair(batch: pd.DataFrame) -> pa.Table:
        b = batch[batch["c_nationkey"].astype(np.int64)
                  .isin(pair_keys)]
        return arrow_out(pd.DataFrame({
            "c_custkey": b["c_custkey"].to_numpy(dtype=np.int64),
            "c_nationkey": b["c_nationkey"].to_numpy(
                dtype=np.int64)}))

    cust = strip_schema_metadata(
        customer.select_columns(["c_custkey", "c_nationkey"])) \
        .map_batches(cust_pair, batch_format="pandas")
    ords = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_custkey"]))
    line = strip_schema_metadata(lineitem).map_batches(
        line_partials, batch_format="pandas")

    ord_cust = ords.join(cust, "inner", num_partitions=k,
                         on=("o_custkey",), right_on=("c_custkey",)) \
        .repartition(max(2, k // 8))  # scrub schema-less empties
    joined = line.join(ord_cust, "inner", num_partitions=k,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    empty = pd.DataFrame({
        "supp_nation": pd.Series([], dtype="object"),
        "cust_nation": pd.Series([], dtype="object"),
        "l_year": pd.Series([], dtype="int64"),
        "revenue_c4": pd.Series([], dtype="int64")})

    def pair_partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "s_nationkey" not in batch.columns:
            return arrow_out(empty)
        dims = _memo.get("d")
        if dims is None:
            dims = _memo["d"] = _ray.get(dims_ref)
        n_map, _ = dims
        b = batch[batch["s_nationkey"].to_numpy()
                  != batch["c_nationkey"].to_numpy()]
        if len(b) == 0:
            return arrow_out(empty)
        frame = pd.DataFrame({
            "supp_nation": [n_map[int(x)] for x in b["s_nationkey"]],
            "cust_nation": [n_map[int(x)] for x in b["c_nationkey"]],
            "l_year": b["l_year"].to_numpy(dtype=np.int64),
            "revenue_c4": b["revenue_c4"].to_numpy(dtype=np.int64)})
        return arrow_out(frame.groupby(
            ["supp_nation", "cust_nation", "l_year"],
            as_index=False, sort=False).sum())

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "supp_nation" not in batch.columns:
            return arrow_out(empty)
        return arrow_out(batch.groupby(
            ["supp_nation", "cust_nation", "l_year"],
            as_index=False, sort=True).sum())

    return joined.map_batches(pair_partials, batch_format="pandas",
                              batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def nation_market_share(customer: ray.data.Dataset,
                        orders: ray.data.Dataset,
                        lineitem: ray.data.Dataset,
                        supplier: ray.data.Dataset,
                        nation: ray.data.Dataset,
                        region: ray.data.Dataset,
                        part: ray.data.Dataset, *,
                        region_name: str = "MIDDLE EAST",
                        nation_name: str = "NATION_19",
                        type_name: str = "PROMO",
                        n_partitions: int | None = None
                        ) -> ray.data.Dataset:
    """TPC-H Q8 shape — MARKET SHARE: the fraction of a region's
    order volume (for one part type) supplied by one nation, per
    order year.

    Dims broadcast (Q14/Q5 rules): the part-type flag is a dense bool
    LUT built from (p_partkey, flag) projections; supplier→is-nation
    a dense LUT; the region's customer nation keys a tiny set.  Facts
    join on ids only (orders window ⋈ region customers on custkey,
    then flagged lineitem revenue combiners on orderkey).  Numerator
    and denominator are exact c4 integers summed in one bounded
    merge; the share is a floor-6 double derived from them.

    Output: (o_year, nation_revenue_c4, total_revenue_c4, mkt_share).
    """
    import ray as _ray

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(customer)
    ensure_hash_shuffle(orders)
    ensure_hash_shuffle(lineitem)
    k = n_partitions or default_partitions()

    region_keys = {int(r["r_regionkey"]) for r in region.take_all()
                   if r["r_name"] == region_name}
    nation_rows = nation.take_all()
    region_nations = {int(r["n_nationkey"]) for r in nation_rows
                      if int(r["n_regionkey"]) in region_keys}
    x_keys = {int(r["n_nationkey"]) for r in nation_rows
              if r["n_name"] == nation_name}
    supp_is_x = {int(r["s_suppkey"]):
                 int(int(r["s_nationkey"]) in x_keys)
                 for r in supplier.take_all()}
    # part flag: project to (p_partkey, flag) BEFORE the driver pull
    # (round-4 verdict item 5 discipline)
    flag_rows = part.select_columns(["p_partkey", "p_type"]) \
        .map_batches(lambda b: pa.table({
            "p_partkey": b.column("p_partkey"),
            "flag": pa.compute.equal(b.column("p_type"), type_name)}),
            batch_format="pyarrow").take_all()
    part_flag = {int(r["p_partkey"]): bool(r["flag"])
                 for r in flag_rows if r["flag"]}
    dims_ref = _ray.put((supp_is_x, part_flag))
    _memo: dict = {}

    def _luts():
        luts = _memo.get("luts")
        if luts is None:
            s_map, p_map = _ray.get(dims_ref)
            s_size = (max(s_map) + 1) if s_map else 1
            s_lut = np.zeros(s_size, dtype=np.int64)
            for s, v in s_map.items():
                s_lut[s] = v
            p_size = (max(p_map) + 1) if p_map else 1
            p_lut = np.zeros(p_size, dtype=bool)
            for p in p_map:
                p_lut[p] = True
            luts = _memo["luts"] = (s_lut, p_lut)
        return luts

    def line_partials(batch: pd.DataFrame) -> pa.Table:
        s_lut, p_lut = _luts()
        pk = batch["l_partkey"].to_numpy().astype(np.int64)
        ok = (pk >= 0) & (pk < len(p_lut))
        flag = np.zeros(len(batch), dtype=bool)
        flag[ok] = p_lut[pk[ok]]
        b = batch[flag]
        empty = pd.DataFrame({
            "l_orderkey": pd.Series([], dtype="int64"),
            "is_x": pd.Series([], dtype="int64"),
            "revenue_c4": pd.Series([], dtype="int64")})
        if len(b) == 0:
            return arrow_out(empty)
        sk = b["l_suppkey"].to_numpy().astype(np.int64)
        in_s = (sk >= 0) & (sk < len(s_lut))
        is_x = np.where(in_s, s_lut[np.clip(sk, 0, len(s_lut) - 1)],
                        0)
        price_c = _cents(b["l_extendedprice"])
        disc_bp = np.rint(b["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        frame = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(),
            "is_x": is_x,
            "revenue_c4": price_c * (100 - disc_bp)})
        return arrow_out(frame.groupby(
            ["l_orderkey", "is_x"], as_index=False,
            sort=False).sum())

    def cust_region(batch: pd.DataFrame) -> pa.Table:
        b = batch[batch["c_nationkey"].astype(np.int64)
                  .isin(region_nations)]
        return arrow_out(pd.DataFrame({
            "c_custkey": b["c_custkey"].to_numpy(dtype=np.int64)}))

    def order_year(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(pd.DataFrame({
            "o_orderkey": batch["o_orderkey"].to_numpy(
                dtype=np.int64),
            "o_custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
            "o_year": batch["o_orderdate"]
                .to_numpy(dtype="datetime64[Y]")
                .astype(np.int64) + 1970}))

    cust = strip_schema_metadata(
        customer.select_columns(["c_custkey", "c_nationkey"])) \
        .map_batches(cust_region, batch_format="pandas")
    ords = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_custkey",
                               "o_orderdate"])) \
        .map_batches(order_year, batch_format="pandas")
    line = strip_schema_metadata(lineitem).map_batches(
        line_partials, batch_format="pandas")

    ord_cust = ords.join(cust, "inner", num_partitions=k,
                         on=("o_custkey",), right_on=("c_custkey",)) \
        .repartition(max(2, k // 8))
    joined = line.join(ord_cust, "inner", num_partitions=k,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    empty_p = pd.DataFrame({
        "o_year": pd.Series([], dtype="int64"),
        "nation_revenue_c4": pd.Series([], dtype="int64"),
        "total_revenue_c4": pd.Series([], dtype="int64")})

    def year_partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "o_year" not in batch.columns:
            return arrow_out(empty_p)
        rev = batch["revenue_c4"].to_numpy(dtype=np.int64)
        frame = pd.DataFrame({
            "o_year": batch["o_year"].to_numpy(dtype=np.int64),
            "nation_revenue_c4":
                rev * batch["is_x"].to_numpy(dtype=np.int64),
            "total_revenue_c4": rev})
        return arrow_out(frame.groupby("o_year", as_index=False,
                                       sort=False).sum())

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "o_year" not in batch.columns:
            return arrow_out(empty_p.assign(
                mkt_share=pd.Series([], dtype="float64")))
        g = batch.groupby("o_year", as_index=False, sort=True).sum()
        g["mkt_share"] = np.floor(
            g["nation_revenue_c4"].to_numpy()
            / g["total_revenue_c4"].to_numpy() * 1e6) / 1e6
        return arrow_out(g)

    return joined.map_batches(year_partials, batch_format="pandas",
                              batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def customer_cumulative_spend(orders: ray.data.Dataset, *,
                              n_partitions: int | None = None
                              ) -> ray.data.Dataset:
    """Per-key running balance: each order annotated with its
    customer's cumulative spend so far (order date then orderkey
    order) — the windowed-cumsum ledger shape (account balances,
    LTV-to-date, budget burndown).

    Shape: ONE custkey-keyed exchange, then a per-partition
    vectorized pass (lexsort + per-customer segmented cumsum — a
    global cumsum minus each segment's offset, no Python loop).
    Money is exact integer cents (the module's fixed-point rule), so
    the running sums are associative and bit-equal to the SQL window.

    Output: (o_orderkey, o_custkey, cum_spend_cents).
    """
    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(orders)
    k = n_partitions or default_partitions()

    def per_partition(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "o_custkey" not in batch.columns:
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "cum_spend_cents": pa.array([], pa.int64())})
        cust = batch["o_custkey"].to_numpy(dtype=np.int64)
        okey = batch["o_orderkey"].to_numpy(dtype=np.int64)
        odate = batch["o_orderdate"] \
            .to_numpy(dtype="datetime64[us]").astype("int64")
        cents = _cents(batch["o_totalprice"])
        order = np.lexsort((okey, odate, cust))
        cust, okey, cents = cust[order], okey[order], cents[order]
        run = np.cumsum(cents)
        starts = np.empty(len(cust), dtype=bool)
        starts[0] = True
        starts[1:] = cust[1:] != cust[:-1]
        seg = np.cumsum(starts) - 1
        # offset of each segment = running total just before it
        seg_off = np.concatenate(
            ([0], run[np.flatnonzero(starts)[1:] - 1]))
        cum = run - seg_off[seg]
        return pa.table({
            "o_orderkey": pa.array(okey),
            "o_custkey": pa.array(cust),
            "cum_spend_cents": pa.array(cum.astype(np.int64))})

    return strip_schema_metadata(orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])) \
        .repartition(num_blocks=k, keys=["o_custkey"]) \
        .map_batches(per_partition, batch_format="pandas",
                     batch_size=None)


def ship_lag_histogram(orders: ray.data.Dataset,
                       lineitem: ray.data.Dataset, *,
                       n_partitions: int | None = None
                       ) -> ray.data.Dataset:
    """Order→ship latency distribution: for every lineitem, the days
    between its order's date and its ship date, rolled into a bounded
    day histogram — the fulfillment-SLA shape (latency percentiles
    fall out of the cumulative counts).

    Shape: both sides project to ids+dates and co-locate on the
    orderkey via the union idiom (no Acero join); the per-partition
    pass is a vectorized date map + lag + local histogram partial;
    lags are BOUNDED (TPC-H ships within ~4 months), so the merge is
    the repartition(1) + pandas shape.  Day arithmetic is integer
    epoch-µs floor division, mirrored exactly in the oracle.

    Output: (lag_days, n_items) ordered by lag_days.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(orders)
    ensure_hash_shuffle(lineitem)
    k = n_partitions or default_partitions()
    US_PER_DAY = 86_400_000_000

    def order_side(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(pd.DataFrame({
            "key": batch["o_orderkey"].to_numpy(dtype=np.int64),
            "d": batch["o_orderdate"]
            .to_numpy(dtype="datetime64[us]").astype("int64"),
            "_side": np.full(len(batch), "o", dtype=object)}))

    def line_side(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(pd.DataFrame({
            "key": batch["l_orderkey"].to_numpy(dtype=np.int64),
            "d": batch["l_shipdate"]
            .to_numpy(dtype="datetime64[us]").astype("int64"),
            "_side": np.full(len(batch), "l", dtype=object)}))

    def lag_partial(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "lag_days": pd.Series([], dtype="int64"),
            "n_items": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "_side" not in batch.columns:
            return arrow_out(empty)
        o = batch[batch["_side"] == "o"].set_index("key")["d"]
        li = batch[batch["_side"] == "l"]
        if len(li) == 0 or len(o) == 0:
            return arrow_out(empty)
        odate = o.loc[li["key"]].to_numpy(dtype=np.int64)
        lag = (li["d"].to_numpy(dtype=np.int64) - odate) \
            // US_PER_DAY
        vc = pd.Series(lag).value_counts()
        return arrow_out(pd.DataFrame({
            "lag_days": vc.index.to_numpy(dtype=np.int64),
            "n_items": vc.to_numpy(dtype=np.int64)}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "lag_days": pd.Series([], dtype="int64"),
            "n_items": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "lag_days" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby("lag_days", as_index=False, sort=True) \
            .sum()
        g["n_items"] = g["n_items"].astype("int64")
        return arrow_out(g)

    o_rows = strip_schema_metadata(
        orders.select_columns(["o_orderkey", "o_orderdate"])) \
        .map_batches(order_side, batch_format="pandas")
    l_rows = strip_schema_metadata(
        lineitem.select_columns(["l_orderkey", "l_shipdate"])) \
        .map_batches(line_side, batch_format="pandas")
    ensure_hash_shuffle(o_rows)
    ensure_hash_shuffle(l_rows)
    return o_rows.union(l_rows) \
        .repartition(num_blocks=k, keys=["key"]) \
        .map_batches(lag_partial, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def rfm_segments(orders: ray.data.Dataset, *,
                 n_partitions: int | None = None
                 ) -> ray.data.Dataset:
    """RFM customer segmentation (recency / frequency / monetary
    terciles — the classic CRM cohorting): each customer scores
    R = days since their last order (vs the global max order date),
    F = order count, M = lifetime spend in exact cents; each
    dimension splits at its 1/3 and 2/3 nearest-rank quantiles over
    customers (quantile_disc semantics, probed against DuckDB at the
    thirds), and customers roll up into the ≤27 (r,f,m) segments.

    Shape: ONE custkey-keyed exchange gives exact per-customer RFM
    (all a customer's orders co-locate); tercile thresholds come from
    per-dimension VALUE HISTOGRAMS (per-partition value-count
    partials, one tiny driver pull — the exchange moves O(distinct
    values), which for R/F is bounded outright and for M is bounded
    by the distinct-cents domain, the doc_length_percentiles shape);
    the final pass re-scans the materialized per-customer table with
    the six thresholds closed over and emits bounded segment counts.

    Output: (r_seg, f_seg, m_seg, n_customers), segments 1..3 (1 =
    lowest raw value: most-recent R, fewest orders F, lowest spend
    M), ordered by (r_seg, f_seg, m_seg).
    """
    import math

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(orders)
    k = n_partitions or default_partitions()
    US_PER_DAY = 86_400_000_000

    max_date = int(pd.Timestamp(
        orders.max("o_orderdate")).value // 1000)  # ns → µs

    def per_customer(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "c": pd.Series([], dtype="int64"),
            "r": pd.Series([], dtype="int64"),
            "f": pd.Series([], dtype="int64"),
            "m": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "o_custkey" not in batch.columns:
            return arrow_out(empty)
        d = batch["o_orderdate"] \
            .to_numpy(dtype="datetime64[us]").astype("int64")
        g = pd.DataFrame({
            "c": batch["o_custkey"].to_numpy(dtype=np.int64),
            "d": d,
            "m": _cents(batch["o_totalprice"])}) \
            .groupby("c", sort=False) \
            .agg(last=("d", "max"), f=("d", "size"), m=("m", "sum")) \
            .reset_index()
        return arrow_out(pd.DataFrame({
            "c": g["c"].astype("int64"),
            "r": ((max_date - g["last"].to_numpy(dtype=np.int64))
                  // US_PER_DAY),
            "f": g["f"].astype("int64"),
            "m": g["m"].astype("int64")}))

    rfm = strip_schema_metadata(orders.select_columns(
        ["o_custkey", "o_orderdate", "o_totalprice"])) \
        .repartition(num_blocks=k, keys=["o_custkey"]) \
        .map_batches(per_customer, batch_format="pandas",
                     batch_size=None).materialize()

    def hist_partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "c" not in batch.columns:
            return pa.table({"dim": pa.array([], pa.string()),
                             "v": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        dims, vs, cnts = [], [], []
        for dim in ("r", "f", "m"):
            vc = batch[dim].value_counts()
            dims += [dim] * len(vc)
            vs += vc.index.tolist()
            cnts += vc.tolist()
        return pa.table({"dim": pa.array(dims, pa.string()),
                         "v": pa.array(vs, pa.int64()),
                         "cnt": pa.array(cnts, pa.int64())})

    hist = pd.DataFrame(rfm.map_batches(
        hist_partials, batch_format="pandas").take_all())
    thresholds = {}
    for dim in ("r", "f", "m"):
        h = hist[hist["dim"] == dim].groupby("v")["cnt"].sum() \
            .sort_index()
        cum = h.to_numpy().cumsum()
        n = int(cum[-1])
        vals = h.index.to_numpy()
        t = []
        for q in (1 / 3, 2 / 3):
            rank = max(1, math.ceil(q * n))
            t.append(int(vals[np.searchsorted(cum, rank)]))
        thresholds[dim] = t

    def segment(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "r_seg": pd.Series([], dtype="int64"),
            "f_seg": pd.Series([], dtype="int64"),
            "m_seg": pd.Series([], dtype="int64"),
            "n_customers": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "c" not in batch.columns:
            return arrow_out(empty)

        def seg(x, t):
            return np.where(x <= t[0], 1,
                            np.where(x <= t[1], 2, 3))

        g = pd.DataFrame({
            "r_seg": seg(batch["r"].to_numpy(dtype=np.int64),
                         thresholds["r"]),
            "f_seg": seg(batch["f"].to_numpy(dtype=np.int64),
                         thresholds["f"]),
            "m_seg": seg(batch["m"].to_numpy(dtype=np.int64),
                         thresholds["m"])}) \
            .groupby(["r_seg", "f_seg", "m_seg"], sort=False) \
            .size().reset_index(name="n_customers")
        return arrow_out(g.astype("int64"))

    def merge(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "r_seg": pd.Series([], dtype="int64"),
            "f_seg": pd.Series([], dtype="int64"),
            "m_seg": pd.Series([], dtype="int64"),
            "n_customers": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "r_seg" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby(["r_seg", "f_seg", "m_seg"],
                          as_index=False, sort=True).sum()
        g["n_customers"] = g["n_customers"].astype("int64")
        return arrow_out(g)

    return rfm.map_batches(segment, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)
