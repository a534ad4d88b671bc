"""Referential-integrity audit — the cross-table data-quality gate a
warehouse runs before trusting a corpus drop: for every foreign-key
edge, how many child rows / distinct child keys point at a parent key
that doesn't exist (plus NULL foreign keys, a separate violation
class).

Scale shape: ids-only, ONE exchange for ALL edges.  Each child table
ships per-batch (edge, key, n-rows) combiners, each parent ships its
distinct (edge, key) ids, everything unions into a single composite
(edge, key)-keyed repartition — never one exchange per edge: a lazy
plan accreting 7 shuffle operators deadlocks small boxes, and at
cluster scale the composite key amortizes shuffle spin-up across
edges.  The per-partition pass resolves orphans locally (a child key's
parent presence is total after co-location), emitting bounded
(edge, 5-counter) partials merged in one block.

No reference counterpart (corpus-level operator); oracle = per-edge
LEFT JOIN of distinct child keys against distinct parent keys,
UNION ALL across edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .util import arrow_out, strip_schema_metadata


def referential_integrity(
        edges: list[tuple[ray.data.Dataset, str,
                          ray.data.Dataset, str, str]], *,
        n_partitions: int | None = None) -> ray.data.Dataset:
    """``edges`` = [(child_ds, fk_col, parent_ds, pk_col, edge_name)].

    Output: one row per edge, ordered by edge name —
    (edge, n_null_fk, n_child_rows, n_child_keys, n_orphan_keys,
    n_orphan_rows); n_child_rows/keys exclude NULL foreign keys.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    k = n_partitions or default_partitions()

    # Regroup edges by TABLE so each table is read and mapped ONCE,
    # emitting every role (child fk counts / parent pk ids) from one
    # pass — a per-edge branch pair would put 2x|edges| operator
    # chains in the plan and re-scan hot tables once per edge.
    roles: dict[int, dict] = {}

    def add_role(ds, role, col, name):
        ent = roles.setdefault(id(ds), {"ds": ds, "roles": []})
        ent["roles"].append((role, col, name))

    for child, fk, parent, pk, name in edges:
        add_role(child, "c", fk, name)
        add_role(parent, "p", pk, name)

    sides = []
    for ent in roles.values():
        ds, role_list = ent["ds"], ent["roles"]
        # union carries the FIRST input's context snapshot — flip all
        ensure_hash_shuffle(ds)
        cols = sorted({c for _, c, _ in role_list})

        def emit(batch: pd.DataFrame, role_list=role_list
                 ) -> pa.Table:
            frames = []
            for role, col, name in role_list:
                if role == "c":
                    s = batch[col]
                    nulls = int(s.isna().sum())
                    g = s.dropna().astype(np.int64) \
                        .value_counts(sort=False)
                    keys = g.index.to_numpy(dtype=np.int64)
                    n = g.to_numpy(dtype=np.int64)
                    side = np.full(len(keys), "c", dtype=object)
                    if nulls:
                        keys = np.concatenate([keys, [0]])
                        n = np.concatenate([n, [nulls]])
                        side = np.concatenate([side, ["nul"]])
                else:
                    keys = batch[col].dropna().astype(np.int64) \
                        .unique()
                    n = np.zeros(len(keys), dtype=np.int64)
                    side = np.full(len(keys), "p", dtype=object)
                frames.append(pd.DataFrame({
                    "edge": np.full(len(keys), name, dtype=object),
                    "key": keys, "n": n, "side": side}))
            return arrow_out(pd.concat(frames, ignore_index=True))

        sides.append(strip_schema_metadata(ds.select_columns(cols))
                     .map_batches(emit, batch_format="pandas"))

    unioned = sides[0]
    for s in sides[1:]:
        unioned = unioned.union(s)

    OUT_COLS = ["edge", "n_null_fk", "n_child_rows", "n_child_keys",
                "n_orphan_keys", "n_orphan_rows"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "edge": pd.Series([], dtype="object"),
            **{c: pd.Series([], dtype="int64")
               for c in OUT_COLS[1:]}})

    def partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "side" not in batch.columns:
            return arrow_out(_empty())
        nul = batch[batch["side"] == "nul"] \
            .groupby("edge", sort=False)["n"].sum()
        c = batch[batch["side"] == "c"] \
            .groupby(["edge", "key"], as_index=False, sort=False) \
            ["n"].sum()
        p = batch.loc[batch["side"] == "p", ["edge", "key"]] \
            .drop_duplicates()
        m = c.merge(p.assign(_has=1), on=["edge", "key"], how="left")
        orphan = m["_has"].isna()
        g = m.groupby("edge", sort=False)
        rows = pd.DataFrame({
            "n_child_rows": g["n"].sum(),
            "n_child_keys": g.size(),
            "n_orphan_keys": orphan.groupby(m["edge"]).sum(),
            "n_orphan_rows": m["n"].where(orphan, 0)
                .groupby(m["edge"]).sum(),
        })
        edges_seen = sorted(set(rows.index) | set(nul.index))
        out = pd.DataFrame({
            "edge": edges_seen,
            "n_null_fk": [int(nul.get(e, 0)) for e in edges_seen],
            **{c2: [int(rows[c2].get(e, 0)) for e in edges_seen]
               for c2 in ["n_child_rows", "n_child_keys",
                          "n_orphan_keys", "n_orphan_rows"]}})
        return arrow_out(out)

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "edge" not in batch.columns:
            return arrow_out(_empty())
        g = batch.groupby("edge", as_index=False, sort=True) \
            [OUT_COLS[1:]].sum()
        for c in OUT_COLS[1:]:
            g[c] = g[c].astype("int64")
        return arrow_out(g.reset_index(drop=True))

    return unioned \
        .repartition(num_blocks=k, keys=["edge", "key"]) \
        .map_batches(partials, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


_TPCH_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_integrity(sf_dir: str, *,
                 n_partitions: int | None = None) -> ray.data.Dataset:
    """The full relational-schema audit over the seven TPC-H-shaped
    foreign-key edges in the corpus."""
    tables: dict[str, ray.data.Dataset] = {}

    def tab(name: str) -> ray.data.Dataset:
        if name not in tables:
            tables[name] = ray.data.read_parquet(
                f"{sf_dir}/{name}.parquet")
        return tables[name]

    edges = [(tab(c), fk, tab(p), pk, f"{c}.{fk}->{p}.{pk}")
             for c, fk, p, pk in _TPCH_EDGES]
    return referential_integrity(edges, n_partitions=n_partitions)
