"""Link-graph operators over the extracted web graph: distributed
PageRank (Brin & Page 1998; damping + uniform dangling-mass
redistribution — the formulation every crawl-curation quality signal
uses, e.g. Common Crawl's host-level ranks).

Scale shape — the same per-round discipline as ``near_dup_keepers``
(label propagation) and ``kmeans_assign`` (Lloyd):

- Nodes and out-degrees are derived once (one src-keyed exchange).
- Each power-iteration round does TWO keyed exchanges of small rows:
  (1) ranks and edges co-locate on the SOURCE key (union + keyed
  repartition — the engine's no-Acero join idiom) where each partition
  emits (dst, rank/out_degree) contribution rows and a per-partition
  dangling-mass partial; (2) contributions and the node table co-locate
  on the NODE key where the new rank = (1-d)/N + d·(Σ contribs +
  dangling/N) is a vectorized per-partition sum.  The rank table is
  re-materialized per round (flat plans; an accreting >4-shuffle lazy
  plan deadlocks small boxes), and only (node, float) / (src, dst)
  rows ever cross an exchange — never any document payload.
- The dangling mass (one float per round) is the only driver hop.

Float caveat: distributed summation order is not fixed, so ranks are
reproducible to ~1e-12 relative (tests compare against a dense numpy
power iteration with that tolerance), not bit-identical — the honest
contract for any distributed float reduce; the driver query is
rows-only accordingly.

No reference counterpart at corpus level; the per-page link extraction
feeding the edge list reimplements /root/reference/src/extract/
extractLinks + analyzeLinkHierarchy (see hierarchy.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata


def pagerank(edges: ray.data.Dataset, *, damping: float = 0.85,
             n_iter: int = 10, src_col: str = "src",
             dst_col: str = "dst",
             n_partitions: int | None = None) -> ray.data.Dataset:
    """PageRank over a directed edge list.  Duplicate edges count once
    (the adjacency is deduped); nodes are everything appearing as a
    source or destination; dangling mass is redistributed uniformly.

    Output: (node, rank) — ranks sum to 1 (up to float error).
    """
    import ray

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(edges)
    n_parts = n_partitions or default_partitions()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch.column(src_col).cast(pa.string()),
            "dst": batch.column(dst_col).cast(pa.string()),
        })

    e = strip_schema_metadata(edges.select_columns([src_col, dst_col])) \
        .map_batches(project, batch_format="pyarrow")

    def dedupe_edges(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "src" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "src": pd.Series([], dtype="object"),
                "dst": pd.Series([], dtype="object")}))
        return arrow_out(batch.drop_duplicates(["src", "dst"])
                         .reset_index(drop=True))

    e = e.repartition(num_blocks=n_parts, keys=["src"]) \
        .map_batches(dedupe_edges, batch_format="pandas",
                     batch_size=None).materialize()

    # node table: distinct src ∪ dst (one node-keyed exchange)
    def explode_nodes(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string())})
        return pa.table({"node": pa.chunked_array(
            [*batch.column("src").cast(pa.string()).chunks,
             *batch.column("dst").cast(pa.string()).chunks])})

    def distinct_nodes(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "node" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "node": pd.Series([], dtype="object")}))
        return arrow_out(pd.DataFrame(
            {"node": batch["node"].drop_duplicates()
             .reset_index(drop=True)}))

    nodes = e.map_batches(explode_nodes, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["node"]) \
        .map_batches(distinct_nodes, batch_format="pandas",
                     batch_size=None).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table({"node": pa.array([], pa.string()),
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow")

    def init_ranks(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "rank": pa.array([], pa.float64())})
        return pa.table({
            "node": batch.column("node"),
            "rank": pa.array(
                np.full(batch.num_rows, 1.0 / n_nodes), pa.float64()),
        })

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow") \
        .materialize()

    # tagging for the union idiom: edge rows have rank = NULL,
    # rank rows have dst = NULL
    def tag_edges(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({
                "node": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
                "rank": pa.array([], pa.float64())})
        return pa.table({
            "node": batch.column("src"),
            "dst": batch.column("dst"),
            "rank": pa.array([None] * batch.num_rows, pa.float64())})

    tagged_edges = e.map_batches(tag_edges, batch_format="pyarrow") \
        .materialize()

    def tag_ranks(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({
                "node": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
                "rank": pa.array([], pa.float64())})
        return pa.table({
            "node": batch.column("node"),
            "dst": pa.array([None] * batch.num_rows, pa.string()),
            "rank": batch.column("rank")})

    base = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        mixed = ranks.map_batches(tag_ranks, batch_format="pyarrow") \
            .union(tagged_edges)

        def contribs(batch: pd.DataFrame) -> pa.Table:
            # src-key partition: every edge of a node sits with its rank
            if len(batch) == 0 or "node" not in batch.columns:
                return arrow_out(pd.DataFrame({
                    "dst": pd.Series([], dtype="object"),
                    "contrib": pd.Series([], dtype="float64"),
                    "dangling": pd.Series([], dtype="float64")}))
            is_rank = batch["dst"].isna()
            r = batch.loc[is_rank, ["node", "rank"]]
            ed = batch.loc[~is_rank, ["node", "dst"]]
            deg = ed.groupby("node", sort=False).size()
            r = r.assign(deg=r["node"].map(deg).fillna(0))
            dangling = float(r.loc[r["deg"] == 0, "rank"].sum())
            live = r[r["deg"] > 0]
            m = ed.merge(live, on="node", how="inner")
            out = pd.DataFrame({
                "dst": m["dst"],
                "contrib": m["rank"] / m["deg"],
            })
            out["dangling"] = 0.0
            if dangling:
                out = pd.concat([out, pd.DataFrame(
                    {"dst": [None], "contrib": [0.0],
                     "dangling": [dangling]})], ignore_index=True)
            return arrow_out(out)

        contrib_ds = mixed \
            .repartition(num_blocks=n_parts, keys=["node"]) \
            .map_batches(contribs, batch_format="pandas",
                         batch_size=None).materialize()
        # tree-reduce, one float to the driver
        dangling_total = contrib_ds.sum("dangling") or 0.0
        extra = damping * dangling_total / n_nodes

        def tag_contrib(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table({
                    "node": pa.array([], pa.string()),
                    "contrib": pa.array([], pa.float64())})
            t = batch.filter(pa.compute.is_valid(batch.column("dst")))
            return pa.table({"node": t.column("dst"),
                             "contrib": t.column("contrib")})

        def tag_node(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table({
                    "node": pa.array([], pa.string()),
                    "contrib": pa.array([], pa.float64())})
            return pa.table({
                "node": batch.column("node"),
                "contrib": pa.array(
                    np.full(batch.num_rows, np.nan), pa.float64())})

        mixed2 = nodes.map_batches(tag_node, batch_format="pyarrow") \
            .union(contrib_ds.map_batches(tag_contrib,
                                          batch_format="pyarrow"))

        def new_ranks(batch: pd.DataFrame, *, extra=extra) -> pa.Table:
            if len(batch) == 0 or "node" not in batch.columns:
                return arrow_out(pd.DataFrame({
                    "node": pd.Series([], dtype="object"),
                    "rank": pd.Series([], dtype="float64")}))
            is_node = batch["contrib"].isna()
            sums = batch.loc[~is_node].groupby(
                "node", sort=False)["contrib"].sum()
            out = batch.loc[is_node, ["node"]].copy()
            out["rank"] = base + damping * \
                out["node"].map(sums).fillna(0.0) + extra
            return arrow_out(out.reset_index(drop=True))

        ranks = mixed2.repartition(num_blocks=n_parts, keys=["node"]) \
            .map_batches(new_ranks, batch_format="pandas",
                         batch_size=None).materialize()

    return ranks
