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


def synthetic_doc_edges(docs: ray.data.Dataset, *, divisor: int = 4,
                        n_partitions: int | None = None
                        ) -> ray.data.Dataset:
    """Deterministic pseudo-random graph derived from the documents
    table (the restricted-family oracle technique): one undirected
    edge per document with endpoints ``md5_64('ga:'+doc_id) % N`` and
    ``md5_64('gb:'+doc_id) % N``, ``N = max(16, ndocs // divisor)`` —
    an Erdős–Rényi-style multigraph of average degree ~2·divisor whose
    construction a SQL oracle re-derives byte-for-byte (md5-LE uint64,
    the MD5_64_LE_SQL helper).  Self-loops dropped, endpoints
    canonicalized ``a < b``, exact-deduped on ONE keyed exchange.

    Output: (a, b) int64, a < b, distinct.
    """
    import hashlib
    import struct

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(docs)
    k = n_partitions or default_partitions()
    n_nodes = max(16, docs.count() // divisor)

    def edge_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        a = np.fromiter(
            (struct.unpack("<Q", hashlib.md5(
                f"ga:{i}".encode()).digest()[:8])[0] % n_nodes
             for i in ids), dtype=np.int64, count=len(ids))
        b = np.fromiter(
            (struct.unpack("<Q", hashlib.md5(
                f"gb:{i}".encode()).digest()[:8])[0] % n_nodes
             for i in ids), dtype=np.int64, count=len(ids))
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi
        return pa.table({"a": pa.array(lo[m]), "b": pa.array(hi[m])})

    def dedupe(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "a" not in batch.columns:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return arrow_out(batch.drop_duplicates(["a", "b"])
                         .reset_index(drop=True))

    return strip_schema_metadata(docs.select_columns(["doc_id"])) \
        .map_batches(edge_rows, batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["a"]) \
        .map_batches(dedupe, batch_format="pandas", batch_size=None)


def graph_components(edges: ray.data.Dataset, *, n_iter: int = 16,
                     n_partitions: int | None = None
                     ) -> ray.data.Dataset:
    """Connected components over an undirected edge list — min-label
    propagation via the same monotone-convergent machinery as
    near_dup_keepers (dedup.py), surfaced as a first-class graph
    operator: component id = smallest node id reachable.

    Output: (node, component) for every node with at least one edge.
    """
    from .dedup import near_dup_keepers

    def as_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        return pa.table({"doc_a": batch.column("a"),
                         "doc_b": batch.column("b")})

    keepers = near_dup_keepers(
        edges.map_batches(as_pairs, batch_format="pyarrow"),
        n_iter=n_iter, n_partitions=n_partitions)

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "component": pa.array([], pa.int64())})
        return pa.table({"node": batch.column("doc_id"),
                         "component": batch.column("keeper_doc_id")})

    return keepers.map_batches(rename, batch_format="pyarrow")


def triangle_count(edges: ray.data.Dataset, *,
                   n_partitions: int | None = None
                   ) -> ray.data.Dataset:
    """Distributed triangle counting — the degree-ordered
    node-iterator (Suri & Vassilvitskii 2011 / Cohen 2009 MapReduce
    formulation): orient every canonical edge from its lower-
    (degree, id) endpoint to the higher, generate each node's
    out-neighbor pairs (wedges), and count wedges closed by an
    oriented edge.  The orientation bounds every out-degree by
    O(√m), so total wedges are O(m^1.5) instead of Σdeg² — THE
    difference between feasible and explosive on a power-law web
    graph.  Each triangle is counted exactly once (at its smallest
    endpoint in orientation order).

    Exchanges (all ids-only): canonical dedup (reuses the input),
    degree build, two degree-attach union exchanges, wedge
    co-location on the pivot, wedge↔edge match on the closing
    endpoint — every intermediate is materialized so no lazy plan
    accretes >4 shuffles (CLAUDE.md small-box rule).  Wedge pair
    generation is fully vectorized (repeat + intra-run arange — no
    per-node Python loop).

    Output: one row (n_edges, n_triangles).
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(edges)
    k = n_partitions or default_partitions()

    canon = strip_schema_metadata(edges.select_columns(["a", "b"])) \
        .materialize()
    ensure_hash_shuffle(canon)  # materialize re-snapshots the context
    n_edges = canon.count()

    # -- degrees: per-batch combiners → one node-keyed exchange -------
    def degree_partials(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        nodes = pa.chunked_array(
            [*batch.column("a").chunks, *batch.column("b").chunks])
        g = pa.table({"node": nodes}).group_by("node") \
            .aggregate([("node", "count")])
        return pa.table({"node": g.column("node"),
                         "deg": g.column("node_count")
                         .cast(pa.int64())})

    def degree_merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "node" not in batch.columns:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        g = batch.groupby("node", as_index=False, sort=False).sum()
        return arrow_out(g)

    degrees = canon.map_batches(degree_partials,
                                batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["node"]) \
        .map_batches(degree_merge, batch_format="pandas",
                     batch_size=None).materialize()
    ensure_hash_shuffle(degrees)

    # -- attach deg to each endpoint (two union exchanges; the degree
    #    table is node-sized so it is never broadcast) ----------------
    def attach(ds_edges, key_col, other_cols, out_col):
        def edge_side(batch: pd.DataFrame) -> pa.Table:
            cols = {"key": batch[key_col].to_numpy(dtype=np.int64)}
            for c in other_cols:
                cols[c] = batch[c].to_numpy(dtype=np.int64)
            cols["deg"] = np.full(len(batch), -1, dtype=np.int64)
            cols["_side"] = np.full(len(batch), "e", dtype=object)
            return arrow_out(pd.DataFrame(cols))

        def deg_side(batch: pd.DataFrame) -> pa.Table:
            cols = {"key": batch["node"].to_numpy(dtype=np.int64)}
            for c in other_cols:
                cols[c] = np.zeros(len(batch), dtype=np.int64)
            cols["deg"] = batch["deg"].to_numpy(dtype=np.int64)
            cols["_side"] = np.full(len(batch), "d", dtype=object)
            return arrow_out(pd.DataFrame(cols))

        empty = {key_col: pd.Series([], dtype="int64")}
        for c in other_cols:
            empty[c] = pd.Series([], dtype="int64")
        empty[out_col] = pd.Series([], dtype="int64")

        def join_local(batch: pd.DataFrame) -> pa.Table:
            if len(batch) == 0 or "_side" not in batch.columns:
                return arrow_out(pd.DataFrame(empty))
            d = batch[batch["_side"] == "d"].set_index("key")["deg"]
            e = batch[batch["_side"] == "e"]
            if len(e) == 0:
                return arrow_out(pd.DataFrame(empty))
            out = {key_col: e["key"].to_numpy(dtype=np.int64)}
            for c in other_cols:
                out[c] = e[c].to_numpy(dtype=np.int64)
            out[out_col] = d.loc[e["key"]].to_numpy(dtype=np.int64)
            return arrow_out(pd.DataFrame(out))

        a_side = ds_edges.map_batches(edge_side,
                                      batch_format="pandas")
        b_side = degrees.map_batches(deg_side, batch_format="pandas")
        ensure_hash_shuffle(a_side)
        ensure_hash_shuffle(b_side)
        return a_side.union(b_side) \
            .repartition(num_blocks=k, keys=["key"]) \
            .map_batches(join_local, batch_format="pandas",
                         batch_size=None).materialize()

    with_da = attach(canon, "a", ["b"], "deg_a")
    ensure_hash_shuffle(with_da)
    with_db = attach(with_da, "b", ["a", "deg_a"], "deg_b")

    # -- orient lower (deg, id) → higher ------------------------------
    def orient(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "a" not in batch.columns:
            return pa.table({
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "dst_deg": pa.array([], pa.int64())})
        a = batch["a"].to_numpy(dtype=np.int64)
        b = batch["b"].to_numpy(dtype=np.int64)
        da = batch["deg_a"].to_numpy(dtype=np.int64)
        db = batch["deg_b"].to_numpy(dtype=np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "src": pa.array(np.where(a_first, a, b)),
            "dst": pa.array(np.where(a_first, b, a)),
            "dst_deg": pa.array(np.where(a_first, db, da))})

    oriented = with_db.map_batches(orient, batch_format="pandas") \
        .materialize()
    ensure_hash_shuffle(oriented)

    # -- wedges: all out-neighbor pairs per pivot ----------------------
    def wedges(batch: pd.DataFrame) -> pa.Table:
        empty = pa.table({"v": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64()),
                          "_side": pa.array([], pa.string())})
        if len(batch) == 0 or "src" not in batch.columns:
            return empty
        b = batch.sort_values(["src", "dst_deg", "dst"],
                              kind="stable")
        src = b["src"].to_numpy(dtype=np.int64)
        dst = b["dst"].to_numpy(dtype=np.int64)
        n = len(src)
        new = np.concatenate(([True], src[1:] != src[:-1]))
        gid = np.cumsum(new) - 1
        start = np.flatnonzero(new)
        sizes = np.diff(np.append(start, n))
        loc = np.arange(n) - start[gid]
        left_counts = sizes[gid] - 1 - loc
        total = int(left_counts.sum())
        if total == 0:
            return empty
        lefts = np.repeat(np.arange(n), left_counts)
        run_starts = np.concatenate(
            ([0], np.cumsum(left_counts)[:-1]))
        intra = np.arange(total) - np.repeat(run_starts, left_counts)
        rights = lefts + 1 + intra
        return pa.table({
            "v": pa.array(dst[lefts]),
            "w": pa.array(dst[rights]),
            "_side": pa.array(np.full(total, "w", dtype=object),
                              pa.string())})

    wedge_ds = oriented \
        .repartition(num_blocks=k, keys=["src"]) \
        .map_batches(wedges, batch_format="pandas", batch_size=None)

    def edge_tag(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "_side": pa.array([], pa.string())})
        return pa.table({
            "v": batch.column("src"),
            "w": batch.column("dst"),
            "_side": pa.array(["e"] * batch.num_rows, pa.string())})

    edge_side = oriented.map_batches(edge_tag, batch_format="pyarrow")
    ensure_hash_shuffle(wedge_ds)
    ensure_hash_shuffle(edge_side)

    def match(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "_side" not in batch.columns:
            return pa.table({"n_triangles": pa.array([], pa.int64())})
        e = batch[batch["_side"] == "e"][["v", "w"]]
        wd = batch[batch["_side"] == "w"][["v", "w"]]
        n = len(wd.merge(e, on=["v", "w"], how="inner")) \
            if len(e) and len(wd) else 0
        return pa.table({"n_triangles":
                         pa.array([n], pa.int64())})

    def merge(batch: pd.DataFrame) -> pa.Table:
        total = int(batch["n_triangles"].sum()) \
            if len(batch) and "n_triangles" in batch.columns else 0
        return pa.table({
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([total], pa.int64())})

    return wedge_ds.union(edge_side) \
        .repartition(num_blocks=k, keys=["v"]) \
        .map_batches(match, batch_format="pandas", batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def degree_histogram(edges: ray.data.Dataset, *,
                     n_partitions: int | None = None
                     ) -> ray.data.Dataset:
    """Degree distribution of an undirected canonical edge list — the
    first sanity plot of any crawled web graph (power-law check).

    Two bounded exchanges: per-batch endpoint combiners → one
    node-keyed exchange finishes exact degrees, per-partition degree
    value counts → one single-block merge (distinct degrees ≤ max
    degree, tiny at any corpus size).

    Output: (degree, n_nodes), ordered by degree.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(edges)
    k = n_partitions or default_partitions()

    def endpoint_partials(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        nodes = pa.chunked_array(
            [*batch.column("a").chunks, *batch.column("b").chunks])
        g = pa.table({"node": nodes}).group_by("node") \
            .aggregate([("node", "count")])
        return pa.table({"node": g.column("node"),
                         "deg": g.column("node_count")
                         .cast(pa.int64())})

    empty = pd.DataFrame({
        "degree": pd.Series([], dtype="int64"),
        "n_nodes": pd.Series([], dtype="int64")})

    def degree_counts(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "node" not in batch.columns:
            return arrow_out(empty.copy())
        deg = batch.groupby("node", sort=False)["deg"].sum()
        g = deg.value_counts().rename_axis("degree") \
            .reset_index(name="n_nodes")
        return arrow_out(pd.DataFrame({
            "degree": g["degree"].astype("int64"),
            "n_nodes": g["n_nodes"].astype("int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "degree" not in batch.columns:
            return arrow_out(empty.copy())
        g = batch.groupby("degree", as_index=False, sort=True).sum()
        return arrow_out(g.reset_index(drop=True))

    return strip_schema_metadata(edges.select_columns(["a", "b"])) \
        .map_batches(endpoint_partials, batch_format="pyarrow") \
        .repartition(num_blocks=k, keys=["node"]) \
        .map_batches(degree_counts, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def k_core(edges: ray.data.Dataset, *, k: int = 3,
           n_iter: int = 24,
           strategy: str = "auto",
           max_broadcast_nodes: int = 2_000_000,
           n_partitions: int | None = None) -> ray.data.Dataset:
    """k-core decomposition (Seidman 1983 peeling): repeatedly delete
    nodes of degree < k until a fixpoint; what survives is the maximal
    subgraph in which every node keeps ≥ k neighbors — the standard
    "dense-community skeleton" filter over a web/link graph.

    Per round (all ids-only): per-batch degree combiners → ONE
    node-keyed exchange → the doomed set (deg < k).  Doomed ids flow
    back two ways: ``strategy="broadcast"`` (default under
    ``max_broadcast_nodes``) pulls the compact doomed ids to the
    driver and ships ONE ray.put-style closure set to a vectorized
    isin filter — right when removals fit a worker's heap;
    ``"colocate"`` never materializes the doomed set in one process:
    edges and doomed marks ride the UNION idiom through a keyed
    exchange per endpoint.  Every round MATERIALIZES (the >4-shuffle
    lazy-plan rule); peeling stops at the fixpoint (guaranteed ≤
    n_iter rounds for the oracle family; a RuntimeWarning flags a
    non-converged cap hit, and the SQL oracle unrolls exactly
    ``n_iter`` rounds so capped runs still hash-match).

    Output: (node, core_deg) — surviving nodes with their degree
    INSIDE the k-core, the per-node row a downstream community pass
    joins on.
    """
    import warnings

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(edges)
    kp = n_partitions or default_partitions()

    cur = strip_schema_metadata(edges.select_columns(["a", "b"])) \
        .materialize()

    def degree_partials(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        nodes = np.concatenate([
            batch.column("a").to_numpy(zero_copy_only=False),
            batch.column("b").to_numpy(zero_copy_only=False)])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "deg": pa.array(c.astype(np.int64))})

    def degree_merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "node" not in batch.columns:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        g = batch.groupby("node", as_index=False, sort=False)["deg"] \
            .sum()
        return arrow_out(g)

    for _round in range(n_iter):
        ensure_hash_shuffle(cur)
        degs = cur.map_batches(degree_partials,
                               batch_format="pyarrow") \
            .repartition(num_blocks=kp, keys=["node"]) \
            .map_batches(degree_merge, batch_format="pandas",
                         batch_size=None).materialize()
        doomed_ds = degs.filter(expr=f"deg < {k}")
        n_doomed = doomed_ds.count()
        if n_doomed == 0:
            break
        use_bcast = strategy == "broadcast" or (
            strategy == "auto" and n_doomed <= max_broadcast_nodes)
        if use_bcast:
            import ray as _ray

            from .lmscore import _get_broadcast
            doomed_ref = _ray.put(np.sort(np.array(
                [r["node"] for r in
                 doomed_ds.select_columns(["node"]).take_all()],
                dtype=np.int64)))

            def drop(batch: pa.Table, *,
                     doomed_ref=doomed_ref) -> pa.Table:
                if batch.num_columns == 0 or batch.num_rows == 0:
                    return pa.table({"a": pa.array([], pa.int64()),
                                     "b": pa.array([], pa.int64())})
                doomed = _get_broadcast(doomed_ref)
                a = batch.column("a").to_numpy(zero_copy_only=False)
                b = batch.column("b").to_numpy(zero_copy_only=False)
                ia = np.searchsorted(doomed, a)
                ib = np.searchsorted(doomed, b)
                bad = ((ia < len(doomed)) & (doomed[np.minimum(
                    ia, len(doomed) - 1)] == a)) | \
                      ((ib < len(doomed)) & (doomed[np.minimum(
                          ib, len(doomed) - 1)] == b))
                return pa.table({"a": pa.array(a[~bad]),
                                 "b": pa.array(b[~bad])})

            cur = cur.map_batches(drop, batch_format="pyarrow") \
                .materialize()
        else:
            # colocate: the doomed set never sits in one process —
            # union (edge rows on each endpoint) + (doomed marks),
            # one keyed exchange per endpoint role
            marks = doomed_ds.select_columns(["node"]).materialize()
            for side in ("a", "b"):
                ensure_hash_shuffle(cur)
                ensure_hash_shuffle(marks)

                def edge_rows(batch: pa.Table, *,
                              side=side) -> pa.Table:
                    if batch.num_columns == 0 or batch.num_rows == 0:
                        return pa.table({
                            "key": pa.array([], pa.int64()),
                            "a": pa.array([], pa.int64()),
                            "b": pa.array([], pa.int64()),
                            "is_mark": pa.array([], pa.int64())})
                    return pa.table({
                        "key": batch.column(side),
                        "a": batch.column("a"),
                        "b": batch.column("b"),
                        "is_mark": pa.array(
                            np.zeros(batch.num_rows, np.int64))})

                def mark_rows(batch: pa.Table) -> pa.Table:
                    if batch.num_columns == 0 or batch.num_rows == 0:
                        return pa.table({
                            "key": pa.array([], pa.int64()),
                            "a": pa.array([], pa.int64()),
                            "b": pa.array([], pa.int64()),
                            "is_mark": pa.array([], pa.int64())})
                    n = batch.num_rows
                    return pa.table({
                        "key": batch.column("node"),
                        "a": pa.array(np.zeros(n, np.int64)),
                        "b": pa.array(np.zeros(n, np.int64)),
                        "is_mark": pa.array(np.ones(n, np.int64))})

                def keep_unmarked(batch: pd.DataFrame) -> pa.Table:
                    if len(batch) == 0 or "key" not in batch.columns:
                        return pa.table({
                            "a": pa.array([], pa.int64()),
                            "b": pa.array([], pa.int64())})
                    bad = set(batch.loc[batch["is_mark"] == 1,
                                        "key"].tolist())
                    e = batch[batch["is_mark"] == 0]
                    m = ~e["key"].isin(bad)
                    return arrow_out(e.loc[m, ["a", "b"]]
                                     .reset_index(drop=True))

                left = cur.map_batches(edge_rows,
                                       batch_format="pyarrow")
                right = marks.map_batches(mark_rows,
                                          batch_format="pyarrow")
                ensure_hash_shuffle(left)
                ensure_hash_shuffle(right)  # union snapshots BOTH
                cur = left.union(right) \
                    .repartition(num_blocks=kp, keys=["key"]) \
                    .map_batches(keep_unmarked,
                                 batch_format="pandas",
                                 batch_size=None).materialize()
    else:
        warnings.warn(
            f"k_core: peeling not converged after {n_iter} rounds; "
            "result equals the oracle's fixed unroll but NOT the "
            "fixpoint", RuntimeWarning)

    ensure_hash_shuffle(cur)
    return cur.map_batches(degree_partials, batch_format="pyarrow") \
        .repartition(num_blocks=kp, keys=["node"]) \
        .map_batches(degree_merge, batch_format="pandas",
                     batch_size=None) \
        .rename_columns({"deg": "core_deg"})


def adamic_adar_pairs(edges: ray.data.Dataset, *, max_degree: int = 64,
                      k: int = 20, n_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Adamic–Adar link prediction (Adamic & Adar 2003) over an
    undirected canonical edge list: for every NON-adjacent pair
    (u, v), score = Σ over common neighbors w of 1/ln(deg(w)),
    returning the global top-k candidate links.

    Exactness rule (the ``embedding_gram`` precedent — quantize BEFORE
    any value-oracled float reduce): each pivot's weight is quantized
    to an integer q_w = floor(1e6/ln(deg_w) + 0.5) and the distributed
    sum runs over int64, so the reduce is order-free and a DuckDB
    oracle re-derives the exact value (``score_q6``).  A 1-ulp ln()
    disagreement between numpy and DuckDB cannot cross the +0.5
    boundary except at astronomically unlikely half-integer values;
    tests probe every degree 2..4096 against DuckDB.

    Scale shape: the adjacency co-locates on the pivot node (one keyed
    exchange) where deg is the local group size — no separate degree
    table; neighbor-pair generation is the same vectorized
    repeat+arange explode as ``triangle_count``; pair scores and the
    existing-edge mask co-locate on a composite (u, v) key (union
    idiom — candidate pairs that ARE edges are dropped without an
    Acero join); the global top-k merges per-partition top-k
    candidates (valid: the global top-k is a subset of their union).
    Pivots with deg < 2 contribute nothing (ln 1 = 0); pivots with
    deg > max_degree are EXCLUDED — the hub cap that bounds the
    explode at max_degree² rows per pivot (a power-law web graph's hub
    would otherwise emit deg² ≈ 10¹² pairs; its per-pair contribution
    1/ln(deg) is the smallest term, so capping is the standard
    approximation) — and the SQL oracle applies the same cap.

    Output: (u, v, score_q6, n_common), u < v, non-edges only,
    ordered by (score_q6 DESC, u, v), ≤ k rows.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(edges)
    kp = n_partitions or default_partitions()

    canon = strip_schema_metadata(edges.select_columns(["a", "b"])) \
        .materialize()
    ensure_hash_shuffle(canon)

    def adjacency(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "nbr": pa.array([], pa.int64())})
        a = batch.column("a")
        b = batch.column("b")
        return pa.table({
            "node": pa.chunked_array([*a.chunks, *b.chunks]),
            "nbr": pa.chunked_array([*b.chunks, *a.chunks])})

    _pair_schema = {"u": pa.int64(), "v": pa.int64(),
                    "q": pa.int64(), "_side": pa.string()}

    def _empty_pairs() -> pa.Table:
        return pa.table({c: pa.array([], t)
                         for c, t in _pair_schema.items()})

    def pivot_pairs(batch: pd.DataFrame) -> pa.Table:
        # All rows for a node are co-located: deg(w) = local run size.
        if len(batch) == 0 or "node" not in batch.columns:
            return _empty_pairs()
        b = batch.sort_values(["node", "nbr"], kind="stable")
        node = b["node"].to_numpy(dtype=np.int64)
        nbr = b["nbr"].to_numpy(dtype=np.int64)
        n = len(node)
        new = np.concatenate(([True], node[1:] != node[:-1]))
        gid = np.cumsum(new) - 1
        start = np.flatnonzero(new)
        sizes = np.diff(np.append(start, n))
        deg = sizes[gid]
        keep = (deg >= 2) & (deg <= max_degree)
        if not keep.any():
            return _empty_pairs()
        # per-row count of pairs where this row is the LEFT element
        loc = np.arange(n) - start[gid]
        left_counts = np.where(keep, sizes[gid] - 1 - loc, 0)
        total = int(left_counts.sum())
        if total == 0:
            return _empty_pairs()
        lefts = np.repeat(np.arange(n), left_counts)
        run_starts = np.concatenate(([0], np.cumsum(
            left_counts)[:-1]))[left_counts > 0]
        intra = np.arange(total) - np.repeat(
            run_starts, left_counts[left_counts > 0])
        rights = lefts + 1 + intra
        # libm math.log, not numpy's SIMD log (1 ulp off for some
        # integers — enough to cross the +0.5 lattice boundary); the
        # admissible-degree domain is tiny, so a LUT costs nothing.
        import math
        ln_lut = np.array([0.0, 0.0] +
                          [math.log(d) for d in
                           range(2, max_degree + 1)])
        q_by_deg = np.floor(
            1e6 / ln_lut[deg[lefts]] + 0.5).astype(np.int64)
        return pa.table({
            "u": pa.array(nbr[lefts]),
            "v": pa.array(nbr[rights]),
            "q": pa.array(q_by_deg),
            "_side": pa.array(np.full(total, "p", dtype=object),
                              pa.string())})

    pair_side = canon.map_batches(adjacency, batch_format="pyarrow") \
        .repartition(num_blocks=kp, keys=["node"]) \
        .map_batches(pivot_pairs, batch_format="pandas",
                     batch_size=None).materialize()
    ensure_hash_shuffle(pair_side)

    def edge_tag(batch: pa.Table) -> pa.Table:
        # Canonicalize orientation so the mask matches the u<v
        # candidates even when the caller's edge list isn't a<b.
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _empty_pairs()
        a = batch.column("a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "u": pa.array(np.minimum(a, b)),
            "v": pa.array(np.maximum(a, b)),
            "q": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            "_side": pa.array(["e"] * batch.num_rows, pa.string())})

    edge_side = canon.map_batches(edge_tag, batch_format="pyarrow")
    ensure_hash_shuffle(edge_side)

    _out_schema = {"u": pa.int64(), "v": pa.int64(),
                   "score_q6": pa.int64(), "n_common": pa.int64()}

    def _empty_out() -> pa.Table:
        return pa.table({c: pa.array([], t)
                         for c, t in _out_schema.items()})

    def score_local_topk(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "_side" not in batch.columns:
            return _empty_out()
        p = batch[batch["_side"] == "p"]
        if len(p) == 0:
            return _empty_out()
        e = batch[batch["_side"] == "e"][["u", "v"]]
        g = p.groupby(["u", "v"], as_index=False, sort=False) \
            .agg(score_q6=("q", "sum"), n_common=("q", "size"))
        if len(e):
            g = g.merge(e.assign(_e=1), on=["u", "v"], how="left")
            g = g[g["_e"].isna()].drop(columns="_e")
        g = g.sort_values(["score_q6", "u", "v"],
                          ascending=[False, True, True],
                          kind="stable").head(k)
        out = pd.DataFrame({
            "u": g["u"].to_numpy(dtype=np.int64),
            "v": g["v"].to_numpy(dtype=np.int64),
            "score_q6": g["score_q6"].to_numpy(dtype=np.int64),
            "n_common": g["n_common"].to_numpy(dtype=np.int64)})
        return arrow_out(out)

    def merge_topk(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "u" not in batch.columns:
            return _empty_out()
        g = batch.sort_values(["score_q6", "u", "v"],
                              ascending=[False, True, True],
                              kind="stable").head(k)
        return arrow_out(g.reset_index(drop=True))

    return pair_side.union(edge_side) \
        .repartition(num_blocks=kp, keys=["u", "v"]) \
        .map_batches(score_local_topk, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge_topk, batch_format="pandas",
                     batch_size=None)
