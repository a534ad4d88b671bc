"""PageRank: differential vs a dense numpy power iteration (same
damping / dangling semantics), hand-checkable structures, duplicate
edges, empty graph.
"""

import numpy as np
import pyarrow as pa
import pytest

from readability_ray.functions.graph import pagerank


def _edges(pairs):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string())}))


def _dense(pairs, damping, n_iter):
    nodes = sorted({x for e in pairs for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj: dict = {}
    for s, d in set(pairs):
        adj.setdefault(s, set()).add(d)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        new = np.full(n, (1 - damping) / n)
        dangling = sum(r[idx[x]] for x in nodes if x not in adj)
        new += damping * dangling / n
        for s, ds_ in adj.items():
            for d in ds_:
                new[idx[d]] += damping * r[idx[s]] / len(ds_)
        r = new
    return {nodes[i]: r[i] for i in range(n)}


def _run(pairs, damping=0.85, n_iter=8):
    # tiny graphs: 2 partitions, or per-round exchange spin-up dwarfs
    # the work and the suite crawls
    return {r["node"]: r["rank"]
            for r in pagerank(_edges(pairs), damping=damping,
                              n_iter=n_iter,
                              n_partitions=2).take_all()}


def test_matches_dense_reference(ray_session):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("c", "d"), ("d", "e"), ("e", "a"), ("b", "e")]
    got = _run(pairs)
    exp = _dense(pairs, 0.85, 8)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_mass_redistributed(ray_session):
    # b is dangling: its mass must not vanish — ranks still sum to 1
    got = _run([("a", "b")], n_iter=6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    exp = _dense([("a", "b")], 0.85, 6)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9)


def test_duplicate_edges_count_once(ray_session):
    # a links b twice and c once: after dedup, b and c split a's mass
    got = _run([("a", "b"), ("a", "b"), ("a", "c")], n_iter=8)
    assert got["b"] == pytest.approx(got["c"], abs=1e-12)


def test_hub_ranks_highest(ray_session):
    # star: everyone links to h
    pairs = [(x, "h") for x in "abcde"]
    got = _run(pairs, n_iter=8)
    assert got["h"] == max(got.values())
    exp = _dense(pairs, 0.85, 8)
    assert got["h"] == pytest.approx(exp["h"], abs=1e-9)


def test_empty_graph(ray_session):
    out = pagerank(_edges([]), n_iter=3, n_partitions=2).take_all()
    assert out == []


def _ab(pairs):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())}))


def test_triangle_count_known_graph(ray_session):
    """Hand-checkable graph: K4 (4 triangles) plus a pendant path —
    degree ties exercised; partition invariance."""
    from readability_ray.functions.graph import triangle_count
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    extra = [(3, 4), (4, 5)]          # no new triangles
    out = triangle_count(_ab(k4 + extra),
                         n_partitions=2).to_pandas()
    assert int(out.loc[0, "n_edges"]) == 8
    assert int(out.loc[0, "n_triangles"]) == 4
    out2 = triangle_count(_ab(k4 + extra).repartition(3),
                          n_partitions=3).to_pandas()
    assert out.equals(out2)


def test_triangle_count_no_triangles(ray_session):
    from readability_ray.functions.graph import triangle_count
    star = [(0, 1), (0, 2), (0, 3), (0, 4)]
    out = triangle_count(_ab(star), n_partitions=2).to_pandas()
    assert int(out.loc[0, "n_triangles"]) == 0
    assert int(out.loc[0, "n_edges"]) == 4


def test_graph_components_chain_and_island(ray_session):
    """Min-label components: a 4-chain and a 2-island resolve to
    their smallest member."""
    from readability_ray.functions.graph import graph_components
    edges = [(7, 3), (3, 5), (5, 9), (20, 21)]
    out = graph_components(_ab(edges), n_partitions=2).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {3: 3, 5: 3, 7: 3, 9: 3, 20: 20, 21: 20}


def test_synthetic_doc_edges_deterministic(ray_session):
    """Edge family: canonical a<b, distinct, md5-deterministic across
    partitionings."""
    import ray.data
    from readability_ray.functions.graph import synthetic_doc_edges
    docs = ray.data.range(200).map_batches(
        lambda b: pa.table({"doc_id": b.column("id")}),
        batch_format="pyarrow")
    e1 = synthetic_doc_edges(docs, n_partitions=2).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    e2 = synthetic_doc_edges(docs.repartition(5), n_partitions=3) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert e1.equals(e2)
    assert (e1["a"] < e1["b"]).all()
    assert not e1.duplicated(["a", "b"]).any()
    assert e1["a"].max() < 50 and len(e1) > 100


def test_degree_histogram_star(ray_session):
    """Star graph: hub degree n, leaves degree 1; invariance."""
    from readability_ray.functions.graph import degree_histogram
    star = [(0, i) for i in range(1, 6)]
    out = degree_histogram(_ab(star), n_partitions=2).to_pandas()
    got = dict(zip(out["degree"], out["n_nodes"]))
    assert got == {1: 5, 5: 1}
    out2 = degree_histogram(_ab(star).repartition(3),
                            n_partitions=3).to_pandas()
    assert out.equals(out2)


def _aa_brute(pairs, max_degree=64):
    """Reference Adamic–Adar with the same 1e6 int quantization."""
    import collections
    import math
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    scores = collections.defaultdict(lambda: [0, 0])
    for w, nbrs in adj.items():
        d = len(nbrs)
        if d < 2 or d > max_degree:
            continue
        q = math.floor(1e6 / math.log(d) + 0.5)
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                s = scores[(ns[i], ns[j])]
                s[0] += q
                s[1] += 1
    edge_set = {tuple(sorted(p)) for p in pairs}
    return {p: tuple(v) for p, v in scores.items()
            if p not in edge_set}


def test_adamic_adar_known_graph(ray_session):
    """Path 0-1-2-3-4 plus edge (0,2): candidate non-edges scored
    against a brute-force reference; partition invariance."""
    from readability_ray.functions.graph import adamic_adar_pairs
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2)]
    want = _aa_brute(edges)
    out = adamic_adar_pairs(_ab(edges), n_partitions=2).to_pandas()
    got = {(int(r.u), int(r.v)): (int(r.score_q6), int(r.n_common))
           for r in out.itertuples()}
    assert got == want
    # existing edges never appear as candidates
    assert all((u, v) not in {tuple(sorted(e)) for e in edges}
               for (u, v) in got)
    out2 = adamic_adar_pairs(_ab(edges).repartition(3),
                             n_partitions=3).to_pandas()
    assert out.equals(out2)


def test_adamic_adar_hub_cap_and_topk(ray_session):
    """A star hub above max_degree contributes nothing; top-k
    truncates by (score DESC, u, v)."""
    from readability_ray.functions.graph import adamic_adar_pairs
    hub = [(100, i) for i in range(5)]       # deg(100) = 5 > cap 4
    tri = [(0, 1), (1, 2)]                   # pivot 1 scores (0, 2)
    out = adamic_adar_pairs(_ab(hub + tri), max_degree=4,
                            n_partitions=2).to_pandas()
    want = _aa_brute(hub + tri, max_degree=4)
    got = {(int(r.u), int(r.v)): (int(r.score_q6), int(r.n_common))
           for r in out.itertuples()}
    assert got == want
    # k=1 keeps only the single best row under the total order
    top1 = adamic_adar_pairs(_ab(hub + tri), max_degree=4, k=1,
                             n_partitions=2).to_pandas()
    best = max(want.items(), key=lambda kv: (kv[1][0],
                                             -kv[0][0], -kv[0][1]))
    assert len(top1) == 1
    assert (int(top1.loc[0, "u"]), int(top1.loc[0, "v"])) == best[0]


def test_adamic_adar_ln_quantization_matches_duckdb():
    """The q = floor(1e6/ln(d) + 0.5) lattice must agree between
    numpy and DuckDB for every admissible degree (the oracle's
    exactness hinges on it)."""
    import math

    import duckdb
    import numpy as np
    lut = np.array([math.log(d) for d in range(2, 4097)])
    ours = np.floor(1e6 / lut + 0.5).astype(np.int64)
    theirs = duckdb.sql(
        "SELECT floor(1000000.0 / ln(d) + 0.5)::BIGINT "
        "FROM (SELECT unnest(range(2, 4097)) AS d) ORDER BY d"
    ).fetchnumpy()
    col = list(theirs.values())[0].astype(np.int64)
    assert (ours == col).all()
