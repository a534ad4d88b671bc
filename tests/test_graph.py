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
