"""Count-Min Sketch: mergeability, never-undercount, determinism."""

import numpy as np
import pyarrow as pa


def _docs(ray, texts):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_cms_never_undercounts_and_exact_top(ray_session):
    import ray
    from readability_ray.functions import cms_top_token_counts
    texts = ["a a a b", "a b c", "c d", "a"]
    out = cms_top_token_counts(_docs(ray, texts), k=4, d=4,
                               w=64).to_pandas().set_index("token")
    assert out.loc["a", "exact_n"] == 5
    assert (out["cms_estimate"] >= out["exact_n"]).all()
    assert (out["overcount"] >= 0).all()
    # w large vs 4 tokens → no collisions → exact estimates
    assert (out["overcount"] == 0).all()


def test_cms_sketch_merge_equals_single_pass(ray_session):
    import ray
    from readability_ray.functions import cms_sketch
    from readability_ray.functions.sketch import _positions
    texts = [f"tok{i % 7} x" for i in range(40)]
    m = cms_sketch(_docs(ray, texts), d=3, w=32)
    # reference single-process build
    ref = np.zeros((3, 32), dtype=np.int64)
    for t in texts:
        for tok in t.split():
            for i, p in enumerate(_positions(tok, 3, 32)):
                ref[i, p] += 1
    assert (m == ref).all()
