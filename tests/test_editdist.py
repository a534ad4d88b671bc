"""edit_distance_pairs: vectorized-DP differential vs a scalar
reference, blocking semantics, the block-size cap, and partition
invariance."""

import random

import numpy as np
import pyarrow as pa

from readability_ray.functions.editdist import (_levenshtein_block,
                                                edit_distance_pairs)


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        new = [i]
        for j, cb in enumerate(b, 1):
            new.append(min(new[-1] + 1, dp[j] + 1,
                           dp[j - 1] + (ca != cb)))
        dp = new
    return dp[-1]


def test_vectorized_dp_differential():
    random.seed(7)
    alpha = "abcde "
    cases = [("", ""), ("", "abc"), ("abc", ""), ("same", "same")]
    for _ in range(300):
        cases.append((
            "".join(random.choice(alpha)
                    for _ in range(random.randint(0, 20))),
            "".join(random.choice(alpha)
                    for _ in range(random.randint(0, 20)))))
    L = 24
    n = len(cases)
    A = np.full((n, L), -1, np.int32)
    B = np.full((n, L), -1, np.int32)
    la = np.zeros(n, np.int32)
    lb = np.zeros(n, np.int32)
    for r, (a, b) in enumerate(cases):
        ca = np.frombuffer(a.encode("utf-32-le"),
                           np.uint32).astype(np.int32)
        cb = np.frombuffer(b.encode("utf-32-le"),
                           np.uint32).astype(np.int32)
        A[r, :len(ca)] = ca
        B[r, :len(cb)] = cb
        la[r], lb[r] = len(ca), len(cb)
    d = _levenshtein_block(A, la, B, lb)
    assert (d == np.array([_lev_ref(a, b) for a, b in cases])).all()


def _ds(texts):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_blocking_and_verify(ray_session):
    texts = [
        "The quick brown fox jumps over the lazy dog",   # 0
        "The quick brown fox jumps over the lazy cat",   # 1: dist 3
        "The quick brown fox leaps over the hazy dog",   # 2: few edits
        "A completely different document altogether",     # 3: other block
        "the QUICK   brown fox jumps over the lazy dog",  # 4: normalizes to 0
    ]
    out = edit_distance_pairs(_ds(texts), max_dist=6,
                              n_partitions=3).to_pandas()
    pairs = {(int(a), int(b)): int(d) for a, b, d in
             zip(out["doc_a"], out["doc_b"], out["dist"])}
    assert pairs[(0, 4)] == 0          # normalization collapses them
    assert pairs[(0, 1)] == 3          # dog -> cat
    assert (0, 3) not in pairs         # different block key
    assert all(a < b for a, b in pairs)


def test_block_cap_skips_hot_key(ray_session):
    # 70 docs sharing one block key > max_block=64 -> no pairs
    texts = [f"identical prefix here {i}" for i in range(70)]
    out = edit_distance_pairs(_ds(texts)).to_pandas()
    assert len(out) == 0


def test_partition_invariance(ray_session):
    random.seed(3)
    base = ["alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine ten"]
    texts = []
    for i in range(40):
        t = base[i % 2]
        if i % 3 == 0:
            t = t.replace("e", "E", 1)
        texts.append(t + f" tail{i % 5}")
    a = edit_distance_pairs(_ds(texts), n_partitions=2).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = edit_distance_pairs(_ds(texts), n_partitions=7).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
