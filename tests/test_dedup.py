

def test_minhash_recall_stats_shape(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import minhash_recall_stats
    base = "alpha beta gamma delta epsilon zeta eta theta"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([base, base + " iota", "wholly different "
                          "words here entirely"], pa.string()),
    }))
    out = minhash_recall_stats(ds, n_partitions=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_exact"] >= 1           # docs 1-2 are near-dups
    assert r["n_common"] == r["n_minhash"]  # verify=exact ⊆ exact
    assert 0.0 <= r["recall"] <= 1.0
    assert r["precision"] == 1.0


def test_minhash_recall_stats_sampled(ray_session):
    """sample_pct keeps docs by the md5-bucket rule; a pair survives
    only when BOTH endpoints land in the sample."""
    import hashlib

    import pyarrow as pa
    import ray.data
    from readability_ray.functions import minhash_recall_stats

    base = "alpha beta gamma delta epsilon zeta eta theta"
    ids = list(range(1, 21))
    texts = [base + f" tail{i}" if i % 2 else base for i in ids]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    pct = 60
    kept = {i for i in ids
            if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            % 100 < pct}
    assert 0 < len(kept) < len(ids)
    out = minhash_recall_stats(ds, sample_pct=pct,
                               n_partitions=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # exact pairs live only inside the sample: every even-id doc shares
    # the identical base text, so the sampled exact count is
    # C(|kept evens|, 2) at threshold 0.5 plus any odd-tail near-dups.
    assert r["n_exact"] >= 1
    assert r["n_common"] == r["n_minhash"]
    assert r["precision"] == 1.0


def test_minhash_recall_stats_empty_sample(ray_session):
    """A sample that keeps no pair (or no docs) must still emit the
    single stats row — recall/precision convention 1.0 — not crash in
    the Acero join on schema-less empty candidate blocks."""
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import minhash_recall_stats

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["one two three four",
                          "five six seven eight",
                          "nine ten eleven twelve"], pa.string()),
    }))
    out = minhash_recall_stats(ds, n_partitions=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_exact"] == 0 and r["n_minhash"] == 0
    assert r["recall"] == 1.0 and r["precision"] == 1.0


def test_minhash_verify_exact_no_pairs(ray_session):
    """minhash_lsh_pairs(verify='exact') on a dup-free corpus: the
    candidate stream is fully empty; the sentinel seed must keep the
    text-attach joins alive and the output must be zero TYPED rows."""
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import minhash_lsh_pairs

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aa bb cc dd ee", "vv ww xx yy zz"],
                         pa.string()),
    }))
    df = minhash_lsh_pairs(ds, n_partitions=2).to_pandas()
    assert len(df) == 0


def test_dup_rate_by_source(ray_session):
    """Hand-built corpus: source A has 2 copies of one text among 4
    docs (rate 0.25), source B all-unique, source C all-same."""
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import dup_rate_by_source
    rows = ([("x", "A"), ("x", "A"), ("y", "A"), ("z", "A")]
            + [("u1", "B"), ("u2", "B")]
            + [("s", "C"), ("s", "C"), ("s", "C")])
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array([r[0] for r in rows]),
        "source": pa.array([r[1] for r in rows])}))
    out = dup_rate_by_source(ds, n_partitions=2).to_pandas() \
        .set_index("source")
    assert out.loc["A", "n_docs"] == 4 and out.loc["A", "n_dups"] == 1
    assert out.loc["A", "dup_rate"] == 0.25
    assert out.loc["B", "n_dups"] == 0 and out.loc["B", "dup_rate"] == 0.0
    assert out.loc["C", "n_docs"] == 3 and out.loc["C", "n_dups"] == 2
    # partition invariance
    out2 = dup_rate_by_source(ds.repartition(4),
                              n_partitions=3).to_pandas() \
        .set_index("source")
    assert out.equals(out2)
