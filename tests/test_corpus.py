

def test_ccnet_buckets_terciles(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import ccnet_buckets
    # 9 en docs with token counts 1..9 → t1=3, t2=6
    texts = [" ".join(["w"] * n) for n in range(1, 10)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(9)), pa.int64()),
        "lang": pa.array(["en"] * 9, pa.string()),
        "text": pa.array(texts, pa.string()),
    }))
    out = ccnet_buckets(ds).to_pandas().sort_values("doc_id")
    assert list(out["n_tokens"]) == list(range(1, 10))
    assert list(out["bucket"]) == (["head"] * 3 + ["middle"] * 3
                                   + ["tail"] * 3)


def test_ccnet_buckets_per_lang_thresholds(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import ccnet_buckets
    # en: counts 1,2,3 (t1=1,t2=2); fr: counts 10,20,30 (t1=10,t2=20)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "lang": pa.array(["en", "en", "en", "fr", "fr", "fr"],
                         pa.string()),
        "text": pa.array(["w", "w w", "w w w",
                          " ".join(["w"] * 10), " ".join(["w"] * 20),
                          " ".join(["w"] * 30)], pa.string()),
    }))
    out = ccnet_buckets(ds).to_pandas().sort_values("doc_id")
    assert list(out["bucket"]) == ["head", "middle", "tail"] * 2


def test_compression_ratios_signal(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import compression_ratios
    rep = "word " * 400          # highly compressible
    noise = "".join(
        chr(33 + (i * 37) % 90) for i in range(2000))  # high entropy
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([rep, noise, ""], pa.string()),
    }))
    out = compression_ratios(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "compression_ratio"] < 0.05
    assert out.loc[2, "compression_ratio"] > out.loc[1,
                                                    "compression_ratio"]
    assert out.loc[3, "raw_bytes"] == 0
    # deterministic across runs
    out2 = compression_ratios(ds).to_pandas().set_index("doc_id")
    assert (out["compression_ratio"] == out2["compression_ratio"]).all()


def test_host_split_cohesion(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import host_split
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "url": pa.array([f"https://h{i % 3}.test/p/{i}"
                         for i in range(20)], pa.string()),
    }))
    out = host_split(ds).to_pandas()
    # all pages of one host share a split (the leakage guard)
    assert (out.groupby("host")["split"].nunique() == 1).all()
    # deterministic across runs and partitionings
    out2 = host_split(ds.repartition(5)).to_pandas()
    m = out.set_index("doc_id")["split"]
    m2 = out2.set_index("doc_id")["split"]
    assert (m.sort_index() == m2.sort_index()).all()


def test_corpus_divergence_planted_drift(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data

    from readability_ray.functions import corpus_divergence

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) % 100

    # common filler everywhere; "driftword" only on side A
    texts, n = [], 60
    for i in range(n):
        t = "common filler words here"
        if bucket(i) < 50:
            t += " driftword driftword"
        texts.append(t)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = corpus_divergence(ds, k=3, n_partitions=3).to_pandas()
    assert len(out) == 3
    top = out.sort_values("contrib", ascending=False).iloc[0]
    assert top["token"] == "driftword" and top["cnt_b"] == 0
    n_a = sum(1 for i in range(n) if bucket(i) < 50)
    assert top["cnt_a"] == 2 * n_a
    assert top["contrib"] > 0


def test_corpus_divergence_partition_invariance(ray_session):
    import pyarrow as pa
    import ray.data

    from readability_ray.functions import corpus_divergence
    texts = [f"tok{i % 7} shared words tok{i % 3}" for i in range(50)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    a = corpus_divergence(ds, k=5, n_partitions=2).to_pandas() \
        .reset_index(drop=True)
    b = corpus_divergence(ds, k=5, n_partitions=6).to_pandas() \
        .reset_index(drop=True)
    assert a.equals(b) and len(a) == 5
