"""Round-5 operators: Pareto skyline, Flesch reading ease, integer
Gram matrix, Gini coefficient — local differentials against
brute-force / closed-form answers (the SQL oracles cover the
driver-scale values)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _det_ints(n, mod, salt):
    # deterministic pseudo-random ints (no RNG per repo convention)
    return [int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8],
                16) % mod for i in range(n)]


# ---------------------------------------------------------------- skyline

def _brute_skyline(df, max_col, min_col):
    keep = []
    for i, q in df.iterrows():
        dominated = False
        for _, p in df.iterrows():
            if (p[max_col] >= q[max_col] and p[min_col] <= q[min_col]
                    and (p[max_col] > q[max_col]
                         or p[min_col] < q[min_col])):
                dominated = True
                break
        if not dominated:
            keep.append(i)
    return df.loc[keep]


def _points(n=120):
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "x": np.array(_det_ints(n, 50, "x"), dtype=np.int64),
        "y": np.array(_det_ints(n, 50, "y"), dtype=np.int64),
    })


def test_pareto_skyline_matches_bruteforce(ray_session):
    import ray.data
    from readability_ray.functions import pareto_skyline

    df = _points()
    got = pareto_skyline(ray.data.from_pandas(df),
                         max_col="x", min_col="y",
                         keep_cols=["id", "x", "y"]).to_pandas()
    want = _brute_skyline(df, "x", "y")[["id", "x", "y"]] \
        .sort_values(["x", "y", "id"],
                     ascending=[False, True, True]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_pareto_skyline_keeps_duplicate_points(ray_session):
    import ray.data
    from readability_ray.functions import pareto_skyline

    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "x": [10, 10, 10, 5],
                       "y": [2, 2, 7, 1]})
    got = pareto_skyline(ray.data.from_pandas(df),
                         max_col="x", min_col="y",
                         keep_cols=["id", "x", "y"]).to_pandas()
    # (10,2) twins both survive; (10,7) dominated by (10,2);
    # (5,1) survives (strictly smaller y than every larger-x point)
    assert sorted(got["id"].tolist()) == [1, 2, 4]


def test_pareto_skyline_partition_invariant(ray_session):
    import ray.data
    from readability_ray.functions import pareto_skyline

    df = _points(200)
    outs = []
    for k in (1, 7):
        ds = ray.data.from_pandas(df).repartition(k)
        outs.append(pareto_skyline(
            ds, max_col="x", min_col="y",
            keep_cols=["id", "x", "y"]).to_pandas()
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ----------------------------------------------------------------- flesch

def test_flesch_known_values(ray_session):
    import ray.data
    from readability_ray.functions import flesch_reading_ease

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["The cat sat. The dog ran!",
                          "12345 ---",
                          "go"], pa.string()),
    }))
    out = flesch_reading_ease(docs).to_pandas() \
        .set_index("doc_id").sort_index()
    # doc 1: words=6, sentences=2, vowel groups: e,a,a,e,o,a = 6
    assert out.loc[1, "n_words"] == 6
    assert out.loc[1, "n_sentences"] == 2
    assert out.loc[1, "n_syllables"] == 6
    expect = np.floor((206.835 - 1.015 * 3.0 - 84.6 * 1.0) * 1e6) / 1e6
    assert out.loc[1, "flesch"] == expect
    # doc 2: zero words -> NULL score
    assert out.loc[2, "n_words"] == 0
    assert pd.isna(out.loc[2, "flesch"])
    # doc 3: no sentence enders -> denominator clamps to 1
    assert out.loc[3, "n_sentences"] == 0
    e3 = np.floor((206.835 - 1.015 * 1.0 - 84.6 * 1.0) * 1e6) / 1e6
    assert out.loc[3, "flesch"] == e3


# ------------------------------------------------------------------- gram

def test_embedding_gram_matches_numpy(ray_session):
    import ray.data
    from readability_ray.functions import embedding_gram

    n, d = 30, 8
    vals = np.array(_det_ints(n * d, 2001, "g"),
                    dtype=np.float64).reshape(n, d)
    mat = (vals - 1000.0) / 1000.0
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }))
    got = embedding_gram(ds).to_pandas()
    q = np.floor(np.asarray(
        [np.asarray(r, dtype=np.float64) for r in
         pa.array([list(map(float, r)) for r in mat],
                  pa.list_(pa.float32())).to_pylist()]) * 1000
        + 0.5).astype(np.int64)
    G = q.T @ q
    iu, ju = np.triu_indices(d)
    want = pd.DataFrame({"i": iu + 1, "j": ju + 1, "dot": G[iu, ju]})
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)


def test_embedding_gram_partition_invariant(ray_session):
    import ray.data
    from readability_ray.functions import embedding_gram

    n, d = 40, 4
    vals = np.array(_det_ints(n * d, 999, "p"),
                    dtype=np.float64).reshape(n, d) / 500.0 - 1.0
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in vals],
                              pa.list_(pa.float32())),
    })
    a = embedding_gram(ray.data.from_arrow(tbl).repartition(1)) \
        .to_pandas()
    b = embedding_gram(ray.data.from_arrow(tbl).repartition(9)) \
        .to_pandas()
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------------------- gini

def test_gini_equal_values_is_zero(ray_session):
    import ray.data
    from readability_ray.functions import gini_coefficient

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "n_chars": pa.array([7] * 10, pa.int64()),
    }))
    out = gini_coefficient(ds).to_pandas()
    assert out.loc[0, "n"] == 10
    assert out.loc[0, "sum_key"] == 70
    assert out.loc[0, "gini"] == 0.0


def test_gini_matches_closed_form(ray_session):
    import ray.data
    from readability_ray.functions import gini_coefficient

    x = np.array(_det_ints(60, 5000, "gini"), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "n_chars": pa.array(x, pa.int64()),
    })).repartition(5)
    out = gini_coefficient(ds, n_partitions=3).to_pandas()
    xs = np.sort(x)
    n = len(xs)
    srx = int(np.sum((np.arange(n, dtype=np.int64) + 1) * xs))
    g = float(2 * srx) / float(n * int(xs.sum())) \
        - float(n + 1) / float(n)
    assert out.loc[0, "gini"] == np.floor(g * 1e6) / 1e6


# ------------------------------------------------------------------ dhash

def test_dhash_brightness_invariant_and_distinct():
    from readability_ray.functions.multimodal import (
        _synth_pixels, dhash64)
    for i in (0, 3, 11):
        px = _synth_pixels(f"img:{i}")
        shifted = (px.astype(np.int64) + 5).astype(np.uint8)
        assert dhash64(px) == dhash64(shifted)
    assert dhash64(_synth_pixels("img:1")) != \
        dhash64(_synth_pixels("img:2"))


def test_dhash_odd_sizes():
    from readability_ray.functions.multimodal import (
        _synth_pixels, dhash64)
    # block-splits must handle non-multiples of 8/9
    for h, w in ((17, 31), (9, 10), (8, 9)):
        px = _synth_pixels("odd", h=h, w=w)
        v = dhash64(px)
        assert 0 <= v < 2 ** 64
        shifted = (px.astype(np.int64) + 5).astype(np.uint8)
        assert dhash64(shifted) == v


def test_image_dhash_pairs_family(ray_session):
    import ray.data
    from readability_ray.functions.multimodal import (
        image_dhash_pairs, synth_image_family)

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(30), pa.int64())})).repartition(4)
    media = synth_image_family(docs, max_id=30)
    got = image_dhash_pairs(media, n_partitions=3).to_pandas()
    want = [(i, i + 1_000_000) for i in range(0, 30, 5)]
    assert list(map(tuple, got.to_numpy())) == want


def test_image_dhash_pairs_triple_group(ray_session):
    import ray.data
    from readability_ray.functions.multimodal import (
        _synth_pixels, image_dhash_pairs)
    from readability_ray.functions.media_codecs import encode_bmp

    px = _synth_pixels("trip")
    payloads = [encode_bmp(px),
                encode_bmp((px.astype(np.int64) + 5)
                           .astype(np.uint8)),
                encode_bmp((px.astype(np.int64) + 10)
                           .astype(np.uint8)),
                encode_bmp(_synth_pixels("other"))]
    media = ray.data.from_arrow(pa.table({
        "media_id": pa.array([4, 2, 9, 1], pa.int64()),
        "payload": pa.array(payloads, pa.large_binary())}))
    got = image_dhash_pairs(media).to_pandas()
    assert list(map(tuple, got.to_numpy())) == \
        [(2, 4), (2, 9), (4, 9)]


# ---------------------------------------------------------------- session

def _event_tbl(rows):
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       pa.timestamp("us")),
    })


def test_session_table_semantics(ray_session):
    import ray.data
    from readability_ray.functions import session_table

    rows = [
        (1, "2024-01-01T00:00:00"),
        (1, "2024-01-01T00:10:00"),   # same session (10 min)
        (1, "2024-01-01T00:40:01"),   # gap 30:01 > 30 -> new
        (2, "2024-01-01T05:00:00"),
        (2, "2024-01-01T05:30:00"),   # exactly 30 min -> SAME session
        (2, "2024-01-01T05:30:00"),   # tied ts -> same session
    ]
    out = session_table(ray.data.from_arrow(_event_tbl(rows)),
                        gap_minutes=30).to_pandas() \
        .sort_values(["user_id", "session_idx"]) \
        .reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_idx"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [2, 1, 3]
    assert out["duration_us"].tolist() == [600_000_000, 0,
                                           1_800_000_000]


def test_session_table_partition_invariant(ray_session):
    import ray.data
    from readability_ray.functions import session_table

    rows = [(u, f"2024-01-01T{h:02d}:{m:02d}:00")
            for u in range(6) for h in range(4)
            for m in (0, 20, 55)]
    ds = ray.data.from_arrow(_event_tbl(rows)).repartition(5)
    outs = [session_table(ds, n_partitions=kp).to_pandas()
            .sort_values(["user_id", "session_idx"])
            .reset_index(drop=True) for kp in (2, 8)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------------------------ audio

def test_audio_fp_half_gain_invariant():
    from readability_ray.functions.media_codecs import (
        decode_wav, encode_wav_pcm16)
    from readability_ray.functions.multimodal import audio_signbits_fp
    raw = np.array(_det_ints(500, 1000, "a"), dtype=np.float64)
    s = (0.05 + raw / 1000.0 * 0.85) * \
        np.where(np.array(_det_ints(500, 2, "sgn")) == 0, 1.0, -1.0)
    a, _ = decode_wav(encode_wav_pcm16(s, 16000))
    b, _ = decode_wav(encode_wav_pcm16(s * 0.5, 16000))
    c, _ = decode_wav(encode_wav_pcm16(-s, 16000))
    assert audio_signbits_fp(a) == audio_signbits_fp(b)
    assert audio_signbits_fp(a) != audio_signbits_fp(c)


def test_audio_fp_pairs_family(ray_session):
    import ray.data
    from readability_ray.functions.multimodal import (
        audio_fp_pairs, synth_audio_family)

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64())})).repartition(3)
    media = synth_audio_family(docs, max_id=20, n_samples=400)
    got = audio_fp_pairs(media, n_partitions=2).to_pandas()
    want = [(i, i + 1_000_000) for i in range(0, 20, 5)]
    assert list(map(tuple, got.to_numpy())) == want


# ------------------------------------------------------------- covariance

def test_table_covariance_matches_numpy(ray_session):
    import ray.data
    from readability_ray.functions.report import table_covariance

    n = 300
    a = np.array(_det_ints(n, 97, "ca"), dtype=np.int64)
    b = (a * 3 + np.array(_det_ints(n, 11, "cb"))).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(a.astype(float)),
        "b": pa.array(b.astype(float) / 100.0),
    })).repartition(6)
    out = table_covariance(ds, {"a": 0, "b": 2}).to_pandas() \
        .set_index(["col_a", "col_b"])
    bi = b  # exact integer cents of the b column
    for (ca, cb), (xa, ua), (xb, ub) in [
            (("a", "a"), (a, 1), (a, 1)),
            (("a", "b"), (a, 1), (bi, 100)),
            (("b", "b"), (bi, 100), (bi, 100))]:
        sab = int((xa * xb).sum())
        cov = float(n * sab - int(xa.sum()) * int(xb.sum())) \
            / float(n * n) / float(ua * ub)
        import math
        assert out.loc[(ca, cb), "cov"] == \
            math.floor(cov * 1e6) / 1e6
    # perfectly correlated-ish pair has corr near 1
    assert out.loc[("a", "b"), "corr"] > 0.99
    # partition invariance
    out2 = table_covariance(
        ray.data.from_arrow(pa.table({
            "a": pa.array(a.astype(float)),
            "b": pa.array(b.astype(float) / 100.0)})).repartition(1),
        {"a": 0, "b": 2}).to_pandas()
    pd.testing.assert_frame_equal(
        out.reset_index(), out2, check_dtype=False)


# ------------------------------------------------------------ containment

def test_ngram_containment_quote_detection(ray_session):
    import ray.data
    from readability_ray.functions.dedup import ngram_containment_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu")
    quote = "alpha beta gamma delta epsilon zeta"   # first half
    other = "one two three four five six seven eight nine ten"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([base, quote, other], pa.string()),
    }))
    out = ngram_containment_pairs(
        ds, containment_threshold=0.8).to_pandas()
    # quote's grams are a strict subset of base's: containment 1.0
    # in the quote->base direction only
    assert list(map(tuple, out[["contained", "container"]]
                    .to_numpy())) == [(2, 1)]
    assert out["containment"].iloc[0] == 1.0


def test_ngram_containment_partition_invariant(ray_session):
    import ray.data
    from readability_ray.functions.dedup import ngram_containment_pairs

    texts = []
    for i in range(24):
        toks = [f"w{(i * 7 + j) % 40}" for j in range(12)]
        texts.append(" ".join(toks))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(24), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(5)
    outs = [ngram_containment_pairs(
        ds, containment_threshold=0.3,
        n_partitions=kp).to_pandas() for kp in (2, 9)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
