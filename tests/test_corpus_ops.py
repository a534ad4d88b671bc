"""Unit tests for readability_ray.functions.corpus (curation operators)."""

import hashlib
import math

import pytest


def _docs(ray, rows):
    import ray.data
    return ray.data.from_items(rows)


def test_normalize_text(ray_session):
    import ray.data
    from readability_ray.functions import normalize_text
    ds = ray.data.from_items([
        {"doc_id": 1, "text": "  Hello   WORLD \t x  "},
        {"doc_id": 2, "text": "hello world x"},
        {"doc_id": 3, "text": ""},
    ])
    df = normalize_text(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    # 1 and 2 normalize to the same canonical form
    assert df.norm_md5[0] == df.norm_md5[1]
    assert df.norm_md5[0] == hashlib.md5(b"hello world x").hexdigest()
    assert df.norm_chars[0] == len("hello world x")
    assert df.norm_chars[2] == 0


def test_hash_split_deterministic_and_partitioned(ray_session):
    import ray.data
    from readability_ray.functions import hash_split
    rows = [{"doc_id": i} for i in range(500)]
    df = hash_split(ray.data.from_items(rows)).to_pandas()
    assert set(df.split.unique()) == {"train", "val", "test"}
    # deterministic: recompute one row by hand
    row = df[df.doc_id == 42].iloc[0]
    expect = int(hashlib.md5(b"42").hexdigest()[:8], 16) % 100
    assert row.bucket == expect
    # roughly the right proportions at n=500
    frac_train = (df.split == "train").mean()
    assert 0.7 < frac_train < 0.9
    # stable across a second run (content-independent id hash)
    df2 = hash_split(ray.data.from_items(rows)).to_pandas()
    merged = df.merge(df2, on="doc_id", suffixes=("", "_b"))
    assert (merged.split == merged.split_b).all()


def test_repetition_scores(ray_session):
    import ray.data
    from readability_ray.functions import repetition_scores
    ds = ray.data.from_items([
        {"doc_id": 1, "text": "spam spam spam spam"},
        {"doc_id": 2, "text": "all words here are distinct tokens"},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "solo"},
    ])
    df = repetition_scores(ds).to_pandas().set_index("doc_id")
    assert df.loc[1, "n_tokens"] == 4 and df.loc[1, "n_distinct"] == 1
    assert df.loc[1, "top_token_frac"] == 1.0
    assert df.loc[1, "top_bigram_frac"] == 1.0  # "spam spam" x3 / 3
    assert df.loc[2, "distinct_ratio"] == 1.0
    assert df.loc[2, "top_token_frac"] == math.floor(1 / 6 * 1e6) / 1e6
    assert df.loc[3, "n_tokens"] == 0 and df.loc[3, "top_token_frac"] == 0
    assert df.loc[4, "n_tokens"] == 1 and df.loc[4, "top_bigram_frac"] == 0


def test_source_cap(ray_session):
    import ray.data
    from readability_ray.functions import source_cap
    rows = [{"doc_id": i, "source": f"src{i % 3}", "text": "x"}
            for i in range(30)]
    df = source_cap(ray.data.from_items(rows), k=4).to_pandas()
    assert len(df) == 12
    per = df.groupby("source")["doc_id"].agg(["count", "max"])
    assert (per["count"] == 4).all()
    # first-k by doc_id asc: src0 keeps 0,3,6,9
    kept0 = sorted(df[df.source == "src0"].doc_id)
    assert kept0 == [0, 3, 6, 9]


def test_decontaminate(ray_session):
    import ray.data
    from readability_ray.functions import decontaminate
    bench = ray.data.from_items([
        {"doc_id": 100, "text": "one two three four five six"},
    ])
    corpus = ray.data.from_items([
        # fully contained in the benchmark (both of its 5-grams)
        {"doc_id": 1, "text": "one two three four five six"},
        # shares no 5-gram
        {"doc_id": 2, "text": "totally different words appear in here"},
        # too short for any 5-gram
        {"doc_id": 3, "text": "one two"},
    ])
    df = decontaminate(corpus, bench).to_pandas().set_index("doc_id")
    assert df.loc[1, "n_grams"] == 2 and df.loc[1, "contam_frac"] == 1.0
    assert df.loc[2, "n_contam"] == 0 and df.loc[2, "contam_frac"] == 0.0
    assert df.loc[3, "n_grams"] == 0 and df.loc[3, "contam_frac"] == 0.0


def test_pii_scan_and_redact(ray_session):
    import ray.data
    from readability_ray.functions import pii_redact, pii_scan
    ds = ray.data.from_items([
        {"doc_id": 1, "text": "mail me at alice@example.com or "
                              "bob.smith+x@sub.domain.org today"},
        {"doc_id": 2, "text": "server 10.0.0.1 and phone 555-123-4567"},
        {"doc_id": 3, "text": "nothing sensitive here"},
    ])
    df = pii_scan(ds).to_pandas().set_index("doc_id")
    assert df.loc[1, "n_emails"] == 2 and df.loc[1, "has_pii"] == 1
    assert df.loc[2, "n_ipv4"] == 1 and df.loc[2, "n_phones"] == 1
    assert df.loc[3, "has_pii"] == 0

    red = pii_redact(ds).to_pandas().set_index("doc_id")
    assert red.loc[1, "n_redactions"] == 2
    assert "alice@example.com" not in red.loc[1, "text"]
    assert red.loc[1, "text"].count("[PII]") == 2
    assert red.loc[2, "text"] == "server [PII] and phone [PII]"
    assert red.loc[3, "text"] == "nothing sensitive here"


def test_stratified_sample(ray_session):
    import ray.data
    from readability_ray.functions import stratified_sample
    rows = [{"doc_id": i, "lang": "en" if i % 2 else "de"}
            for i in range(100)]
    df = stratified_sample(ray.data.from_items(rows), group_col="lang",
                           k=10).to_pandas()
    per = df.groupby("lang")["doc_id"].count()
    assert per["en"] == 10 and per["de"] == 10
    # deterministic: the same draw on a re-shuffled input
    df2 = stratified_sample(
        ray.data.from_items(list(reversed(rows))), group_col="lang",
        k=10).to_pandas()
    assert sorted(df.doc_id) == sorted(df2.doc_id)
    # small groups are kept whole
    small = [{"doc_id": i, "lang": "fr"} for i in range(3)]
    df3 = stratified_sample(ray.data.from_items(small),
                            group_col="lang", k=10).to_pandas()
    assert sorted(df3.doc_id) == [0, 1, 2]


def test_token_postings(ray_session):
    import ray.data
    from readability_ray.functions import token_postings
    ds = ray.data.from_items([
        {"doc_id": 3, "text": "b a b"},
        {"doc_id": 1, "text": "a c"},
        {"doc_id": 2, "text": "a"},
    ])
    df = token_postings(ds).to_pandas().set_index("token")
    assert df.loc["a", "df"] == 3 and df.loc["a", "postings"] == "1,2,3"
    assert df.loc["b", "df"] == 1 and df.loc["b", "postings"] == "3"
    assert df.loc["c", "postings"] == "1"


def test_doc_length_percentiles(ray_session):
    import duckdb
    import pandas as pd
    import ray.data
    from readability_ray.functions import doc_length_percentiles
    rows = [{"doc_id": i, "text": "x" * (i * 7 % 101)} for i in range(200)]
    df = doc_length_percentiles(ray.data.from_items(rows)).to_pandas() \
        .sort_values("q").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows))
    want = con.execute("""
        SELECT quantile_disc(length(text), [0.25,0.5,0.75,0.9,0.99]) AS v
        FROM docs""").fetchone()[0]
    assert list(df.n_chars) == [int(v) for v in want]
    assert list(df.q) == [0.25, 0.5, 0.75, 0.9, 0.99]


def test_pii_matches_duckdb_regex_semantics(ray_session):
    """RE2 parity: counts must equal DuckDB's regexp_extract_all on the
    same patterns (the oracle contract for the pii_scan query)."""
    import duckdb
    import pandas as pd
    import ray.data
    from readability_ray.functions import pii_scan
    from readability_ray.functions.corpus import EMAIL_RE, IPV4_RE, PHONE_RE
    rows = [
        {"doc_id": 1, "text": "a@b.co x 1.2.3.4 y 999-999-9999"},
        {"doc_id": 2, "text": "no@tld a@@b 1.2.3 123-45-6789"},
        {"doc_id": 3, "text": "Reach admin@example.museum, 255.255.255.255."},
    ]
    got = pii_scan(ray.data.from_items(rows)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows))
    want = con.execute(f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{EMAIL_RE}'))::BIGINT AS n_emails,
               len(regexp_extract_all(text, '{IPV4_RE}'))::BIGINT AS n_ipv4,
               len(regexp_extract_all(text, '{PHONE_RE}'))::BIGINT AS n_phones
        FROM docs ORDER BY doc_id
    """).fetchdf()
    for col in ("n_emails", "n_ipv4", "n_phones"):
        assert list(got[col]) == list(want[col]), col


def test_shard_shuffle_deterministic_partition(ray_session):
    """(shard, pos) is a bijection onto dense per-shard positions,
    matches the md5 spec exactly, and is stable across runs."""
    import hashlib

    import ray.data
    from readability_ray.functions import shard_shuffle
    rows = [{"doc_id": i, "text": "x"} for i in range(200)]
    ds = ray.data.from_items(rows)
    df = shard_shuffle(ds, n_shards=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 200
    # shard matches the hash_split md5 convention
    for _, r in df.head(20).iterrows():
        d = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        assert r.shard == int(d[:8], 16) % 4
    # positions are dense 0..n-1 per shard
    for _s, g in df.groupby("shard"):
        assert sorted(g.pos) == list(range(len(g)))
    # order within a shard follows md5 rank
    g0 = df[df.shard == 0].copy()
    g0["rk"] = [hashlib.md5(str(i).encode()).hexdigest()
                for i in g0.doc_id]
    assert g0.sort_values("pos").rk.is_monotonic_increasing
    # stable across executions
    df2 = shard_shuffle(ds, n_shards=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert df.equals(df2)


def test_pack_sequences_concat_and_chunk(ray_session):
    """Per-shard streams: begin_token is the exclusive prefix sum in
    shuffle order, window range covers the span, zero-token docs span
    no window, long docs span several."""
    import ray.data
    from readability_ray.functions import pack_sequences
    rows = [{"doc_id": i, "text": " ".join(["w"] * n)}
            for i, n in enumerate([5, 0, 12, 3, 7, 30, 1, 4] * 8)]
    ds = ray.data.from_items(rows)
    df = pack_sequences(ds, seq_len=8, n_shards=2).to_pandas()
    assert len(df) == len(rows)
    for _s, g in df.groupby("shard"):
        g = g.sort_values("pos").reset_index(drop=True)
        # exclusive prefix sum
        assert (g.begin_token == g.n_tokens.cumsum() - g.n_tokens).all()
        nz = g[g.n_tokens > 0]
        assert (nz.first_seq == nz.begin_token // 8).all()
        assert (nz.last_seq ==
                (nz.begin_token + nz.n_tokens - 1) // 8).all()
        assert (nz.n_seqs == nz.last_seq - nz.first_seq + 1).all()
        z = g[g.n_tokens == 0]
        assert (z.n_seqs == 0).all()
    # a 30-token doc must span >= 4 windows of 8
    assert df[df.n_tokens == 30].n_seqs.min() >= 4


def test_tfidf_top_terms(ray_session):
    """tfidf = tf·ln(N/df): corpus-wide terms score 0, rare terms
    rank first, ties break by token asc, head-k respected."""
    import ray.data
    from readability_ray.functions import tfidf_top_terms
    ds = ray.data.from_items([
        {"doc_id": 1, "text": "apple apple banana common"},
        {"doc_id": 2, "text": "banana cherry common"},
        {"doc_id": 3, "text": "cherry common"},
    ])
    df = tfidf_top_terms(ds, k=2).to_pandas() \
        .sort_values(["doc_id", "tfidf", "token"],
                     ascending=[True, False, True]).reset_index(drop=True)
    assert (df.groupby("doc_id").size() <= 2).all()
    d1 = df[df.doc_id == 1]
    # 'apple' (tf=2, df=1) dominates doc 1
    assert d1.iloc[0].token == "apple"
    assert d1.iloc[0].tf == 2
    expected = math.floor(2 * math.log(3 / 1) * 1e6) / 1e6
    assert d1.iloc[0].tfidf == expected
    # 'common' is in every doc -> tfidf 0, never beats a rarer term
    assert "common" not in set(df[df.doc_id == 1].token)


def test_weighted_sample_k(ray_session):
    """A-ES weighted sampling: deterministic, honors weights
    statistically (heavy rows sampled far more often across disjoint
    id universes), excludes non-positive weights, exact k."""
    import pyarrow as pa
    import ray.data

    from readability_ray.functions.corpus import weighted_sample_k

    n = 400
    ids = list(range(n))
    # weight 100 for even ids, 1 for odd
    ws = [100 if i % 2 == 0 else 1 for i in ids]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(ws, pa.int64())}))
    out = weighted_sample_k(ds, k=50, weight_col="n_tokens") \
        .to_pandas()
    assert len(out) == 50
    heavy = (out["doc_id"] % 2 == 0).sum()
    assert heavy >= 45  # ~99:1 odds per slot

    # deterministic
    out2 = weighted_sample_k(ds, k=50, weight_col="n_tokens") \
        .to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])

    # zero/negative weights never selected; k caps at eligible rows
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "n_tokens": pa.array([5, 0, -1], pa.int64())}))
    out3 = weighted_sample_k(ds2, k=10, weight_col="n_tokens") \
        .to_pandas()
    assert list(out3["doc_id"]) == [1]


def test_source_mixture_weights(ray_session):
    """Temperature sampling (mT5 rule): hand-computed weights at
    alpha=0.5; the rare source is upsampled (>1), the dominant one
    downsampled (<1); weights sum to ~1."""
    import math

    import pyarrow as pa
    import ray.data

    from readability_ray.functions import source_mixture_weights
    rows = []
    for i in range(9):   # big: 9 docs x 4 tokens = 36 tokens
        rows.append({"doc_id": i, "source": "big",
                     "text": "a b c d"})
    rows.append({"doc_id": 9, "source": "small", "text": "a b c d"})
    out = source_mixture_weights(
        ray.data.from_items(rows), alpha=0.5).to_pandas() \
        .set_index("source")
    zb, zs = math.sqrt(36.0), math.sqrt(4.0)
    z = zb + zs
    assert out.loc["big", "n_tokens"] == 36
    assert out.loc["small", "n_tokens"] == 4
    assert abs(out.loc["big", "weight"]
               - math.floor(zb / z * 1e6) / 1e6) < 1e-12
    assert abs(out.loc["small", "weight"]
               - math.floor(zs / z * 1e6) / 1e6) < 1e-12
    assert out.loc["small", "upsampling"] > 1.0
    assert out.loc["big", "upsampling"] < 1.0
    assert abs(out["weight"].sum() - 1.0) < 1e-4


def test_source_mixture_alpha_one_is_proportional(ray_session):
    import ray.data

    from readability_ray.functions import source_mixture_weights
    rows = [{"doc_id": 0, "source": "x", "text": "a b c"},
            {"doc_id": 1, "source": "y", "text": "a"}]
    out = source_mixture_weights(
        ray.data.from_items(rows), alpha=1.0).to_pandas() \
        .set_index("source")
    assert (out["upsampling"] == 1.0).all()
    assert abs(out.loc["x", "weight"] - 0.75) < 1e-6
