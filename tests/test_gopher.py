"""Gopher document filters: a planted passing document, one failing
per rule, and degenerate inputs.
"""

import pyarrow as pa

from readability_ray.functions.corpus import gopher_rules

GOOD = ("The quick brown fox jumps over the lazy dog and then runs "
        "back to the warm den with plenty of energy. " * 5).strip()
# ~100 words, English-like, no symbols/bullets/ellipses


def _run(texts):
    import ray.data
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    return gopher_rules(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)


def test_good_doc_passes(ray_session):
    out = _run([GOOD])
    r = out.iloc[0]
    assert bool(r["pass_gopher"])
    assert 50 <= r["n_words"] <= 100_000
    assert 3.0 <= r["mean_word_len"] <= 10.0
    assert r["n_stop_distinct"] >= 2


def test_each_rule_fails_alone(ray_session):
    cases = [
        "too short",                                   # word count
        " ".join(["a"] * 60),                          # mean len < 3
        GOOD + " " + "# " * 20,                        # symbol ratio
        "\n".join(f"- bullet {w}" for w in GOOD.split()[:60]),  # bullets
        "\n".join(f"line {w} trails off..."
                  for w in GOOD.split()[:60]),         # ellipses
        GOOD + " " + " ".join(["12345"] * 40),         # alpha frac
        " ".join(["zzz qqq www"] * 30),                # no stop words
    ]
    out = _run(cases)
    assert not out["pass_gopher"].any()
    # and each failure is attributable to its rule
    assert out.loc[0, "n_words"] < 50
    assert out.loc[1, "mean_word_len"] < 3.0
    assert out.loc[2, "symbol_ratio"] >= 0.1
    assert out.loc[3, "bullet_frac"] > 0.9
    assert out.loc[4, "ellipsis_frac"] > 0.3
    assert out.loc[5, "alpha_frac"] < 0.8
    assert out.loc[6, "n_stop_distinct"] < 2


def test_degenerate(ray_session):
    out = _run(["", "   \n  \n "])
    assert (~out["pass_gopher"]).all()
    assert (out["n_words"] == 0).all()
    assert (out["mean_word_len"] == 0.0).all()


def test_ellipsis_and_unicode_ellipsis(ray_session):
    out = _run(["one line…\ntwo line...\nthree normal"])
    assert out.loc[0, "ellipsis_frac"] == 0.666666
