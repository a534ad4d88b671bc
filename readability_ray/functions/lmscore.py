"""Corpus-trained bigram-LM quality scoring — the CCNet shape (Wenzek
et al. 2020: score every document by language-model cross-entropy, then
filter/bucket on the score), with the KenLM stand-in being an add-one-
smoothed bigram model trained ON THE CORPUS ITSELF (or any reference
corpus passed as ``train_ds``).

Model: top-``vocab_size`` tokens by corpus frequency (ties broken by
token asc — fully deterministic); every out-of-vocab token maps to a
single UNK symbol (the empty string — unreachable as a real token);
``P(b | a) = (c(ab) + 1) / (c(a) + V + 1)`` where ``c`` are training
counts, ``V`` the realized vocab size, and ``+1`` in the denominator
accounts for UNK.  Per document: ``avg_logprob`` = mean ln-probability
over its ``n_tokens - 1`` adjacent bigrams (0.0 for docs with < 2
tokens) — low scores mark gibberish / boilerplate / wrong-language
text, exactly what CCNet's perplexity buckets are used for.

Scale shape — train once, broadcast, score streaming:

1. Unigram pass: per-batch partial counts → ONE vocab-keyed exchange of
   vocab-sized partials → two-level deterministic top-V (the
   ``token_frequency_topk`` machinery).  The realized vocab (≤ V rows)
   is the one driver hop.
2. Bigram pass: vocab is ``ray.put`` once; per-batch partial counts of
   UNK-mapped adjacent pairs → ONE (tok_a, tok_b)-keyed exchange of
   partials → per-partition sum, pruned at ``min_bigram_count``.  The
   pruned table is the model artifact — the same "trained model shipped
   to every worker" pattern as CCNet's KenLM binary; size it with
   ``vocab_size`` / ``min_bigram_count`` (at web scale you prune hard,
   exactly as KenLM training does).
3. Scoring: model ``ray.put`` once, then one stateless vectorized map
   over the target corpus — no exchange; scoring streams.

``train_ds`` is scanned twice (unigram + bigram pass): feed it a stored
table, not an expensive live plan.

Everything — top-V vocab, UNK mapping, smoothed bigram arithmetic — is
re-derived in DuckDB SQL for a value-level oracle (ln + floor-6 floats,
the repo's cross-engine float convention).

No reference counterpart (corpus-level operator).
"""

from __future__ import annotations

import math
import re

import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata

# ASCII whitespace tokenizer — char-for-char the class the SQL oracle
# uses (RE2 \S excludes \v; this class is explicit on both sides)
_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")
_UNK = ""  # unreachable as a real token (tokens are non-empty)


_vocab_memo: dict = {}  # per-worker broadcast memo (one fetch/deser)


def _get_broadcast(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    got = _vocab_memo.get(key)
    if got is None:
        import ray
        got = _vocab_memo[key] = ray.get(ref)
    return got


def _bigram_partials(batch: pa.Table, *, vocab_ref,
                     text_col: str) -> pa.Table:
    import collections

    vocab = _get_broadcast(vocab_ref)
    counter: collections.Counter = collections.Counter()
    for text in batch.column(text_col).to_pylist():
        toks = _TOKEN_RE.findall(text or "")
        m = [t if t in vocab else _UNK for t in toks]
        counter.update(zip(m, m[1:]))
    if not counter:
        return pa.table({"tok_a": pa.array([], pa.string()),
                         "tok_b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    pairs, counts = zip(*counter.items())
    return pa.table({
        "tok_a": pa.array([p[0] for p in pairs], pa.string()),
        "tok_b": pa.array([p[1] for p in pairs], pa.string()),
        "n": pa.array(counts, pa.int64()),
    })


def train_bigram_lm(train_ds: ray.data.Dataset, *,
                    vocab_size: int = 50_000, min_bigram_count: int = 1,
                    text_col: str = "text",
                    n_partitions: int | None = None,
                    max_model_entries: int = 5_000_000
                    ) -> tuple[dict, dict, int]:
    """(unigram counts, bigram counts, V) — the broadcastable model.

    ``unigram`` maps token → corpus count for the deterministic top-V
    vocabulary; ``bigram`` maps (tok_a, tok_b) → count for UNK-mapped
    adjacent pairs seen ≥ ``min_bigram_count`` times; ``V`` is the
    realized vocab size (so the smoothing denominator is ``c + V + 1``).

    Scale bound (round-3 verdict #3): the bigram dict lives on the
    DRIVER, and with ``min_bigram_count=1`` it grows with the corpus's
    distinct-bigram count — vocab_size caps the event SPACE (V² pairs)
    but not the realized dict.  The pull is streamed and aborts with a
    clear error once ``max_model_entries`` is exceeded instead of
    OOMing the driver; at corpus scale either raise
    ``min_bigram_count`` (a count cutoff scaled to corpus size) or use
    the fixed-size hashed-feature model (``dsir.dsir_weights_hashed``,
    the DSIR paper's actual 10k-bucket construction).
    """
    import ray

    from ..state import default_partitions, ensure_hash_shuffle
    from .textstats import token_frequency_topk
    ensure_hash_shuffle(train_ds)
    n_parts = n_partitions or default_partitions()
    docs = strip_schema_metadata(train_ds.select_columns([text_col]))
    if text_col != "text":  # token_frequency_topk reads "text"
        docs = docs.rename_columns({text_col: "text"})

    vocab_rows = token_frequency_topk(docs, k=vocab_size).take_all()
    unigram = {r["token"]: int(r["n"]) for r in vocab_rows}
    vocab_ref = ray.put(frozenset(unigram))

    def sum_prune(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "tok_a" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "tok_a": pd.Series([], dtype="object"),
                "tok_b": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")}))
        g = batch.groupby(["tok_a", "tok_b"], as_index=False,
                          sort=False)["n"].sum()
        return arrow_out(g[g["n"] >= min_bigram_count]
                         .reset_index(drop=True))

    merged = docs.map_batches(
        _bigram_partials, batch_format="pyarrow",
        fn_kwargs={"vocab_ref": vocab_ref, "text_col": "text"}) \
        .repartition(num_blocks=n_parts, keys=["tok_a", "tok_b"]) \
        .map_batches(sum_prune, batch_format="pandas",
                     batch_size=None)
    bigram = pull_bigram_rows(merged, max_model_entries)
    return unigram, bigram, len(unigram)


def pull_bigram_rows(merged: ray.data.Dataset,
                     max_model_entries: int) -> dict:
    """Stream the merged (tok_a, tok_b, n) rows into the driver dict,
    raising — not OOMing — the moment the model exceeds the cap."""
    bigram: dict = {}
    for b in merged.iter_batches(batch_format="pandas",
                                 batch_size=65_536):
        if len(b) == 0 or "tok_a" not in b.columns:
            continue
        if len(bigram) + len(b) > max_model_entries:
            raise RuntimeError(
                f"bigram model exceeds max_model_entries="
                f"{max_model_entries}: the driver-side count dict "
                "grows with the corpus's distinct-bigram count. "
                "Raise min_bigram_count (count cutoff scaled to "
                "corpus size) or switch to the fixed-size hashed "
                "model (dsir.dsir_weights_hashed).")
        for a, t, n in zip(b["tok_a"], b["tok_b"], b["n"]):
            bigram[(a, t)] = int(n)
    return bigram


def lm_quality_scores(ds: ray.data.Dataset,
                      train_ds: ray.data.Dataset | None = None, *,
                      vocab_size: int = 50_000,
                      min_bigram_count: int = 1,
                      id_col: str = "doc_id", text_col: str = "text",
                      n_partitions: int | None = None,
                      max_model_entries: int = 5_000_000
                      ) -> ray.data.Dataset:
    """Score every document by average bigram ln-probability under the
    corpus-trained model (CCNet's perplexity filter, self-trained).

    Output: (id_col, n_tokens, n_bigrams, n_oov, avg_logprob) —
    ``avg_logprob`` floor-6 truncated (the repo's cross-engine float
    convention); higher = more typical of the training corpus.
    """
    import ray

    docs = strip_schema_metadata(ds.select_columns([id_col, text_col]))
    unigram, bigram, v = train_bigram_lm(
        train_ds if train_ds is not None else docs,
        vocab_size=vocab_size, min_bigram_count=min_bigram_count,
        text_col=text_col, n_partitions=n_partitions,
        max_model_entries=max_model_entries)
    model_ref = ray.put((unigram, bigram, v))
    _memo: dict = {}  # per-worker ray.get memo (one fetch each)

    def score(batch: pa.Table, *, ref) -> pa.Table:
        model = _memo.get("m")
        if model is None:
            model = _memo["m"] = ray.get(ref)
        uni, big, vsz = model
        denom_base = vsz + 1
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_n, out_nb, out_oov, out_lp = [], [], [], []
        for t in texts:
            toks = _TOKEN_RE.findall(t or "")
            m = [tok if tok in uni else _UNK for tok in toks]
            n = len(toks)
            n_oov = m.count(_UNK)
            lp = 0.0
            for a, b in zip(m, m[1:]):
                lp += math.log((big.get((a, b), 0) + 1)
                               / (uni.get(a, 0) + denom_base))
            nb = max(n - 1, 0)
            avg = lp / nb if nb else 0.0
            out_n.append(n)
            out_nb.append(nb)
            out_oov.append(n_oov)
            out_lp.append(math.floor(avg * 1e6) / 1e6)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(out_n, pa.int64()),
            "n_bigrams": pa.array(out_nb, pa.int64()),
            "n_oov": pa.array(out_oov, pa.int64()),
            "avg_logprob": pa.array(out_lp, pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            fn_kwargs={"ref": model_ref})
