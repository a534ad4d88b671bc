"""Text analysis operators over the ``documents`` table.

All per-row transforms are single vectorized ``map_batches`` passes
using pyarrow.compute RE2 kernels — the same regex engine DuckDB uses,
so the oracle SQL in __ray_entry__ matches bit-for-bit.  Aggregations
pre-combine inside map_batches before the (tiny) groupby shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TOKEN_RE = r"[^ \t\n\r\f\v]+"
DIGIT_RE = r"[0-9]"
UPPER_RE = r"[A-Z]"
STOPWORD_RE = r"(?i)\b(the|and|of|to|in|is|a|that|it|for)\b"

# per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (matches the synthetic corpus langs en/de/fr/es/zh)
LANG_PROFILES = {
    "en": r"(?i)\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"(?i)\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "fr": r"(?i)\b(le|la|les|et|est|pas|pour|dans|une|que)\b",
    "es": r"(?i)\b(el|la|los|las|es|de|que|por|con|una)\b",
}
CJK_RE = r"[一-鿿]"
_LANG_ORDER = ("en", "de", "fr", "es")  # tie-break priority, then zh


def _token_stats_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pc.utf8_length(text).cast(pa.int64()),
        "n_tokens": pc.count_substring_regex(text, TOKEN_RE).cast(pa.int64()),
        "n_digits": pc.count_substring_regex(text, DIGIT_RE).cast(pa.int64()),
        "n_upper": pc.count_substring_regex(text, UPPER_RE).cast(pa.int64()),
        "n_stopwords": pc.count_substring_regex(
            text, STOPWORD_RE).cast(pa.int64()),
    })


def token_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document token counting (whitespace tokens, digits, upper,
    stopwords).  Stateless vectorized map — no shuffle."""
    return ds.map_batches(_token_stats_batch, batch_format="pyarrow")


# GPT-2-style pretokenizer alternation, RE2-compatible (no lookahead:
# the real GPT-2 regex's trailing ``\s+(?!\S)`` branch is dropped, so a
# multi-space run becomes one whitespace token instead of splitting its
# last space onto the next word).  Leftmost-first alternation semantics
# are identical in pyarrow's RE2 and DuckDB's RE2, so counts match
# bit-for-bit (verified on the corpus + edge strings incl. '', CJK,
# contractions).
BPE_TOKEN_RE = (r"'(?:s|t|re|ve|m|ll|d)"
                r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def _bpe_token_stats_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bpe_tokens": pc.count_substring_regex(
            text, BPE_TOKEN_RE).cast(pa.int64()),
        "n_ws_tokens": pc.count_substring_regex(
            text, TOKEN_RE).cast(pa.int64()),
    })


def bpe_token_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Subword-style token counting: per document, the number of
    GPT-2-ish pretokenizer tokens (``BPE_TOKEN_RE`` — contractions,
    space-prefixed letter/number runs, punctuation runs, whitespace
    runs) next to the plain whitespace token count.  This is the
    "token counting (whitespace + a BPE-ish regex)" operator from the
    engine brief: the count every per-doc token-budget / packing
    decision in a training-data pipeline keys on.

    Stateless vectorized map (one RE2 pass per column) — no shuffle;
    trivially web-scale.
    """
    return ds.map_batches(_bpe_token_stats_batch, batch_format="pyarrow")


def _quality_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    n_chars = pc.utf8_length(text).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_tokens = pc.count_substring_regex(text, TOKEN_RE).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_stop = pc.count_substring_regex(text, STOPWORD_RE).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_punct = pc.count_substring_regex(text, r"[.,;:!?]").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    denom_tok = np.maximum(n_tokens, 1).astype(np.float64)
    denom_chars = np.maximum(n_chars, 1).astype(np.float64)
    # floor-6 to keep Ray and DuckDB float results hash-identical
    stop_ratio = np.floor(n_stop / denom_tok * 1e6) / 1e6
    punct_ratio = np.floor(n_punct / denom_chars * 1e6) / 1e6
    mean_token_len = np.floor(n_chars / denom_tok * 1e6) / 1e6
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "stop_ratio": pa.array(stop_ratio, pa.float64()),
        "punct_ratio": pa.array(punct_ratio, pa.float64()),
        "mean_token_len": pa.array(mean_token_len, pa.float64()),
    })


def quality_scores(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Quality-signal columns (length, punctuation, stopword ratios)."""
    return ds.map_batches(_quality_batch, batch_format="pyarrow")


def _lang_id_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    counts = {
        lang: pc.count_substring_regex(text, profile).cast(pa.int64())
        .to_numpy(zero_copy_only=False)
        for lang, profile in LANG_PROFILES.items()
    }
    cjk = pc.count_substring_regex(text, CJK_RE).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n = len(batch)
    pred = np.full(n, "und", dtype=object)
    best = np.zeros(n, dtype=np.int64)
    # fixed priority order for ties (same CASE order as the oracle SQL)
    for lang in _LANG_ORDER:
        better = counts[lang] > best
        pred[better] = lang
        best = np.maximum(best, counts[lang])
    zh = cjk > best
    pred[zh] = "zh"
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pa.array(pred, pa.string()),
    })


def lang_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Stopword-profile language identification (en/de/fr/es + CJK)."""
    return ds.map_batches(_lang_id_batch, batch_format="pyarrow")


def _lang_partials(batch: pa.Table) -> pa.Table:
    """Combiner: one partial row per lang per batch BEFORE the shuffle —
    the groupby then moves O(langs × batches) rows, not O(rows)."""
    text = batch.column("text")
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = pc.count_substring_regex(text, TOKEN_RE).cast(pa.int64())
    tmp = pa.table({
        "lang": batch.column("lang"),
        "n_chars": n_chars,
        "n_tokens": n_tokens,
    })
    grouped = tmp.group_by("lang").aggregate(
        [("n_chars", "sum"), ("n_tokens", "sum"), ("lang", "count")])
    return pa.table({
        "lang": grouped.column("lang"),
        "n_docs": grouped.column("lang_count").cast(pa.int64()),
        "total_chars": grouped.column("n_chars_sum"),
        "total_tokens": grouped.column("n_tokens_sum"),
    })


def doc_lang_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus stats per language: partial aggregation inside map_batches,
    then a small groupby over the partials (shuffle moves only
    langs×batches rows)."""
    partials = ds.map_batches(_lang_partials, batch_format="pyarrow")
    agg = partials.groupby("lang").sum(
        ["n_docs", "total_chars", "total_tokens"])

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # schema-less empty shuffle partition
            return pa.table({"lang": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "total_chars": pa.array([], pa.int64()),
                             "total_tokens": pa.array([], pa.int64())})
        return batch.rename_columns(
            ["lang", "n_docs", "total_chars", "total_tokens"])

    return agg.map_batches(rename, batch_format="pyarrow")


def token_frequency_topk(ds: ray.data.Dataset, k: int = 50,
                         text_col: str = "text") -> ray.data.Dataset:
    """Corpus vocabulary statistics: top-k tokens by frequency.

    The classic wide-shuffle shape, done right: tokens are counted
    WITHIN each batch first (one partial row per distinct token per
    batch), so the keyed shuffle moves vocab-sized partials, never the
    token stream; the per-token merge is a per-partition pandas sum
    (same exchange as Ray's HashAggregate without its mostly-unique-key
    wall or lingering aggregator actors — see BASELINE.md round-3
    bench).  Ties broken by token asc for determinism.
    """
    import re as _re
    ascii_token = _re.compile(r"[^ \t\n\r\f\v]+")

    def partial_counts(batch: pa.Table) -> pa.Table:
        import collections
        counter: collections.Counter = collections.Counter()
        for text in batch.column(text_col).to_pylist():
            counter.update(ascii_token.findall(text))
        if not counter:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        tokens, counts = zip(*counter.items())
        return pa.table({"token": pa.array(tokens, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out
    ensure_hash_shuffle(ds)
    n_parts = default_partitions()

    def sum_partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "token" not in batch.columns:
            # hash-shuffle empty partitions arrive as schema-less blocks
            return arrow_out(pd.DataFrame(
                {"token": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}))
        return arrow_out(batch.groupby("token", as_index=False,
                                       sort=False)["n"].sum())

    renamed = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["token"]) \
        .map_batches(sum_partials, batch_format="pandas",
                     batch_size=None)

    def global_topk(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return arrow_out(pd.DataFrame(
                {"token": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}))
        return arrow_out(batch.sort_values(
            ["n", "token"], ascending=[False, True]).head(k)
            .reset_index(drop=True))

    # local top-k per block, then a single small merge
    local = renamed.map_batches(global_topk, batch_format="pandas")
    merged = local.repartition(1).map_batches(global_topk,
                                              batch_format="pandas")
    return merged


def token_postings(ds: ray.data.Dataset,
                   n_partitions: int | None = None) -> ray.data.Dataset:
    """Inverted index build: token → document frequency + sorted
    posting list (the structure contamination checks and corpus search
    are served from).

    Scale shape: (token, doc_id) pairs are DEDUPED WITHIN each batch
    before the exchange, so the keyed shuffle moves per-batch distinct
    pairs, never the raw token stream; the per-partition pandas pass
    dedupes across batches and folds each token's postings into one
    row.  Postings are emitted as a comma-joined sorted id string
    (deterministic, hashable by the oracle).  Partitioning assumption:
    one token's postings fit in one partition — cap-df or shard hot
    tokens (stopwords) upstream for adversarial vocabularies.
    """
    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()

    import re as _re
    token_re = _re.compile(r"[^ \t\n\r\f\v]+")

    def pair_rows(batch: pa.Table) -> pa.Table:
        toks: list = []
        ids: list = []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            for tok in set(token_re.findall(text)):
                toks.append(tok)
                ids.append(doc_id)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    def fold(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "token" not in batch.columns:
            # hash-shuffle empty partitions arrive as schema-less blocks
            return arrow_out(pd.DataFrame(
                {"token": pd.Series([], dtype="object"),
                 "df": pd.Series([], dtype="int64"),
                 "postings": pd.Series([], dtype="object")}))
        dd = batch.drop_duplicates(["token", "doc_id"]) \
            .sort_values(["token", "doc_id"])
        g = dd.groupby("token", sort=False)["doc_id"]
        out = pd.DataFrame({
            "token": g.count().index,
            "df": g.count().to_numpy().astype("int64"),
            "postings": g.apply(
                lambda s: ",".join(str(i) for i in s)).to_numpy(),
        })
        return arrow_out(out)

    return ds.map_batches(pair_rows, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["token"]) \
        .map_batches(fold, batch_format="pandas", batch_size=None)


def doc_length_percentiles(ds: ray.data.Dataset,
                           quantiles: tuple = (0.25, 0.5, 0.75,
                                               0.9, 0.99)
                           ) -> ray.data.Dataset:
    """Exact corpus percentiles of document length WITHOUT a global
    sort: per-batch value-count partials (one row per distinct length
    per batch) merge into a value histogram, and the quantiles read
    off the cumulative counts.  The exchange moves O(distinct_lengths
    × batches) partial rows — at any corpus size, never O(rows) — the
    histogram shape a 100 TB percentile job must have (a sort-based
    percentile is an all-to-all over the full table).

    Discrete (lower, nearest-rank) semantics: the q-quantile is the
    smallest length whose cumulative count reaches ceil(q × n) — same
    element DuckDB's ``quantile_disc`` picks.  Output: (q, n_chars).
    """
    import pandas as pd

    from .util import arrow_out

    def partials(batch: pa.Table) -> pa.Table:
        lengths = pc.utf8_length(batch.column("text")).cast(pa.int64())
        vc = pa.table({"n_chars": lengths}).group_by("n_chars") \
            .aggregate([("n_chars", "count")])
        return pa.table({
            "n_chars": vc.column("n_chars"),
            "cnt": vc.column("n_chars_count").cast(pa.int64()),
        })

    def quantile_pass(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return arrow_out(pd.DataFrame(
                {"q": pd.Series([], dtype="float64"),
                 "n_chars": pd.Series([], dtype="int64")}))
        hist = batch.groupby("n_chars", sort=True)["cnt"].sum()
        values = hist.index.to_numpy()
        cum = hist.to_numpy().cumsum()
        n = int(cum[-1])
        qs, out = [], []
        for q in quantiles:
            rank = max(1, int(np.ceil(q * n)))
            out.append(int(values[np.searchsorted(cum, rank)]))
            qs.append(np.floor(q * 1e6) / 1e6)
        return arrow_out(pd.DataFrame(
            {"q": pd.Series(qs, dtype="float64"),
             "n_chars": pd.Series(out, dtype="int64")}))

    # histogram partials are tiny (distinct lengths × batches) — one
    # merge block computes every quantile in a single vectorized pass
    return ds.map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(quantile_pass, batch_format="pandas",
                     batch_size=None)


def doc_length_percentiles_by_group(ds: ray.data.Dataset, *,
                                    group_col: str = "lang",
                                    quantiles: tuple = (0.25, 0.5,
                                                        0.75, 0.9)
                                    ) -> ray.data.Dataset:
    """GROUPED exact percentiles: per-group document-length quantiles
    from per-(group, length) histogram partials — the
    doc_length_percentiles shape with the group key carried through.
    The exchange still moves O(groups x distinct_lengths x batches)
    partial rows, never O(rows); groups here are languages (bounded),
    so the merge stays the single-block rule.

    Discrete (lower, nearest-rank) semantics per group — the element
    DuckDB's ``quantile_disc`` picks.  Output: (group, q, n_chars).
    """
    import pandas as pd

    from .util import arrow_out

    def partials(batch: pa.Table) -> pa.Table:
        lengths = pc.utf8_length(batch.column("text")).cast(pa.int64())
        vc = pa.table({"group": batch.column(group_col),
                       "n_chars": lengths}) \
            .group_by(["group", "n_chars"]) \
            .aggregate([("n_chars", "count")])
        return pa.table({
            "group": vc.column("group"),
            "n_chars": vc.column("n_chars"),
            "cnt": vc.column("n_chars_count").cast(pa.int64()),
        })

    def quantile_pass(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "group" not in batch.columns:
            return arrow_out(pd.DataFrame(
                {"group": pd.Series([], dtype="object"),
                 "q": pd.Series([], dtype="float64"),
                 "n_chars": pd.Series([], dtype="int64")}))
        out_g, out_q, out_v = [], [], []
        for g in sorted(batch["group"].unique()):
            hist = batch[batch["group"] == g] \
                .groupby("n_chars", sort=True)["cnt"].sum()
            values = hist.index.to_numpy()
            cum = hist.to_numpy().cumsum()
            n = int(cum[-1])
            for q in quantiles:
                rank = max(1, int(np.ceil(q * n)))
                out_g.append(g)
                out_q.append(np.floor(q * 1e6) / 1e6)
                out_v.append(int(values[np.searchsorted(cum, rank)]))
        return arrow_out(pd.DataFrame(
            {"group": pd.Series(out_g, dtype="object"),
             "q": pd.Series(out_q, dtype="float64"),
             "n_chars": pd.Series(out_v, dtype="int64")}))

    from .util import strip_schema_metadata
    return strip_schema_metadata(
        ds.select_columns([group_col, "text"])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(quantile_pass, batch_format="pandas",
                     batch_size=None)


def user_modal_event_type(events: ray.data.Dataset, *,
                          n_partitions: int | None = None
                          ) -> ray.data.Dataset:
    """Per-key MODE (argmax): each user's most frequent event type,
    ties to the lexicographically smallest type — the grouped-argmax
    shape (dominant category per entity).

    Per-batch (user, type, n) combiners collapse each block to its
    distinct pairs, ONE user-keyed ids-only exchange co-locates each
    user's partials, and the per-partition pass is one vectorized
    groupby-sum + sort + first-per-user.  Output:
    (user_id, event_type, n_events).
    """
    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(events)
    k = n_partitions or default_partitions()

    def combiners(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(["user_id", "event_type"],
                          sort=False).size().reset_index(name="n")
        return arrow_out(pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "event_type": g["event_type"],
            "n": g["n"].astype("int64")}))

    def argmax(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "n_events": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "user_id" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby(["user_id", "event_type"],
                          as_index=False, sort=False)["n"].sum()
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True],
                          kind="stable")
        top = g.drop_duplicates("user_id", keep="first")
        return arrow_out(pd.DataFrame({
            "user_id": top["user_id"].astype("int64"),
            "event_type": top["event_type"],
            "n_events": top["n"].astype("int64")}))

    return strip_schema_metadata(
        events.select_columns(["user_id", "event_type"])) \
        .map_batches(combiners, batch_format="pandas") \
        .repartition(num_blocks=k, keys=["user_id"]) \
        .map_batches(argmax, batch_format="pandas", batch_size=None)


def events_hourly_unique_users(events: ray.data.Dataset, *,
                               n_partitions: int | None = None
                               ) -> ray.data.Dataset:
    """Grouped COUNT DISTINCT: unique users per hour — the
    high-cardinality-distinct-inside-bounded-groups shape (the exact
    counterpart of the HLL estimate).

    Per-batch DISTINCT (hour, user) pairs (ids only), ONE user-keyed
    exchange — every (hour, user) pair then lives in exactly one
    partition, so a per-partition drop_duplicates + per-hour size is
    an EXACT partial and the bounded-key single-block merge just sums.
    Output: (hour, unique_users).
    """
    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(events)
    k = n_partitions or default_partitions()

    def pairs(batch: pd.DataFrame) -> pa.Table:
        hours = (batch["ts"].to_numpy(dtype="datetime64[us]")
                 .astype("int64") // 3_600_000_000)
        g = pd.DataFrame({"hour": hours,
                          "user_id": batch["user_id"]
                          .to_numpy(dtype=np.int64)}) \
            .drop_duplicates()
        return arrow_out(pd.DataFrame({
            "hour": g["hour"].astype("int64"),
            "user_id": g["user_id"].astype("int64")}))

    def partials(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "hour": pd.Series([], dtype="int64"),
            "unique_users": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "hour" not in batch.columns:
            return arrow_out(empty)
        g = batch.drop_duplicates().groupby("hour", sort=False) \
            .size().reset_index(name="unique_users")
        return arrow_out(pd.DataFrame({
            "hour": g["hour"].astype("int64"),
            "unique_users": g["unique_users"].astype("int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "hour" not in batch.columns:
            return pa.table({
                "hour": pa.array([], pa.int64()),
                "unique_users": pa.array([], pa.int64())})
        g = batch.groupby("hour", as_index=False, sort=True) \
            ["unique_users"].sum()
        return arrow_out(pd.DataFrame({
            "hour": g["hour"].astype("int64"),
            "unique_users": g["unique_users"].astype("int64")}))

    return strip_schema_metadata(
        events.select_columns(["ts", "user_id"])) \
        .map_batches(pairs, batch_format="pandas") \
        .repartition(num_blocks=k, keys=["user_id"]) \
        .map_batches(partials, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def event_prop_stats(events: ray.data.Dataset, *,
                     key: str = "k") -> ray.data.Dataset:
    """Semi-structured (JSON) column extraction + stats: pull integer
    property ``key`` out of the ``props`` JSON string column and
    aggregate per event type — the JSON-payload shape every web event
    log has.

    The extraction is a compiled C regex over the flat integer
    property (vectorized pandas str.extract — no per-row json.loads
    in the hot path; a nested/typed payload would swap in a real
    parser behind the same partials).  Missing keys are NULL and drop
    from the aggregates, matching SQL.  Bounded-key (type) partials
    (n, sum, min, max) merge in one block.

    Output: (event_type, n, sum_k, min_k, max_k).
    """
    import re as _re

    import pandas as pd

    from .util import arrow_out, strip_schema_metadata
    pat = _re.compile(r'"' + _re.escape(key) + r'"\s*:\s*(-?\d+)')

    def partials(batch: pd.DataFrame) -> pa.Table:
        k = batch["props"].str.extract(pat, expand=False) \
            .astype("float64")
        f = pd.DataFrame({"event_type": batch["event_type"],
                          "k": k}).dropna(subset=["k"])
        if len(f) == 0:
            return arrow_out(pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "sum_k": pd.Series([], dtype="int64"),
                "min_k": pd.Series([], dtype="int64"),
                "max_k": pd.Series([], dtype="int64")}))
        f["k"] = f["k"].astype("int64")
        g = f.groupby("event_type", sort=False)["k"] \
            .agg(n="size", sum_k="sum", min_k="min", max_k="max") \
            .reset_index()
        return arrow_out(pd.DataFrame({
            "event_type": g["event_type"],
            "n": g["n"].astype("int64"),
            "sum_k": g["sum_k"].astype("int64"),
            "min_k": g["min_k"].astype("int64"),
            "max_k": g["max_k"].astype("int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "event_type" not in batch.columns:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_k": pa.array([], pa.int64()),
                "min_k": pa.array([], pa.int64()),
                "max_k": pa.array([], pa.int64())})
        g = batch.groupby("event_type", as_index=False, sort=True) \
            .agg(n=("n", "sum"), sum_k=("sum_k", "sum"),
                 min_k=("min_k", "min"), max_k=("max_k", "max"))
        for c in ("n", "sum_k", "min_k", "max_k"):
            g[c] = g[c].astype("int64")
        return arrow_out(g)

    return strip_schema_metadata(
        events.select_columns(["event_type", "props"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def token_pmi_pairs(ds: ray.data.Dataset, *, top_v: int = 200,
                    k: int = 50, min_pair: int = 5,
                    text_col: str = "text") -> ray.data.Dataset:
    """Collocation mining: top-k token pairs by document-level PMI,
    restricted to the top-V vocabulary — the co-occurrence shape
    (pointwise mutual information over doc containment).

    Unrestricted pair counting is quadratic in doc length; the
    top-V restriction (V bounded, broadcast as a set) bounds the
    WHOLE plan: per-batch partials are <= V^2/2 pair rows + V token
    rows + 1 doc-count row regardless of corpus size, so the merge is
    a single block and there is no keyed shuffle anywhere.  In-batch
    pair generation is a pandas self-merge on doc_id (C code), never
    a Python loop over pairs.  PMI = ln(n_ab*N / (n_a*n_b)) computed
    once per surviving pair at the very end, floor-6, mirrored
    op-for-op in SQL.

    Output: (token_a, token_b, n_pair, pmi), top-k by (pmi desc,
    token_a, token_b).
    """
    import math
    import re as _re

    import pandas as pd

    from .util import arrow_out, strip_schema_metadata
    _TOKEN_RE = _re.compile(r"[^ \t\n\r\f\v]+")

    top = token_frequency_topk(ds, k=top_v,
                               text_col=text_col).to_pandas()
    tok_col = "token" if "token" in top.columns else top.columns[0]
    vocab = set(top[tok_col])

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        rows_d, rows_t = [], []
        for d, t in enumerate(texts):
            seen = set(_TOKEN_RE.findall(t or "")) & vocab
            rows_d.extend([d] * len(seen))
            rows_t.extend(sorted(seen))
        dt = pd.DataFrame({"d": rows_d, "t": rows_t})
        na = dt.groupby("t", sort=False).size().reset_index(name="n")
        m = dt.merge(dt, on="d")
        m = m[m["t_x"] < m["t_y"]]
        np_ = m.groupby(["t_x", "t_y"], sort=False) \
            .size().reset_index(name="n")
        return arrow_out(pd.DataFrame({
            "a": pd.concat([na["t"], np_["t_x"],
                            pd.Series([""], dtype="object")],
                           ignore_index=True),
            "b": pd.concat([pd.Series([""] * len(na), dtype="object"),
                            np_["t_y"],
                            pd.Series([""], dtype="object")],
                           ignore_index=True),
            "n": pd.concat([na["n"], np_["n"],
                            pd.Series([len(texts)], dtype="int64")],
                           ignore_index=True).astype("int64"),
            "kind": pd.concat(
                [pd.Series(["t"] * len(na), dtype="object"),
                 pd.Series(["p"] * len(np_), dtype="object"),
                 pd.Series(["N"], dtype="object")],
                ignore_index=True)}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "token_a": pd.Series([], dtype="object"),
            "token_b": pd.Series([], dtype="object"),
            "n_pair": pd.Series([], dtype="int64"),
            "pmi": pd.Series([], dtype="float64")})
        if len(batch) == 0 or "kind" not in batch.columns:
            return arrow_out(empty)
        N = int(batch.loc[batch["kind"] == "N", "n"].sum())
        na = batch[batch["kind"] == "t"] \
            .groupby("a", sort=False)["n"].sum()
        pr = batch[batch["kind"] == "p"] \
            .groupby(["a", "b"], as_index=False, sort=False)["n"].sum()
        pr = pr[pr["n"] >= min_pair]
        if len(pr) == 0:
            return arrow_out(empty)
        pmi = [math.floor(math.log(
            float(int(n) * N) / float(int(na[a]) * int(na[b])))
            * 1e6) / 1e6
            for a, b, n in zip(pr["a"], pr["b"], pr["n"])]
        out = pd.DataFrame({
            "token_a": pr["a"], "token_b": pr["b"],
            "n_pair": pr["n"].astype("int64"),
            "pmi": pd.Series(pmi, dtype="float64")})
        out = out.sort_values(["pmi", "token_a", "token_b"],
                              ascending=[False, True, True],
                              kind="stable").head(k)
        return arrow_out(out.reset_index(drop=True))

    return strip_schema_metadata(ds.select_columns([text_col])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def events_hourly_pivot(events: ray.data.Dataset
                        ) -> ray.data.Dataset:
    """PIVOT: hourly counts spread into one column per event type —
    the long→wide reshape (dashboard matrices, feature tables).

    Per-batch (hour, type, n) partials are the bounded events_hourly
    shape; the single-block merge pivots with one pandas pivot_table
    (columns discovered there — no driver pre-pull of the type list)
    and emits hour + one int64 column per type, NULL-free (absent
    cells are zero, matching the SQL conditional-sum form).

    Output: (hour, <type columns sorted asc>...).
    """
    import pandas as pd

    from .util import arrow_out, strip_schema_metadata

    def partials(batch: pd.DataFrame) -> pa.Table:
        hours = (batch["ts"].to_numpy(dtype="datetime64[us]")
                 .astype("int64") // 3_600_000_000)
        g = pd.DataFrame({"hour": hours,
                          "event_type": batch["event_type"]}) \
            .groupby(["hour", "event_type"], as_index=False,
                     sort=False).size() \
            .rename(columns={"size": "n"})
        return arrow_out(g)

    def pivot(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "hour" not in batch.columns:
            return pa.table({"hour": pa.array([], pa.int64())})
        w = batch.pivot_table(index="hour", columns="event_type",
                              values="n", aggfunc="sum",
                              fill_value=0).sort_index()
        w = w[sorted(w.columns)]
        out = {"hour": pa.array(w.index.to_numpy(dtype=np.int64))}
        for c in w.columns:
            out[f"n_{c}"] = pa.array(
                w[c].to_numpy(dtype=np.int64))
        return pa.table(out)

    return strip_schema_metadata(
        events.select_columns(["ts", "event_type"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(pivot, batch_format="pandas", batch_size=None)


def doc_length_mad(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Median absolute deviation of document length — the robust-
    dispersion statistic (outlier gates that a variance would let
    giant pages distort).

    ONE histogram pass: the per-batch (length, count) partials are the
    doc_length_percentiles shape; the single-block merge finds the
    median from cumulative counts, then derives the |x − m| histogram
    by FOLDING the value histogram around m (counts at m−d and m+d
    add) — MAD costs zero additional passes over the data.  Both
    medians use nearest-rank (quantile_disc) semantics.

    Output: one row (n_docs, median_len, mad_len).
    """
    import pandas as pd

    from .util import arrow_out

    def partials(batch: pa.Table) -> pa.Table:
        lengths = pc.utf8_length(batch.column("text")).cast(pa.int64())
        vc = pa.table({"n_chars": lengths}).group_by("n_chars") \
            .aggregate([("n_chars", "count")])
        return pa.table({
            "n_chars": vc.column("n_chars"),
            "cnt": vc.column("n_chars_count").cast(pa.int64()),
        })

    def mad_pass(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "n_chars" not in batch.columns:
            return pa.table({
                "n_docs": pa.array([0], pa.int64()),
                "median_len": pa.array([None], pa.int64()),
                "mad_len": pa.array([None], pa.int64())})
        hist = batch.groupby("n_chars", sort=True)["cnt"].sum()
        values = hist.index.to_numpy(dtype=np.int64)
        counts = hist.to_numpy(dtype=np.int64)
        cum = counts.cumsum()
        n = int(cum[-1])
        # nearest-rank: smallest value with cum >= ceil(0.5 * n)
        rank = max(1, int(np.ceil(0.5 * n)))
        m = int(values[np.searchsorted(cum, rank)])
        # fold the histogram around m: dev d collects counts of m-d
        # and m+d (d=0 once)
        dev = np.abs(values - m)
        fold = pd.Series(counts).groupby(dev).sum()
        dvals = fold.index.to_numpy(dtype=np.int64)
        dcum = fold.to_numpy(dtype=np.int64).cumsum()
        mad = int(dvals[np.searchsorted(dcum, rank)])
        return pa.table({
            "n_docs": pa.array([n], pa.int64()),
            "median_len": pa.array([m], pa.int64()),
            "mad_len": pa.array([mad], pa.int64())})

    from .util import strip_schema_metadata
    return strip_schema_metadata(ds.select_columns(["text"])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(mad_pass, batch_format="pandas",
                     batch_size=None)


def events_report(events: ray.data.Dataset) -> ray.data.Dataset:
    """Composed product-analytics report: four verified event
    aggregates (hourly counts, funnel levels, hourly unique users,
    value-histogram bins) emitted as ONE long-form dataset — the
    multi-metric report pipeline (a dashboard refresh is one job, not
    four).

    Each member keeps its own proven plan (bounded-key merges; the
    funnel and unique-users members each pay their one keyed
    exchange); the composition is a lazy union of long rows
    (metric, k, value) — nothing is re-derived, nothing extra moves.

    Output: (metric, k, value), metric ∈ {hourly, funnel,
    unique_users, value_hist}.
    """
    import pandas as pd

    from .util import arrow_out
    from .windows import funnel_counts

    def long3(metric, kcol, vcol, keep=None):
        def f(batch: pd.DataFrame) -> pa.Table:
            if len(batch) == 0 or kcol not in batch.columns:
                return pa.table({
                    "metric": pa.array([], pa.string()),
                    "k": pa.array([], pa.string()),
                    "value": pa.array([], pa.int64())})
            b = keep(batch) if keep is not None else batch
            # .to_numpy(): a filtered frame keeps its original index
            # and pd.DataFrame would align-join it against the fresh
            # metric column, nulling every filtered row
            return arrow_out(pd.DataFrame({
                "metric": pd.Series([metric] * len(b),
                                    dtype="object"),
                "k": pd.Series(
                    b[kcol].to_numpy(dtype=np.int64)).astype(str),
                "value": pd.Series(
                    b[vcol].to_numpy(dtype=np.int64))}))
        return f

    # per-hour totals = the cube's hour margins (type NULL, hour set)
    hourly = events_hourly_cube(events).map_batches(
        long3("hourly", "hour", "n_events",
              keep=lambda b: b[b["event_type"].isna()
                               & b["hour"].notna()]),
        batch_format="pandas")
    funnel = funnel_counts(events).map_batches(
        long3("funnel", "steps_completed", "n_users"),
        batch_format="pandas")
    uniq = events_hourly_unique_users(events).map_batches(
        long3("unique_users", "hour", "unique_users"),
        batch_format="pandas")
    hist = event_value_histogram(events).map_batches(
        long3("value_hist", "bin", "n_events"),
        batch_format="pandas")
    return hourly.union(funnel).union(uniq).union(hist)


def event_value_zscores(events: ray.data.Dataset
                        ) -> ray.data.Dataset:
    """Group-statistics enrichment: every event's value z-scored
    against its HOUR's mean/std — the aggregate-broadcast-back shape
    behind per-row anomaly features (no join: group stats are bounded,
    so they ride one ray.put).

    Pass 1 ships exact int64 (hour, n, Σc, Σc²) partials (values are
    2-decimal → exact cents); the driver folds them into Python big
    ints per hour and broadcasts one dict.  Pass 2 is a pure map:
    z = (cents − mean) / std with mean = s/n and std =
    sqrt((n·Σc² − s²)/n²) — every float step mirrored op-for-op in
    the HUGEINT SQL, floor-6; single-event / zero-variance hours emit
    NULL.

    Output: (event_id, hour, z) per event.
    """
    import math

    import pandas as pd
    import ray as _ray

    from .lmscore import _get_broadcast
    from .util import arrow_out, strip_schema_metadata

    def partials(batch: pd.DataFrame) -> pa.Table:
        hours = (batch["ts"].to_numpy(dtype="datetime64[us]")
                 .astype("int64") // 3_600_000_000)
        c = np.rint(batch["value"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame({"hour": hours, "n": 1, "s": c,
                          "ssq": c * c}) \
            .groupby("hour", as_index=False, sort=False).sum()
        return arrow_out(pd.DataFrame({
            "hour": g["hour"].astype("int64"),
            "n": g["n"].astype("int64"),
            "s": g["s"].astype("int64"),
            "ssq": g["ssq"].astype("int64")}))

    rows = strip_schema_metadata(
        events.select_columns(["ts", "value"])) \
        .map_batches(partials, batch_format="pandas").take_all()
    stats: dict = {}
    for r in rows:
        h = int(r["hour"])
        n0, s0, q0 = stats.get(h, (0, 0, 0))
        stats[h] = (n0 + int(r["n"]), s0 + int(r["s"]),
                    q0 + int(r["ssq"]))
    ms: dict = {}
    for h, (n, s, ssq) in stats.items():
        if n < 2:
            ms[h] = None
            continue
        var = float(n * ssq - s * s) / float(n * n)
        std = math.sqrt(var)
        ms[h] = None if std == 0.0 else (float(s) / float(n), std)
    ref = _ray.put(ms)

    def zmap(batch: pd.DataFrame, *, ref) -> pa.Table:
        m = _get_broadcast(ref)
        hours = (batch["ts"].to_numpy(dtype="datetime64[us]")
                 .astype("int64") // 3_600_000_000)
        c = np.rint(batch["value"].to_numpy() * 100).astype(np.int64)
        z = np.zeros(len(batch), dtype=np.float64)
        ok = np.zeros(len(batch), dtype=bool)
        for h in np.unique(hours):
            st = m.get(int(h))
            if st is None:
                continue
            mean, std = st
            sel = hours == h
            z[sel] = np.floor((c[sel] - mean) / std * 1e6) / 1e6
            ok[sel] = True
        return pa.table({
            "event_id": pa.array(
                batch["event_id"].to_numpy(dtype=np.int64)),
            "hour": pa.array(hours),
            "z": pa.array(z, mask=~ok)})

    return strip_schema_metadata(
        events.select_columns(["event_id", "ts", "value"])) \
        .map_batches(zmap, batch_format="pandas",
                     fn_kwargs={"ref": ref})


def doc_length_cdf(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Empirical CDF of document length: one row per DISTINCT length
    with its cumulative count and floor-6 cumulative fraction — the
    distribution-export shape (drift dashboards diff two of these).

    Same one-histogram-pass topology as doc_length_percentiles: the
    exchange moves (length, count) partials bounded by distinct
    lengths × batches, never rows; the single-block merge sorts and
    cumsum's.  Output: (n_chars, n_docs, cum_docs, cum_frac).
    """
    import pandas as pd

    from .util import arrow_out, strip_schema_metadata

    def partials(batch: pa.Table) -> pa.Table:
        lengths = pc.utf8_length(batch.column("text")).cast(pa.int64())
        vc = pa.table({"n_chars": lengths}).group_by("n_chars") \
            .aggregate([("n_chars", "count")])
        return pa.table({
            "n_chars": vc.column("n_chars"),
            "cnt": vc.column("n_chars_count").cast(pa.int64()),
        })

    def cdf(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "n_chars" not in batch.columns:
            return pa.table({
                "n_chars": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "cum_docs": pa.array([], pa.int64()),
                "cum_frac": pa.array([], pa.float64())})
        hist = batch.groupby("n_chars", sort=True)["cnt"].sum()
        values = hist.index.to_numpy(dtype=np.int64)
        counts = hist.to_numpy(dtype=np.int64)
        cum = counts.cumsum()
        n = float(cum[-1])
        frac = np.floor(cum.astype(np.float64) / n * 1e6) / 1e6
        return arrow_out(pd.DataFrame({
            "n_chars": values, "n_docs": counts,
            "cum_docs": cum.astype(np.int64), "cum_frac": frac}))

    return strip_schema_metadata(ds.select_columns(["text"])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(cdf, batch_format="pandas", batch_size=None)


def value_time_correlation_by_type(events: ray.data.Dataset
                                   ) -> ray.data.Dataset:
    """GROUPED exact Pearson correlation: per event type, r between
    event value and event time — the drift detector (is this metric
    trending?).

    Times are offset to the corpus minimum second (one bounded pull,
    mirrored in SQL as a scalar subquery) so every product stays
    int64-exact per batch (offsets ≤ corpus span in seconds); the
    per-type (n, Σx, Σy, Σxy, Σx², Σy²) partials are int64 per batch
    and merge as Python big ints carried in STRING columns (the
    quantity_price_correlation technique, grouped).  Groups are
    bounded → single-block merge; the only float steps mirror the
    HUGEINT SQL op-for-op at floor-6.

    Output: (event_type, n, corr_value_time).
    """
    import math

    import pandas as pd

    from .util import arrow_out, strip_schema_metadata
    FLOOR6 = 1_000_000

    def min_sec(batch: pd.DataFrame) -> pa.Table:
        t = batch["ts"].to_numpy(dtype="datetime64[us]") \
            .astype(np.int64) // 1_000_000
        return arrow_out(pd.DataFrame({
            "lo": pd.Series([int(t.min())], dtype="int64")}))

    rows = strip_schema_metadata(events.select_columns(["ts"])) \
        .map_batches(min_sec, batch_format="pandas").take_all()
    base = min(int(r["lo"]) for r in rows)

    def partials(batch: pd.DataFrame) -> pa.Table:
        x = (batch["ts"].to_numpy(dtype="datetime64[us]")
             .astype(np.int64) // 1_000_000) - base
        y = np.rint(batch["value"].to_numpy() * 100).astype(np.int64)
        f = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "n": 1, "sx": x, "sy": y, "sxy": x * y,
            "sxx": x * x, "syy": y * y}) \
            .groupby("event_type", as_index=False, sort=False).sum()
        out = pd.DataFrame({"event_type": f["event_type"],
                            "n": f["n"].astype("int64")})
        for c in ("sx", "sy", "sxy", "sxx", "syy"):
            out[c] = f[c].astype("int64").astype(str)
        return arrow_out(out)

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "event_type" not in batch.columns:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "corr_value_time": pa.array([], pa.float64())})
        types, ns, rs = [], [], []
        for t in sorted(batch["event_type"].unique()):
            b = batch[batch["event_type"] == t]
            n = int(b["n"].sum())
            sx = sum(int(v) for v in b["sx"])
            sy = sum(int(v) for v in b["sy"])
            sxy = sum(int(v) for v in b["sxy"])
            sxx = sum(int(v) for v in b["sxx"])
            syy = sum(int(v) for v in b["syy"])
            num = float(n * sxy - sx * sy)
            den = math.sqrt(float(n * sxx - sx * sx)) * \
                math.sqrt(float(n * syy - sy * sy))
            r = None if den == 0.0 else \
                np.floor(num / den * FLOOR6) / FLOOR6
            types.append(t)
            ns.append(n)
            rs.append(r)
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "corr_value_time": pa.array(rs, pa.float64())})

    return strip_schema_metadata(
        events.select_columns(["event_type", "ts", "value"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def events_sessionize(ds: ray.data.Dataset, gap_minutes: int = 30,
                      n_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Session windows per user: a gap > gap_minutes starts a new
    session.  Output: user_id, n_events, n_sessions,
    longest_session_events.

    Scale shape (VERDICT.md #9 — no per-user ``map_groups``, which
    costs one pandas call per user): ONE hash shuffle co-locates each
    user's events in one of O(cores×4) partitions
    (``repartition(keys=["user_id"])``); within a partition a single
    vectorized pass sorts by (user, ts), marks session starts where
    the user changes or the gap exceeds the threshold, and reduces
    per-user stats with groupby aggregates over the whole partition.
    Partitioning assumption: one user's events fit in one partition —
    the key must be fine-grained enough that no single user approaches
    a block (holds for any real user-activity distribution; salt by
    time-range for adversarial single-key streams).
    """
    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()
    gap_us = gap_minutes * 60 * 1_000_000

    def sessionize_partition(batch: pd.DataFrame):
        from .util import arrow_out
        if len(batch) == 0:
            return arrow_out(pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "n_sessions": pd.Series([], dtype="int64"),
                "longest_session_events": pd.Series([], dtype="int64"),
            }))
        users = batch["user_id"].to_numpy(dtype=np.int64)
        ts = batch["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        order = np.lexsort((ts, users))
        users, ts = users[order], ts[order]
        user_change = np.empty(len(users), dtype=bool)
        user_change[0] = True
        user_change[1:] = users[1:] != users[:-1]
        gap_break = np.empty(len(ts), dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_session = user_change | gap_break
        session_id = np.cumsum(new_session) - 1  # global over partition
        session_len = np.bincount(session_id)
        frame = pd.DataFrame({
            "user_id": users[new_session],
            "session_len": session_len,
        })
        per_user = frame.groupby("user_id", sort=True)["session_len"] \
            .agg(n_events="sum", n_sessions="count",
                 longest_session_events="max").reset_index()
        from .util import arrow_out
        return arrow_out(per_user.astype({
            "user_id": "int64", "n_events": "int64",
            "n_sessions": "int64", "longest_session_events": "int64"}))

    from .util import strip_schema_metadata
    return strip_schema_metadata(ds.select_columns(["user_id", "ts"])) \
        .repartition(num_blocks=k, keys=["user_id"]) \
        .map_batches(sessionize_partition, batch_format="pandas",
                     batch_size=None)


def quality_filter(ds: ray.data.Dataset, min_tokens: int = 20,
                   max_stop_ratio: float = 0.4,
                   max_punct_ratio: float = 0.1) -> ray.data.Dataset:
    """Training-data quality gate: keep documents passing the signal
    thresholds (composition of quality_scores + a vectorized filter —
    the standard pre-training corpus cleaning step)."""
    scored = quality_scores(ds)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        mask = pc2.and_(
            pc2.and_(
                pc2.greater_equal(batch.column("n_tokens"), min_tokens),
                pc2.less_equal(batch.column("stop_ratio"), max_stop_ratio)),
            pc2.less_equal(batch.column("punct_ratio"), max_punct_ratio))
        return batch.filter(mask)

    return scored.map_batches(keep, batch_format="pyarrow")


def corpus_clean(ds: ray.data.Dataset, *, min_tokens: int = 30,
                 max_stop_ratio: float = 0.3,
                 max_punct_ratio: float = 0.08,
                 langs: tuple = ("en",),
                 n_partitions: int | None = None) -> ray.data.Dataset:
    """The composed training-corpus cleaning pass, end to end:
    quality gate ∘ exact-dedup keep-first ∘ language filter.

    Shape: one vectorized scoring map (quality_scores) and a map-side
    language/quality filter; the only shuffle is the exact-dedup
    keeper selection (md5 groupby → Min(doc_id)) joined back as a
    semi-join on doc_id (hash join on ids — text never moves).  Fully
    SQL-expressible, so the whole composition is oracle-checked.
    Output: the surviving documents' quality rows + lang.
    """
    import pyarrow.compute as pc2

    from ..state import default_partitions, ensure_hash_shuffle
    from .dedup import content_hashes
    from .util import strip_schema_metadata
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()

    def keeper_ids(batch) -> pa.Table:
        # per-partition pandas min — same single exchange as Ray's
        # HashAggregate without its mostly-unique-key wall (see
        # dedup.exact_dedup); schema-less empty blocks guarded
        if len(batch) == 0 or "text_hash" not in batch.columns:
            return pa.table({"keep_id": pa.array([], pa.int64())})
        g = batch.groupby("text_hash", sort=False)["doc_id"].min()
        return pa.table({"keep_id": pa.array(g.to_numpy(), pa.int64())})

    keep = content_hashes(ds) \
        .repartition(num_blocks=k, keys=["text_hash"]) \
        .map_batches(keeper_ids, batch_format="pandas",
                     batch_size=None) \
        .repartition(max(2, k // 8))  # scrub schema-less empties pre-join

    scored = quality_scores(ds)
    lang_col = strip_schema_metadata(ds.select_columns(["doc_id", "lang"]))
    scored = scored.join(lang_col, "inner", num_partitions=k,
                         on=("doc_id",), right_on=("doc_id",))

    def keep_quality(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return batch
        mask = pc2.and_(
            pc2.and_(
                pc2.greater_equal(batch.column("n_tokens"), min_tokens),
                pc2.less_equal(batch.column("stop_ratio"), max_stop_ratio)),
            pc2.and_(
                pc2.less_equal(batch.column("punct_ratio"),
                               max_punct_ratio),
                pc2.is_in(batch.column("lang"),
                          value_set=pa.array(list(langs)))))
        return batch.filter(mask)

    filtered = scored.map_batches(keep_quality, batch_format="pyarrow")
    # semi-join against the keeper ids (ids only cross the exchange)
    out = filtered.join(keep, "inner", num_partitions=k,
                        on=("doc_id",), right_on=("keep_id",))

    def tidy(batch: pa.Table) -> pa.Table:
        cols = ["doc_id", "lang", "n_chars", "n_tokens", "stop_ratio",
                "punct_ratio", "mean_token_len"]
        if batch.num_columns == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "stop_ratio": pa.array([], pa.float64()),
                "punct_ratio": pa.array([], pa.float64()),
                "mean_token_len": pa.array([], pa.float64()),
            })
        return batch.select(cols)

    return out.map_batches(tidy, batch_format="pyarrow")


def tfidf_top_terms(ds: ray.data.Dataset, k: int = 5,
                    n_docs: int | None = None,
                    n_partitions: int | None = None) -> ray.data.Dataset:
    """Top-k TF-IDF terms per document (tfidf = tf · ln(N/df)) — the
    classic per-document keyword signal (corpus search, topic tags,
    near-dup explanations).

    Scale shape, two keyed exchanges and nothing else:

    1. per-batch (doc_id, token, tf) partials — each document lives in
       exactly one batch, so its tf rows are final; the raw token
       stream never crosses a wire;
    2. ``repartition(keys=["token"])`` co-locates each token, and ONE
       per-partition pandas pass both computes df (the token's group
       size — every doc row for it is present) and scores tfidf;
    3. ``repartition(keys=["doc_id"])`` + per-partition head(k) by
       (-tfidf, token) — deterministic ties, no Dataset-level
       HashAggregate anywhere.

    N is the one scalar: ``ds.count()`` (parquet metadata read) unless
    passed in.  Scores are floor-6 so the DuckDB oracle hashes
    identically (ln on float64 agrees bit-for-bit — same libm).
    """
    import re as _re

    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()
    n = float(n_docs if n_docs is not None else ds.count())
    token_re = _re.compile(r"[^ \t\n\r\f\v]+")

    def tf_rows(batch: pa.Table) -> pa.Table:
        import collections
        ids: list = []
        toks: list = []
        tfs: list = []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            for tok, c in collections.Counter(
                    token_re.findall(text or "")).items():
                ids.append(doc_id)
                toks.append(tok)
                tfs.append(c)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    def score(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "token" not in batch.columns:
            # hash-shuffle empty partitions arrive as schema-less blocks
            return arrow_out(pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "token": pd.Series([], dtype="object"),
                 "tf": pd.Series([], dtype="int64"),
                 "tfidf": pd.Series([], dtype="float64")}))
        df = batch.groupby("token", sort=False)["doc_id"] \
            .transform("size").to_numpy()
        tfidf = np.floor(batch["tf"].to_numpy()
                         * np.log(n / df) * 1e6) / 1e6
        return arrow_out(batch.assign(tfidf=tfidf))

    def topk(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "doc_id" not in batch.columns:
            return arrow_out(pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "token": pd.Series([], dtype="object"),
                 "tf": pd.Series([], dtype="int64"),
                 "tfidf": pd.Series([], dtype="float64")}))
        kept = batch.sort_values(["doc_id", "tfidf", "token"],
                                 ascending=[True, False, True]) \
            .groupby("doc_id", sort=False).head(k)
        return arrow_out(kept.reset_index(drop=True))

    return ds.map_batches(tf_rows, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["token"]) \
        .map_batches(score, batch_format="pandas", batch_size=None) \
        .repartition(num_blocks=n_parts, keys=["doc_id"]) \
        .map_batches(topk, batch_format="pandas", batch_size=None)


def top_users_per_type(events: ray.data.Dataset, k: int = 5, *,
                       n_partitions: int | None = None
                       ) -> ray.data.Dataset:
    """Per-group top-k (the leaderboard shape): the k most active
    users per event type, rank by (count desc, user_id asc — fully
    deterministic).

    Two-level top-k over a corpus-sized key: map-side (type, user)
    count combiners → ONE user-keyed exchange (each user's partials
    co-locate, so per-partition sums are exact finals) → per-partition
    local top-k per type → one tiny merge block re-heads the
    candidates.  The merge sees ≤ |types|×k×partitions rows — never
    O(users).  Output: (event_type, user_id, n_events, rank).
    """
    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(events)
    parts = n_partitions or default_partitions()

    def partials(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(["event_type", "user_id"], as_index=False,
                          sort=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return arrow_out(g)

    def local_topk(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "event_type" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "user_id": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64")}))
        g = batch.groupby(["event_type", "user_id"], as_index=False,
                          sort=False)["n"].sum()
        g = g.sort_values(["event_type", "n", "user_id"],
                          ascending=[True, False, True], kind="stable")
        return arrow_out(g.groupby("event_type", sort=False).head(k)
                         .reset_index(drop=True))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "event_type" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64")}))
        # user-keyed exchange co-located each user: sums are final,
        # the merge only re-heads the partition candidates
        g = batch.sort_values(["event_type", "n", "user_id"],
                              ascending=[True, False, True],
                              kind="stable")
        top = g.groupby("event_type", sort=False).head(k) \
            .reset_index(drop=True)
        top["rank"] = top.groupby("event_type", sort=False) \
            .cumcount() + 1
        return arrow_out(pd.DataFrame({
            "event_type": top["event_type"],
            "user_id": top["user_id"],
            "n_events": top["n"].astype("int64"),
            "rank": top["rank"].astype("int64")}))

    return strip_schema_metadata(
        events.select_columns(["event_type", "user_id"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(num_blocks=parts, keys=["user_id"]) \
        .map_batches(local_topk, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def events_hourly_rollup(events: ray.data.Dataset
                         ) -> ray.data.Dataset:
    """GROUP BY ROLLUP(event_type, hour): the grouping-sets shape —
    per-(type, hour) counts plus per-type margins plus the grand
    total, NULL-keyed margins exactly as SQL ROLLUP emits them.

    Bounded-cardinality key (|types|×|hours|), so this is the
    pricing_summary rule: per-batch partials collapse each block to
    ≤ groups rows, ONE single-block merge computes all three grouping
    sets — no keyed shuffle at any corpus size.  Output:
    (event_type, hour, n_events) with NULLs marking margin rows.
    """
    import pandas as pd

    from .util import arrow_out, strip_schema_metadata

    def partials(batch: pd.DataFrame) -> pa.Table:
        hours = (batch["ts"].to_numpy(dtype="datetime64[us]")
                 .astype("int64") // 3_600_000_000)
        frame = pd.DataFrame({"event_type": batch["event_type"],
                              "hour": hours})
        g = frame.groupby(["event_type", "hour"], as_index=False,
                          sort=False).size() \
            .rename(columns={"size": "n"})
        return arrow_out(g)

    def rollup(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "event_type" not in batch.columns:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "hour": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())})
        g = batch.groupby(["event_type", "hour"], as_index=False,
                          sort=False)["n"].sum()
        by_type = g.groupby("event_type", as_index=False,
                            sort=False)["n"].sum()
        rows_t, rows_h, rows_n = [], [], []
        for r in g.itertuples(index=False):
            rows_t.append(r.event_type)
            rows_h.append(int(r.hour))
            rows_n.append(int(r.n))
        for r in by_type.itertuples(index=False):
            rows_t.append(r.event_type)
            rows_h.append(None)
            rows_n.append(int(r.n))
        rows_t.append(None)
        rows_h.append(None)
        rows_n.append(int(g["n"].sum()))
        return pa.table({
            "event_type": pa.array(rows_t, pa.string()),
            "hour": pa.array(rows_h, pa.int64()),
            "n_events": pa.array(rows_n, pa.int64())})

    return strip_schema_metadata(
        events.select_columns(["event_type", "ts"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(rollup, batch_format="pandas", batch_size=None)


def events_hourly_cube(events: ray.data.Dataset
                       ) -> ray.data.Dataset:
    """GROUP BY CUBE(event_type, hour): all FOUR grouping sets —
    per-(type, hour) cells, per-type margins, per-hour margins, and
    the grand total, NULL-keyed margins exactly as SQL CUBE emits
    them.  Same bounded-key topology as events_hourly_rollup (the
    pricing_summary rule): per-batch partials collapse each block to
    <= |types|x|hours| rows, one single-block merge derives every
    grouping set from the finalized cells — margins cost zero extra
    passes over the data.

    Output: (event_type, hour, n_events), NULLs marking margins.
    """
    import pandas as pd

    from .util import arrow_out, strip_schema_metadata

    def partials(batch: pd.DataFrame) -> pa.Table:
        hours = (batch["ts"].to_numpy(dtype="datetime64[us]")
                 .astype("int64") // 3_600_000_000)
        frame = pd.DataFrame({"event_type": batch["event_type"],
                              "hour": hours})
        g = frame.groupby(["event_type", "hour"], as_index=False,
                          sort=False).size() \
            .rename(columns={"size": "n"})
        return arrow_out(g)

    def cube(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "event_type" not in batch.columns:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "hour": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())})
        g = batch.groupby(["event_type", "hour"], as_index=False,
                          sort=False)["n"].sum()
        by_type = g.groupby("event_type", as_index=False,
                            sort=False)["n"].sum()
        by_hour = g.groupby("hour", as_index=False,
                            sort=False)["n"].sum()
        rows_t, rows_h, rows_n = [], [], []
        for r in g.itertuples(index=False):
            rows_t.append(r.event_type)
            rows_h.append(int(r.hour))
            rows_n.append(int(r.n))
        for r in by_type.itertuples(index=False):
            rows_t.append(r.event_type)
            rows_h.append(None)
            rows_n.append(int(r.n))
        for r in by_hour.itertuples(index=False):
            rows_t.append(None)
            rows_h.append(int(r.hour))
            rows_n.append(int(r.n))
        rows_t.append(None)
        rows_h.append(None)
        rows_n.append(int(g["n"].sum()))
        return pa.table({
            "event_type": pa.array(rows_t, pa.string()),
            "hour": pa.array(rows_h, pa.int64()),
            "n_events": pa.array(rows_n, pa.int64())})

    return strip_schema_metadata(
        events.select_columns(["event_type", "ts"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(cube, batch_format="pandas", batch_size=None)


def event_value_histogram(events: ray.data.Dataset, *,
                          width: float = 10.0) -> ray.data.Dataset:
    """Binned value histogram — the fixed-width numeric histogram
    primitive (monitoring dashboards, distribution drift checks).

    bin = floor(value / width): one IEEE division + floor, identical
    on both sides (width is a power-of-two-friendly literal; the
    division is correctly rounded in both numpy and DuckDB, so bin
    ids are bit-equal).  Per-batch bincount partials are bounded by
    the VALUE RANGE, not the row count, so the merge is the
    pricing_summary single-block rule — no keyed shuffle at any
    corpus size.  Output: (bin, lo, n_events) with lo = bin*width.
    """
    import pandas as pd

    from .util import arrow_out, strip_schema_metadata

    def partials(batch: pd.DataFrame) -> pa.Table:
        v = batch["value"].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        bins = np.floor(v / width).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return arrow_out(pd.DataFrame({
            "bin": u.astype(np.int64),
            "n_events": c.astype(np.int64)}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "bin" not in batch.columns:
            return pa.table({
                "bin": pa.array([], pa.int64()),
                "lo": pa.array([], pa.float64()),
                "n_events": pa.array([], pa.int64())})
        g = batch.groupby("bin", as_index=False, sort=True)
        g = g["n_events"].sum()
        return arrow_out(pd.DataFrame({
            "bin": g["bin"].astype("int64"),
            "lo": g["bin"].to_numpy(dtype=np.float64) * width,
            "n_events": g["n_events"].astype("int64")}))

    return strip_schema_metadata(events.select_columns(["value"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def events_hopping_counts(events: ray.data.Dataset, *,
                          window_min: int = 60,
                          hop_min: int = 15) -> ray.data.Dataset:
    """Hopping-window counts — the OVERLAPPING-window streaming shape
    tumbling hourly can't express: windows of ``window_min`` minutes
    advancing every ``hop_min`` (window_min must be a multiple of
    hop_min), each event counted in window_min/hop_min windows.

    The explode happens INSIDE the batch and collapses to per-(type,
    window) partials before anything moves — a batch of n events emits
    ≤ |types|×|windows-in-batch-span| rows, not n×m.  The merge key is
    bounded (|types| × time-range/hop), so it is the pricing_summary
    single-block rule; no keyed shuffle at any corpus size.

    Output: (event_type, window_start_min, n_events) — window_start_min
    the window's start in epoch minutes, n_events the count of events
    with window_start ≤ t < window_start + window_min.
    """
    if window_min % hop_min != 0:
        raise ValueError("window_min must be a multiple of hop_min")
    m = window_min // hop_min

    import pandas as pd

    from .util import arrow_out, strip_schema_metadata

    def partials(batch: pd.DataFrame) -> pa.Table:
        tmin = (batch["ts"].to_numpy(dtype="datetime64[us]")
                .astype("int64") // 60_000_000)
        base = (tmin // hop_min) * hop_min
        types = batch["event_type"].to_numpy()
        frame = pd.DataFrame({
            "event_type": np.tile(types, m),
            "window_start_min": np.concatenate(
                [base - j * hop_min for j in range(m)]),
        })
        g = frame.groupby(["event_type", "window_start_min"],
                          as_index=False, sort=False).size() \
            .rename(columns={"size": "n"})
        return arrow_out(g)

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "event_type" not in batch.columns:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "window_start_min": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())})
        g = batch.groupby(["event_type", "window_start_min"],
                          as_index=False, sort=True)["n"].sum() \
            .rename(columns={"n": "n_events"})
        g["window_start_min"] = g["window_start_min"].astype("int64")
        g["n_events"] = g["n_events"].astype("int64")
        return arrow_out(g)

    return strip_schema_metadata(
        events.select_columns(["event_type", "ts"])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def lang_source_chisq(ds: ray.data.Dataset, *,
                      row_col: str = "lang",
                      col_col: str = "source") -> ray.data.Dataset:
    """Chi-square independence test over a contingency table — the
    corpus-drift / sampling-bias check (is language distribution
    independent of source?).

    Scale shape: the contingency cells are BOUNDED (|langs|×|sources|),
    so per-batch combiners shed the corpus to cell-count partials and
    ONE single-block merge computes marginals and the statistic — the
    pricing_summary bounded-key rule, no shuffle.  Counts are exact
    int64; expected counts and per-cell contributions are floor-6
    doubles derived from them (E = row_tot·col_tot/N, contrib =
    (O−E)²/E — both mirrored op-for-op in the SQL oracle).

    Output: one row per observed cell (lang, source, observed,
    expected, contrib), ordered by (lang, source).  Σcontrib is the
    chi-square statistic with (R−1)(C−1) degrees of freedom.
    """
    import pandas as pd

    from .util import arrow_out, strip_schema_metadata

    def partials(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby([row_col, col_col], sort=False) \
            .size().reset_index(name="observed")
        return arrow_out(pd.DataFrame({
            "lang": g[row_col],
            "source": g[col_col],
            "observed": g["observed"].astype("int64")}))

    empty = pd.DataFrame({
        "lang": pd.Series([], dtype="object"),
        "source": pd.Series([], dtype="object"),
        "observed": pd.Series([], dtype="int64"),
        "expected": pd.Series([], dtype="float64"),
        "contrib": pd.Series([], dtype="float64")})

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "lang" not in batch.columns:
            return arrow_out(empty.copy())
        g = batch.groupby(["lang", "source"], as_index=False,
                          sort=True)["observed"].sum()
        n = float(g["observed"].sum())
        row_tot = g.groupby("lang")["observed"].transform("sum") \
            .to_numpy(dtype=np.float64)
        col_tot = g.groupby("source")["observed"].transform("sum") \
            .to_numpy(dtype=np.float64)
        o = g["observed"].to_numpy(dtype=np.float64)
        e = row_tot * col_tot / n
        d = o - e
        contrib = d * d / e  # explicit multiply — mirrors the SQL
        # (x**2 may route through pow and differ in the last ulp)
        g["expected"] = np.floor(e * 1e6) / 1e6
        g["contrib"] = np.floor(contrib * 1e6) / 1e6
        g["observed"] = g["observed"].astype("int64")
        return arrow_out(g.reset_index(drop=True))

    return strip_schema_metadata(
        ds.select_columns([row_col, col_col])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def flesch_reading_ease(ds: ray.data.Dataset, *,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> ray.data.Dataset:
    """Flesch reading-ease score (Flesch 1948) per document — the
    classic prose-difficulty signal a training-data quality gate
    filters on alongside the Gopher rules.

    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)``
    with the standard regex approximations: words = ``[A-Za-z]+``
    runs, sentences = ``[.!?]+`` runs (min 1 once any word exists),
    syllables = vowel-group runs ``[AEIOUYaeiouy]+`` (a vowel run
    never crosses a word boundary, so the whole-text count equals the
    per-word sum).  All three counts come from ONE vectorized
    ``pc.count_substring_regex`` pass per pattern — RE2 on both the
    Ray and DuckDB sides, so the counts are bit-equal; the float
    expression is mirrored op-for-op left-associated, floor-6.
    Zero-word docs score NULL.

    ONE stateless map, no exchange.  Output: (doc_id, n_words,
    n_sentences, n_syllables, flesch).
    """
    from .util import strip_schema_metadata

    def score(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column(text_col), "")
        w = pc.count_substring_regex(txt, pattern=r"[A-Za-z]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(txt, pattern=r"[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.count_substring_regex(
            txt, pattern=r"[AEIOUYaeiouy]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s_eff = np.maximum(s, 1).astype(np.float64)
        w_f = w.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            fre = 206.835 - 1.015 * (w_f / s_eff) \
                - 84.6 * (y.astype(np.float64) / w_f)
            fre = np.floor(fre * 1e6) / 1e6
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(w, pa.int64()),
            "n_sentences": pa.array(s, pa.int64()),
            "n_syllables": pa.array(y, pa.int64()),
            "flesch": pa.array(
                np.where(w > 0, fre, np.nan), pa.float64(),
                mask=(w == 0)),
        })

    return strip_schema_metadata(
        ds.select_columns([id_col, text_col])) \
        .map_batches(score, batch_format="pyarrow")


def session_table(events: ray.data.Dataset, gap_minutes: int = 30,
                  n_partitions: int | None = None
                  ) -> ray.data.Dataset:
    """Per-SESSION rows (one granularity below events_sessionize's
    per-user summary): (user_id, session_idx, n_events, start_ts,
    end_ts, duration_us) — the session table a product-analytics
    mart materializes once and every funnel/retention query joins.

    Same scale silhouette as events_sessionize: ONE user-keyed
    exchange, then a single vectorized pass per partition (sort,
    gap flags, cumsum session ids, groupby-aggregate).  session_idx
    is 1-based per user in start-time order.  Tied timestamps share
    a session id on both sides (a tie's gap is 0, and the SQL
    running sum uses the default RANGE frame, so every tied row sees
    the same break total).
    """
    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(events)
    k = n_partitions or default_partitions()
    gap_us = gap_minutes * 60 * 1_000_000

    def per_partition(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "user_id" not in batch.columns:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_ts": pa.array([], pa.timestamp("us")),
                "end_ts": pa.array([], pa.timestamp("us")),
                "duration_us": pa.array([], pa.int64()),
            })
        users = batch["user_id"].to_numpy(dtype=np.int64)
        ts = batch["ts"].to_numpy(dtype="datetime64[us]") \
            .astype("int64")
        order = np.lexsort((ts, users))
        users, ts = users[order], ts[order]
        n = len(users)
        user_change = np.empty(n, dtype=bool)
        user_change[0] = True
        user_change[1:] = users[1:] != users[:-1]
        gap_break = np.empty(n, dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_session = user_change | gap_break
        sid = np.cumsum(new_session)               # 1-based global
        # per-user 1-based index: subtract the sid just before the
        # user's first session
        first_idx = np.maximum.accumulate(
            np.where(user_change, np.arange(n), 0))
        sidx = sid - sid[first_idx] + 1
        df = pd.DataFrame({"user_id": users, "sid": sid,
                           "sidx": sidx, "ts": ts})
        g = df.groupby("sid", sort=True)
        out = pd.DataFrame({
            "user_id": g["user_id"].first(),
            "session_idx": g["sidx"].first(),
            "n_events": g.size(),
            "start": g["ts"].min(),
            "end": g["ts"].max(),
        })
        out["duration_us"] = out["end"] - out["start"]
        return pa.table({
            "user_id": pa.array(out["user_id"].to_numpy(np.int64)),
            "session_idx": pa.array(
                out["session_idx"].to_numpy(np.int64)),
            "n_events": pa.array(out["n_events"].to_numpy(np.int64)),
            "start_ts": pa.array(out["start"].to_numpy(np.int64),
                                 pa.timestamp("us")),
            "end_ts": pa.array(out["end"].to_numpy(np.int64),
                               pa.timestamp("us")),
            "duration_us": pa.array(
                out["duration_us"].to_numpy(np.int64)),
        })

    return strip_schema_metadata(
        events.select_columns(["user_id", "ts"])) \
        .repartition(num_blocks=k, keys=["user_id"]) \
        .map_batches(per_partition, batch_format="pandas",
                     batch_size=None)


def vocab_coverage(ds: ray.data.Dataset, *,
                   vocab_size: int = 64,
                   text_col: str = "text",
                   group_col: str = "lang",
                   id_col: str = "doc_id",
                   n_partitions: int | None = None
                   ) -> ray.data.Dataset:
    """Vocabulary coverage / OOV-rate report — the pre-training sanity
    check "what fraction of corpus token OCCURRENCES fall outside the
    model's top-V vocabulary", broken down per group (language).

    Scale shape: the vocabulary is the proven two-level top-k
    (:func:`token_frequency_topk` — count desc, token asc ties), a
    BOUNDED V-row driver pull broadcast into the scan closure as a
    frozen set; the scan itself is one stateless pass emitting
    per-batch (group, docs, tokens, oov) partials, merged in a single
    block (bounded group cardinality — the events_hourly rule: never a
    keyed shuffle for a bounded-key merge).  Nothing but the partial
    rows ever moves.

    Output: (lang, n_docs, n_tokens, n_oov, oov_rate) — oov_rate
    floor-6, NULL when a group has zero tokens.
    """
    import re as _re

    from .util import arrow_out, strip_schema_metadata

    vocab_rows = token_frequency_topk(
        ds, k=vocab_size, text_col=text_col).take_all()
    tok_key = "token" if vocab_rows and "token" in vocab_rows[0] \
        else None
    vocab = frozenset(r[tok_key] for r in vocab_rows) if tok_key \
        else frozenset()
    token_re = _re.compile(r"[^ \t\n\r\f\v]+")

    def partials(batch: pa.Table) -> pa.Table:
        groups = [(g or "") for g in
                  batch.column(group_col).to_pylist()]
        texts = batch.column(text_col).to_pylist()
        import pandas as pd
        n_tok, n_oov = [], []
        for t in texts:
            toks = token_re.findall(t or "")
            n_tok.append(len(toks))
            n_oov.append(sum(1 for x in toks if x not in vocab))
        df = pd.DataFrame({"lang": groups, "n_tokens": n_tok,
                           "n_oov": n_oov})
        g = df.groupby("lang", as_index=False, sort=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"),
            n_oov=("n_oov", "sum"))
        return arrow_out(g)

    def merge(batch) -> pa.Table:
        import numpy as np
        import pandas as pd
        if len(batch) == 0 or "lang" not in batch.columns:
            return pa.table({
                "lang": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_oov": pa.array([], pa.int64()),
                "oov_rate": pa.array([], pa.float64())})
        g = batch.groupby("lang", as_index=False, sort=True) \
            [["n_docs", "n_tokens", "n_oov"]].sum()
        nt = g["n_tokens"].to_numpy(dtype=np.float64)
        rate = np.where(nt > 0,
                        np.floor(g["n_oov"].to_numpy() / np.where(
                            nt > 0, nt, 1.0) * 1e6) / 1e6, np.nan)
        g["oov_rate"] = rate
        return arrow_out(g)

    return strip_schema_metadata(
        ds.select_columns([id_col, text_col, group_col])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def phrase_search(ds: ray.data.Dataset, phrases: list, *,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact multi-phrase search over the corpus: for each (phrase,
    doc) pair, the number of TOKEN positions where the phrase's tokens
    appear consecutively (overlapping occurrences counted — position
    semantics, not substring semantics).

    Scale shape: a phrase list is tiny, so this is the SCAN path —
    one stateless vectorized-per-doc pass with the phrase table in the
    closure, zero exchanges, output bounded by |phrases| × matching
    docs.  (The repeated-query SERVE path is the positional inverted
    index — :func:`token_postings` — this operator is the one-shot /
    index-build-not-worth-it shape.)  Candidate positions are found by
    numpy equality on the first token; only candidates pay the
    remaining m−1 compares.

    Output: (phrase_id, doc_id, n_hits), n_hits ≥ 1 rows only.
    """
    import re as _re

    import numpy as np

    from .util import strip_schema_metadata

    token_re = _re.compile(r"[^ \t\n\r\f\v]+")
    plist = [token_re.findall(p or "") for p in phrases]

    def scan(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_p, out_d, out_n = [], [], []
        for did, t in zip(ids, texts):
            toks = np.array(token_re.findall(t or ""), dtype=object)
            for pid, p in enumerate(plist):
                m = len(p)
                if m == 0 or len(toks) < m:
                    continue
                cand = np.flatnonzero(toks[:len(toks) - m + 1] == p[0])
                n = 0
                for c in cand:
                    if all(toks[c + j] == p[j] for j in range(1, m)):
                        n += 1
                if n:
                    out_p.append(pid)
                    out_d.append(int(did))
                    out_n.append(n)
        return pa.table({
            "phrase_id": pa.array(out_p, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "n_hits": pa.array(out_n, pa.int64())})

    return strip_schema_metadata(
        ds.select_columns([id_col, text_col])) \
        .map_batches(scan, batch_format="pyarrow")


def negative_event_samples(events: ray.data.Dataset, *,
                           k: int = 2, min_count: int = 10,
                           n_partitions: int | None = None
                           ) -> ray.data.Dataset:
    """Deterministic negative sampling over the implicit-feedback
    (user, event_type) interaction matrix: for each user, the k event
    types the user has engaged with FEWER than ``min_count`` times
    (including never), drawn in md5(user:type) order — the
    training-pair generator for recommender / contrastive objectives
    (BPR-style implicit feedback treats low-count cells as sampleable
    negatives).  The md5 draw is content-independent and reproducible
    across runs, partitionings and cluster sizes.

    Shape: per-batch (user, type, n) combiners shed the event stream
    to interaction-cell partials before ONE user-keyed ids-only
    exchange; the event-type vocabulary is bounded by design (it is a
    schema-level enum, not data-scale), so it is derived once via
    per-batch uniques and a tiny driver pull, then closed over by the
    per-partition pass — which cross-joins the partition's users with
    the vocabulary, anti-joins cells with n >= min_count, and keeps
    each user's md5-head-k.  All vectorized pandas except the md5
    ranking itself (one digest per candidate cell, bounded by
    |users| x |types|).

    Output: (user_id, event_type, rank) with rank 1..k in draw order.
    """
    import hashlib

    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(events)
    n_parts = n_partitions or default_partitions()

    def combiners(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(["user_id", "event_type"],
                          sort=False).size().reset_index(name="n")
        return arrow_out(pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "event_type": g["event_type"],
            "n": g["n"].astype("int64")}))

    # Shed the event stream to interaction-cell partials FIRST and
    # materialize only those (users × types × batches rows — never the
    # stream itself); the bounded vocabulary is a tiny driver pull
    # over the partials.
    cells = strip_schema_metadata(
        events.select_columns(["user_id", "event_type"])) \
        .map_batches(combiners, batch_format="pandas") \
        .materialize()
    ensure_hash_shuffle(cells)

    def uniq_types(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type":
                         batch.column("event_type").unique()})

    vocab = sorted({r["event_type"] for r in
                    cells.map_batches(uniq_types,
                                      batch_format="pyarrow")
                    .take_all()})
    vocab_df = pd.DataFrame({"event_type": vocab})

    def sample(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "rank": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "user_id" not in batch.columns:
            return arrow_out(empty)
        cells = batch.groupby(["user_id", "event_type"],
                              as_index=False, sort=False)["n"].sum()
        users = cells[["user_id"]].drop_duplicates()
        cand = users.merge(vocab_df, how="cross") \
            .merge(cells, on=["user_id", "event_type"], how="left")
        cand = cand[cand["n"].isna() | (cand["n"] < min_count)]
        if len(cand) == 0:
            return arrow_out(empty)
        cand = cand.assign(_r=[
            hashlib.md5(f"{u}:{t}".encode()).hexdigest()
            for u, t in zip(cand["user_id"], cand["event_type"])])
        cand = cand.sort_values(["user_id", "_r", "event_type"],
                                kind="stable")
        kept = cand.groupby("user_id", sort=False).head(k)
        rank = kept.groupby("user_id", sort=False).cumcount() + 1
        return arrow_out(pd.DataFrame({
            "user_id": kept["user_id"].astype("int64"),
            "event_type": kept["event_type"],
            "rank": rank.astype("int64")}))

    return cells \
        .repartition(num_blocks=n_parts, keys=["user_id"]) \
        .map_batches(sample, batch_format="pandas", batch_size=None)


def power_users(events: ray.data.Dataset, *, q: float = 0.9,
                n_partitions: int | None = None) -> ray.data.Dataset:
    """Percentile-threshold cohort: users whose event count reaches
    the q-quantile of per-user activity (the HAVING-over-percentile
    shape every engagement/abuse pipeline runs: "top decile of
    activity").  ``>=`` at the threshold keeps the cohort non-empty
    for any non-empty input (the argmax user always qualifies).

    Shape: per-batch (user, n) combiners → ONE user-keyed ids-only
    exchange → exact per-user counts (materialized once); the
    threshold comes from a COUNT-VALUE HISTOGRAM (per-partition
    value-counts partials, one tiny merge block, nearest-rank
    ceil(q·n) — the doc_length_percentiles shape: the exchange moves
    O(distinct_counts) rows, never O(users)), pulled to the driver as
    a bounded histogram; a closure filter pass over the materialized
    counts emits the cohort.  Output: (user_id, n_events).
    """
    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(events)
    k = n_partitions or default_partitions()

    def combiners(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby("user_id", sort=False) \
            .size().reset_index(name="n")
        return arrow_out(pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "n": g["n"].astype("int64")}))

    def exact(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "user_id" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby("user_id", as_index=False,
                          sort=False)["n"].sum()
        return arrow_out(pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "n_events": g["n"].astype("int64")}))

    counts = strip_schema_metadata(
        events.select_columns(["user_id"])) \
        .map_batches(combiners, batch_format="pandas") \
        .repartition(num_blocks=k, keys=["user_id"]) \
        .map_batches(exact, batch_format="pandas", batch_size=None) \
        .materialize()

    def hist_partial(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "n_events" not in batch.columns:
            return pa.table({"n": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        vc = batch["n_events"].value_counts()
        return pa.table({
            "n": pa.array(vc.index.to_numpy(dtype=np.int64)),
            "cnt": pa.array(vc.to_numpy(dtype=np.int64))})

    hist = pd.DataFrame(counts.map_batches(
        hist_partial, batch_format="pandas").take_all())
    if len(hist) == 0:
        return counts.rename_columns(
            {"n_events": "n_events"}).limit(0)
    hist = hist.groupby("n")["cnt"].sum().sort_index()
    cum = hist.to_numpy().cumsum()
    rank = max(1, int(np.ceil(q * int(cum[-1]))))
    thr = int(hist.index.to_numpy()[np.searchsorted(cum, rank)])

    def keep(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "n_events" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64")}))
        kept = batch[batch["n_events"] >= thr]
        return arrow_out(kept.reset_index(drop=True))

    return counts.map_batches(keep, batch_format="pandas")


def token_entropy(ds: ray.data.Dataset, *,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> ray.data.Dataset:
    """Per-document Shannon token entropy — the unigram-diversity
    quality signal (low entropy = boilerplate/spam/keyword-stuffed
    pages; the complement of repetition_scores' top-gram fractions).

    Exactness: H = ln(n) − (Σ c·ln c)/n over the distinct-token
    counts c.  The inner sum is quantized PER TERM on the integer
    lattice floor(c·ln(c)·1e9 + 0.5) — c is an integer, so the whole
    quantization has a FINITE input domain that the tests probe
    exhaustively against DuckDB (the adamic_adar lattice rule; never
    value-oracle a re-associated raw float sum) — and the final
    entropy is one floor-6 expression of exact integers, mirrored
    op-for-op in the oracle.  Tokens use the explicit ASCII class so
    Python and RE2 split identically.

    Stateless single map — zero exchanges; the inner loop is one
    C-regex findall + one vectorized lattice sum per row.

    Output: (doc_id, n_tokens, n_types, entropy); tokenless docs get
    (0, 0, 0.0).
    """
    import collections
    import math
    import re

    token_re = re.compile(TOKEN_RE)

    # ln over INTEGER args must come from libm (math.log == DuckDB ln
    # bit-for-bit over the whole probed domain; numpy's SIMD log is
    # 1 ulp off for ~2.5% of integers, which crosses the 1e9-lattice
    # rounding boundary).  Grown once per worker, vectorized lookups.
    lut = [np.array([0.0, 0.0])]

    def ln_lut(up_to: int) -> np.ndarray:
        cur = lut[0]
        if up_to >= len(cur):
            new = np.empty(up_to + 1, dtype=np.float64)
            new[:len(cur)] = cur
            for i in range(len(cur), up_to + 1):
                new[i] = math.log(i)
            lut[0] = new
        return lut[0]

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = batch.column(text_col).to_pylist()
        n_tok, n_typ, ent = [], [], []
        for t in texts:
            toks = token_re.findall(t or "")
            n = len(toks)
            if n == 0:
                n_tok.append(0)
                n_typ.append(0)
                ent.append(0.0)
                continue
            c = np.fromiter(collections.Counter(toks).values(),
                            dtype=np.int64)
            ln_c = ln_lut(n)
            s_q = int(np.floor(c * ln_c[c] * 1e9 + 0.5)
                      .astype(np.int64).sum())
            h = math.floor((math.log(n) - (s_q / 1e9) / n)
                           * 1e6) / 1e6
            n_tok.append(n)
            n_typ.append(len(c))
            ent.append(float(h))
        return pa.table({
            "doc_id": ids,
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_types": pa.array(n_typ, pa.int64()),
            "entropy": pa.array(ent, pa.float64())})

    from .util import strip_schema_metadata
    return strip_schema_metadata(
        ds.select_columns([id_col, text_col])) \
        .map_batches(per_doc, batch_format="pyarrow")


def lang_source_mi(ds: ray.data.Dataset, *,
                   row_col: str = "lang",
                   col_col: str = "source") -> ray.data.Dataset:
    """Pointwise / total mutual information over the (lang, source)
    contingency table — the information-theoretic companion to
    lang_source_chisq (how many nats does knowing the source reveal
    about the language?).  Σ mi_contrib is the corpus MI.

    Same bounded-cell shape as the chi-square: per-batch combiners
    shed the corpus to cell-count partials, ONE single-block merge
    computes marginals and the per-cell quantities — no shuffle, and
    because every emitted value is PER-CELL (never a float sum across
    cells), there is no re-association anywhere: pmi =
    ln(N·n_xy/(n_x·n_y)) and mi_contrib = (n_xy/N)·pmi are floor-6
    doubles of exact int64 counts, ln via libm math.log (bit-equal to
    DuckDB's ln; numpy's SIMD log is 1 ulp off on some args).

    Output: (lang, source, observed, pmi, mi_contrib) ordered by
    (lang, source).
    """
    import math

    import pandas as pd

    from .util import arrow_out, strip_schema_metadata

    def partials(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby([row_col, col_col], sort=False) \
            .size().reset_index(name="observed")
        return arrow_out(pd.DataFrame({
            "lang": g[row_col],
            "source": g[col_col],
            "observed": g["observed"].astype("int64")}))

    empty = pd.DataFrame({
        "lang": pd.Series([], dtype="object"),
        "source": pd.Series([], dtype="object"),
        "observed": pd.Series([], dtype="int64"),
        "pmi": pd.Series([], dtype="float64"),
        "mi_contrib": pd.Series([], dtype="float64")})

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "lang" not in batch.columns:
            return arrow_out(empty.copy())
        g = batch.groupby(["lang", "source"], as_index=False,
                          sort=True)["observed"].sum()
        n = float(g["observed"].sum())
        row_tot = g.groupby("lang")["observed"].transform("sum") \
            .to_numpy(dtype=np.float64)
        col_tot = g.groupby("source")["observed"].transform("sum") \
            .to_numpy(dtype=np.float64)
        o = g["observed"].to_numpy(dtype=np.float64)
        pmi, mic = [], []
        for i in range(len(g)):  # bounded cells — scalar libm ln
            ln_r = math.log((n * o[i]) / (row_tot[i] * col_tot[i]))
            pmi.append(math.floor(ln_r * 1e6) / 1e6)
            mic.append(math.floor((o[i] / n) * ln_r * 1e6) / 1e6)
        g["pmi"] = pd.Series(pmi, dtype="float64")
        g["mi_contrib"] = pd.Series(mic, dtype="float64")
        g["observed"] = g["observed"].astype("int64")
        return arrow_out(g.reset_index(drop=True))

    return strip_schema_metadata(
        ds.select_columns([row_col, col_col])) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def first_touch_attribution(events: ray.data.Dataset, *,
                            gap_minutes: int = 30,
                            conversion_type: str = "purchase",
                            n_partitions: int | None = None
                            ) -> ray.data.Dataset:
    """Session-level first-touch attribution: sessions are the
    session_table family (gap > gap_minutes breaks; tied timestamps
    share a session), each session's FIRST event type (ties at the
    session start break by event_id — a total order, so "first" is
    well-defined on both engines) is the acquisition channel, and the
    channel is credited with the session's conversions.

    Shape: ONE user-keyed exchange of (user, ts, event_id, type)
    rows; per-partition vectorized lexsort + gap cumsum + segment
    first/sum; the per-channel rollup is BOUNDED (event-type
    vocabulary), so the merge is the repartition(1) + pandas shape.

    Output: (first_type, n_sessions, n_conversions) ordered by
    first_type.
    """
    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata
    ensure_hash_shuffle(events)
    k = n_partitions or default_partitions()
    gap_us = gap_minutes * 60 * 1_000_000

    def per_partition(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "first_type": pd.Series([], dtype="object"),
            "n_sessions": pd.Series([], dtype="int64"),
            "n_conversions": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "user_id" not in batch.columns:
            return arrow_out(empty)
        users = batch["user_id"].to_numpy(dtype=np.int64)
        ts = batch["ts"].to_numpy(dtype="datetime64[us]") \
            .astype("int64")
        eids = batch["event_id"].to_numpy(dtype=np.int64)
        types = batch["event_type"].to_numpy(dtype=object)
        order = np.lexsort((eids, ts, users))
        users, ts, eids, types = (users[order], ts[order],
                                  eids[order], types[order])
        n = len(users)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        gap_break = np.empty(n, dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_sess = new_user | gap_break
        sess_id = np.cumsum(new_sess) - 1
        starts = np.flatnonzero(new_sess)
        first_type = types[starts]
        conv = (types == conversion_type).astype(np.int64)
        n_conv = np.add.reduceat(conv, starts)
        g = pd.DataFrame({"first_type": first_type,
                          "n_conversions": n_conv}) \
            .groupby("first_type", sort=False) \
            .agg(n_sessions=("n_conversions", "size"),
                 n_conversions=("n_conversions", "sum")) \
            .reset_index()
        return arrow_out(pd.DataFrame({
            "first_type": g["first_type"],
            "n_sessions": g["n_sessions"].astype("int64"),
            "n_conversions": g["n_conversions"].astype("int64")}))

    def final_merge(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "first_type": pd.Series([], dtype="object"),
            "n_sessions": pd.Series([], dtype="int64"),
            "n_conversions": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "first_type" not in batch.columns:
            return arrow_out(empty)
        g = batch.groupby("first_type", as_index=False,
                          sort=True).sum()
        g["n_sessions"] = g["n_sessions"].astype("int64")
        g["n_conversions"] = g["n_conversions"].astype("int64")
        return arrow_out(g)

    return strip_schema_metadata(events.select_columns(
        ["user_id", "ts", "event_id", "event_type"])) \
        .repartition(num_blocks=k, keys=["user_id"]) \
        .map_batches(per_partition, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(final_merge, batch_format="pandas",
                     batch_size=None)
