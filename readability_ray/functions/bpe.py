"""Distributed BPE merge learning (Sennrich, Haddow & Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016) — the
tokenizer-training primitive of every LLM data stack, expressed
Ray-Data-first.

Classic BPE trains on the DISTINCT-WORD frequency table, not the raw
token stream: one corpus-scale pass reduces the corpus to (word, count)
rows (per-batch partial counts → ONE word-keyed exchange — the only
corpus-sized exchange in the whole algorithm), and every merge
iteration after that touches only the word table:

    per iteration:
      1. pair statistics  — a stateless vectorized map over the word
         table emits per-batch partial (left, right, count) rows;
         the driver reduces a table bounded by the number of DISTINCT
         ADJACENT SYMBOL PAIRS (vocab-sized, tiny) — never the corpus.
      2. argmax           — highest count, ties broken (left, right)
         lexicographic asc: fully deterministic merge sequence.
      3. apply            — a stateless map rewrites each word's symbol
         sequence (greedy left-to-right non-overlapping, the reference
         semantics); the word table is re-materialized per round so the
         lazy plan never accretes (the near_dup_keepers rule).

At 100 TB the word table is ~10⁸ rows (language vocabulary, not corpus
size), so n_merges × (map + tiny reduce) is the canonical distributed
BPE shape (this is how sentencepiece/HF tokenizer training scales out).

Words are whitespace tokens (the engine's ASCII class); symbols start
as single characters with a terminal ``</w>`` marker appended to each
word (Sennrich's end-of-word convention), and merged symbols are the
concatenation of their parts.

The merge loop is an iterative argmax — not SQL-expressible — so the
driver query is rows-only; correctness is pinned by an EXACT
differential against a textbook single-process implementation
(``reference_bpe``) in tests/test_bpe.py.

No reference counterpart (corpus-level operator).
"""

from __future__ import annotations

import collections
import re

import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata

_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")
_EOW = "</w>"


def _word_symbols(word: str) -> list:
    return list(word) + [_EOW]


def _merge_symbols(symbols: list, left: str, right: str) -> list:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (left, right) with their concatenation."""
    out = []
    i, n = 0, len(symbols)
    while i < n:
        if (i + 1 < n and symbols[i] == left
                and symbols[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def word_counts(ds: ray.data.Dataset, *, text_col: str = "text",
                n_partitions: int | None = None) -> ray.data.Dataset:
    """(word, count) over the corpus — the one corpus-sized reduce.
    Per-batch partial counts, then one word-keyed exchange of
    vocab-sized partials with a per-partition pandas sum."""
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()

    def partials(batch: pa.Table) -> pa.Table:
        counter: collections.Counter = collections.Counter()
        for text in batch.column(text_col).to_pylist():
            counter.update(_TOKEN_RE.findall(text or ""))
        if not counter:
            return pa.table({"word": pa.array([], pa.string()),
                             "count": pa.array([], pa.int64())})
        words, counts = zip(*counter.items())
        return pa.table({"word": pa.array(words, pa.string()),
                         "count": pa.array(counts, pa.int64())})

    def sum_partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "word" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "word": pd.Series([], dtype="object"),
                "count": pd.Series([], dtype="int64")}))
        return arrow_out(batch.groupby("word", as_index=False,
                                       sort=False)["count"].sum())

    return strip_schema_metadata(ds.select_columns([text_col])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["word"]) \
        .map_batches(sum_partials, batch_format="pandas",
                     batch_size=None)


def learn_bpe(ds: ray.data.Dataset, *, n_merges: int = 32,
              text_col: str = "text",
              n_partitions: int | None = None) -> pa.Table:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    merge table (step, left, right, pair_count) — deterministic for a
    given corpus (argmax ties broken lexicographic asc).  Stops early
    when no pair occurs twice."""
    words = word_counts(ds, text_col=text_col,
                        n_partitions=n_partitions)

    def to_symbols(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({
                "symbols": pa.array([], pa.list_(pa.string())),
                "count": pa.array([], pa.int64())})
        return pa.table({
            "symbols": pa.array(
                [_word_symbols(w)
                 for w in batch.column("word").to_pylist()],
                pa.list_(pa.string())),
            "count": batch.column("count"),
        })

    table = words.map_batches(to_symbols, batch_format="pyarrow") \
        .materialize()

    def pair_partials(batch: pa.Table) -> pa.Table:
        counter: collections.Counter = collections.Counter()
        syms = batch.column("symbols").to_pylist()
        counts = batch.column("count").to_pylist()
        for s, c in zip(syms, counts):
            for a, b in zip(s, s[1:]):
                counter[(a, b)] += c
        if not counter:
            return pa.table({"left": pa.array([], pa.string()),
                             "right": pa.array([], pa.string()),
                             "count": pa.array([], pa.int64())})
        pairs, cs = zip(*counter.items())
        return pa.table({
            "left": pa.array([p[0] for p in pairs], pa.string()),
            "right": pa.array([p[1] for p in pairs], pa.string()),
            "count": pa.array(cs, pa.int64()),
        })

    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        partial_rows = table.map_batches(
            pair_partials, batch_format="pyarrow").take_all()
        if not partial_rows:
            break
        pairs = pd.DataFrame(partial_rows).groupby(
            ["left", "right"], as_index=False)["count"].sum()
        pairs = pairs[pairs["count"] >= 2]
        if len(pairs) == 0:
            break
        best = pairs.sort_values(
            ["count", "left", "right"],
            ascending=[False, True, True]).iloc[0]
        left, right = str(best["left"]), str(best["right"])
        merges.append((step, left, right, int(best["count"])))

        def apply(batch: pa.Table, *, l=left, r=right) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table({
                    "symbols": pa.array([], pa.list_(pa.string())),
                    "count": pa.array([], pa.int64())})
            return pa.table({
                "symbols": pa.array(
                    [_merge_symbols(s, l, r)
                     for s in batch.column("symbols").to_pylist()],
                    pa.list_(pa.string())),
                "count": batch.column("count"),
            })

        # re-materialize per round: flat plan, bounded lineage
        table = table.map_batches(apply, batch_format="pyarrow") \
            .materialize()

    return pa.table({
        "step": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })


def encode_bpe_word(word: str, ranks: dict) -> list:
    """Encode ONE word with a learned merge table (rank dict
    (left, right) → step): repeatedly apply the lowest-rank applicable
    merge — the standard BPE encoder."""
    symbols = _word_symbols(word)
    while len(symbols) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(symbols, symbols[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        symbols = _merge_symbols(symbols, *best_pair)
    return symbols


def bpe_encode_stats(ds: ray.data.Dataset, merges: pa.Table, *,
                     id_col: str = "doc_id", text_col: str = "text"
                     ) -> ray.data.Dataset:
    """Encode every document with a learned merge table and report
    (id_col, n_words, n_subwords) — the corpus token-budget numbers a
    trained tokenizer yields.  Merge table is ray.put once (same
    broadcast pattern as the LM model); encoding is one stateless map
    with a per-worker word→subwords memo (Zipf makes the memo hit rate
    ~the corpus token count)."""
    import ray

    ranks = {(l, r): s for s, l, r in zip(
        merges.column("step").to_pylist(),
        merges.column("left").to_pylist(),
        merges.column("right").to_pylist())}
    ranks_ref = ray.put(ranks)
    _memo: dict = {}

    def encode(batch: pa.Table, *, ref) -> pa.Table:
        state = _memo.get("s")
        if state is None:
            state = _memo["s"] = (ray.get(ref), {})
        rk, cache = state
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_w, out_s = [], []
        for t in texts:
            toks = _TOKEN_RE.findall(t or "")
            n_sub = 0
            for w in toks:
                got = cache.get(w)
                if got is None:
                    got = cache[w] = len(encode_bpe_word(w, rk))
                n_sub += got
            out_w.append(len(toks))
            out_s.append(n_sub)
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(out_w, pa.int64()),
            "n_subwords": pa.array(out_s, pa.int64()),
        })

    return strip_schema_metadata(ds.select_columns([id_col, text_col])) \
        .map_batches(encode, batch_format="pyarrow",
                     fn_kwargs={"ref": ranks_ref})


def reference_bpe(texts: list, n_merges: int) -> list:
    """Textbook single-process BPE (Sennrich Algorithm 1) — the test
    oracle for :func:`learn_bpe`.  Returns [(step, left, right,
    pair_count)] with the same tie-break."""
    vocab: collections.Counter = collections.Counter()
    for t in texts:
        vocab.update(_TOKEN_RE.findall(t or ""))
    words = {w: _word_symbols(w) for w in vocab}
    merges = []
    for step in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, syms in words.items():
            c = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        pairs = {p: c for p, c in pairs.items() if c >= 2}
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), count = best
        merges.append((step, left, right, count))
        words = {w: _merge_symbols(s, left, right)
                 for w, s in words.items()}
    return merges
