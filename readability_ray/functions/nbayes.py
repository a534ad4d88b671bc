"""Distributed multinomial Naive Bayes text classification — the
model-based filtering stage of modern web-corpus pipelines (CCNet /
RefinedWeb / FineWeb train a fasttext-style linear classifier to keep
"wiki-like" pages; multinomial NB over a capped vocabulary is the
deterministic, closed-form member of that family, so the whole
train-and-score path carries a value-level SQL oracle instead of an
SGD seed).

Training (one corpus over a ``label_col``):
  - vocabulary: deterministic top-V tokens by corpus frequency (the
    ``token_frequency_topk`` machinery — one token-keyed exchange).
  - conditional counts: per-batch partial (label, token) counts for
    in-vocab tokens → ONE token-keyed exchange of vocab-sized partials
    → per-partition pandas sum.  The model is ≤ V × n_labels rows.
  - priors: per-batch label doc-counts, driver-reduced (n_labels rows).

Scoring: the model ships once via ``ray.put``; one stateless
vectorized map computes, per document and label,
``ln prior(l) + Σ_occurrences ln((c(l, tok) + 1) / (total_l + V))``
over the document's IN-VOCAB token occurrences (OOV tokens carry no
class signal under a capped vocab and are skipped — both sides of the
oracle agree on this), and takes the argmax with ties broken label asc.

No reference counterpart (corpus-level operator).
"""

from __future__ import annotations

import collections
import math

import pandas as pd
import pyarrow as pa
import ray.data

from .lmscore import _TOKEN_RE
from .util import arrow_out, strip_schema_metadata


def train_naive_bayes(train_ds: ray.data.Dataset, *,
                      label_col: str = "lang", text_col: str = "text",
                      vocab_size: int = 50_000,
                      n_partitions: int | None = None) -> dict:
    """Model dict: {"priors": label→doc count, "cond": (label, token)
    →count, "totals": label→Σ in-vocab occurrences, "vocab": frozenset,
    "n_docs": int, "v": realized vocab size}."""
    import ray

    from ..state import default_partitions, ensure_hash_shuffle
    from .textstats import token_frequency_topk
    ensure_hash_shuffle(train_ds)
    n_parts = n_partitions or default_partitions()
    docs = strip_schema_metadata(
        train_ds.select_columns([label_col, text_col]))

    text_only = docs.select_columns([text_col])
    if text_col != "text":
        text_only = text_only.rename_columns({text_col: "text"})
    vocab_rows = token_frequency_topk(text_only, k=vocab_size).take_all()
    vocab = frozenset(r["token"] for r in vocab_rows)
    vocab_ref = ray.put(vocab)

    def cond_partials(batch: pa.Table, *, ref) -> pa.Table:
        from .lmscore import _get_broadcast
        v = _get_broadcast(ref)
        counter: collections.Counter = collections.Counter()
        label_docs: collections.Counter = collections.Counter()
        labels = batch.column(label_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        for lab, text in zip(labels, texts):
            label_docs[lab] += 1
            counter.update((lab, t)
                           for t in _TOKEN_RE.findall(text or "")
                           if t in v)
        rows_lab, rows_tok, rows_n = [], [], []
        for (lab, t), c in counter.items():
            rows_lab.append(lab)
            rows_tok.append(t)
            rows_n.append(c)
        for lab, c in label_docs.items():  # doc-count rows: token NULL
            rows_lab.append(lab)
            rows_tok.append(None)
            rows_n.append(c)
        return pa.table({
            "label": pa.array(rows_lab, pa.string()),
            "token": pa.array(rows_tok, pa.string()),
            "n": pa.array(rows_n, pa.int64()),
        })

    def sum_partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "label" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "label": pd.Series([], dtype="object"),
                "token": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")}))
        return arrow_out(batch.groupby(["label", "token"],
                                       as_index=False, sort=False,
                                       dropna=False)["n"].sum())

    rows = docs.map_batches(cond_partials, batch_format="pyarrow",
                            fn_kwargs={"ref": vocab_ref}) \
        .repartition(num_blocks=n_parts, keys=["token"]) \
        .map_batches(sum_partials, batch_format="pandas",
                     batch_size=None) \
        .take_all()

    priors: dict = {}
    cond: dict = {}
    totals: collections.Counter = collections.Counter()
    for r in rows:
        if r["token"] is None:
            priors[r["label"]] = priors.get(r["label"], 0) + int(r["n"])
        else:
            cond[(r["label"], r["token"])] = int(r["n"])
            totals[r["label"]] += int(r["n"])
    return {"priors": priors, "cond": cond, "totals": dict(totals),
            "vocab": vocab, "n_docs": sum(priors.values()),
            "v": len(vocab)}


def naive_bayes_classify(ds: ray.data.Dataset,
                         train_ds: ray.data.Dataset | None = None, *,
                         label_col: str = "lang", text_col: str = "text",
                         id_col: str = "doc_id",
                         vocab_size: int = 50_000,
                         n_partitions: int | None = None
                         ) -> ray.data.Dataset:
    """Train on ``train_ds`` (default: ``ds`` itself — it must then
    carry ``label_col``) and classify every row of ``ds``.

    Output: (id_col, pred_label, logprob) — ``logprob`` is the winning
    label's joint ln-probability (floor-6); argmax ties break label
    asc, so the result is fully deterministic.
    """
    import ray

    model = train_naive_bayes(
        train_ds if train_ds is not None else ds,
        label_col=label_col, text_col=text_col,
        vocab_size=vocab_size, n_partitions=n_partitions)
    labels = sorted(model["priors"])
    if not labels:
        raise ValueError("training corpus is empty")
    model_ref = ray.put((labels, model["priors"], model["cond"],
                         model["totals"], model["vocab"],
                         model["n_docs"], model["v"]))
    _memo: dict = {}

    def classify(batch: pa.Table, *, ref) -> pa.Table:
        m = _memo.get("m")
        if m is None:
            m = _memo["m"] = ray.get(ref)
        labs, priors, cond, totals, vocab, n_docs, v = m
        log_priors = {l: math.log(priors[l] / n_docs) for l in labs}
        texts = batch.column(text_col).to_pylist()
        out_pred, out_lp = [], []
        for t in texts:
            toks = [x for x in _TOKEN_RE.findall(t or "") if x in vocab]
            best_lab, best_score = None, None
            for lab in labs:  # sorted → ties keep the smallest label
                denom = totals.get(lab, 0) + v
                s = log_priors[lab]
                for tok in toks:
                    s += math.log((cond.get((lab, tok), 0) + 1) / denom)
                if best_score is None or s > best_score:
                    best_lab, best_score = lab, s
            out_pred.append(best_lab)
            out_lp.append(math.floor(best_score * 1e6) / 1e6)
        return pa.table({
            id_col: batch.column(id_col),
            "pred_label": pa.array(out_pred, pa.string()),
            "logprob": pa.array(out_lp, pa.float64()),
        })

    return strip_schema_metadata(ds.select_columns([id_col, text_col])) \
        .map_batches(classify, batch_format="pyarrow",
                     fn_kwargs={"ref": model_ref})
