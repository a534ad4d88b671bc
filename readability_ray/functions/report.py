"""Corpus summary report — the one-row metrics table a pipeline run
logs next to its output (the north rule's "per-partition lineage +
metrics" at whole-corpus granularity; every curation stack emits one:
Dolma's corpus stats, CCNet's shard summaries).

One stateless partial-aggregation map (fixed-width rows per batch) +
a single tiny reduce for everything except the exact distinct-content
count, which needs ONE hash-keyed exchange (the exact_dedup shape:
per-batch md5 partials, per-partition distinct, partial counts
reduced).  Nothing corpus-sized ever reaches the driver.

Output (one row): n_docs, n_empty, total_tokens, total_chars,
n_langs, top_lang (ties lang asc), top_lang_docs, distinct_texts,
dup_docs (= n_docs - distinct_texts).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .util import arrow_out, strip_schema_metadata

_TOKEN_RE = r"[^ \t\n\r\f\v]+"


def corpus_report(ds: ray.data.Dataset, *, text_col: str = "text",
                  lang_col: str = "lang",
                  n_partitions: int | None = None) -> ray.data.Dataset:
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()
    docs = strip_schema_metadata(ds.select_columns([text_col, lang_col]))

    def partials(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        n_chars = pc.sum(pc.utf8_length(text)).as_py() or 0
        n_tokens = pc.sum(
            pc.count_substring_regex(text, _TOKEN_RE)).as_py() or 0
        n_empty = pc.sum(pc.equal(pc.utf8_length(text), 0)).as_py() or 0
        langs = pa.table({"lang": batch.column(lang_col)}) \
            .group_by("lang").aggregate([("lang", "count")])
        return pa.table({
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "n_empty": pa.array([int(n_empty)], pa.int64()),
            "total_tokens": pa.array([int(n_tokens)], pa.int64()),
            "total_chars": pa.array([int(n_chars)], pa.int64()),
            "langs": pa.array([langs.column("lang").to_pylist()],
                              pa.list_(pa.string())),
            "lang_counts": pa.array(
                [langs.column("lang_count").to_pylist()],
                pa.list_(pa.int64())),
        })

    # exact distinct-text count: one keyed exchange of md5 partials
    def hash_partials(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs = sorted({hashlib.md5((t or "").encode()).hexdigest()
                     for t in texts})
        return pa.table({"h": pa.array(hs, pa.string())})

    def count_distinct(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "h" not in batch.columns:
            return pa.table({"n": pa.array([], pa.int64())})
        return pa.table({"n": pa.array(
            [int(batch["h"].nunique())], pa.int64())})

    distinct = docs.map_batches(hash_partials, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["h"]) \
        .map_batches(count_distinct, batch_format="pandas",
                     batch_size=None) \
        .sum("n") or 0

    import collections
    n_docs = n_empty = total_tokens = total_chars = 0
    lang_counter: collections.Counter = collections.Counter()
    for row in docs.map_batches(partials,
                                batch_format="pyarrow").take_all():
        n_docs += row["n_docs"]
        n_empty += row["n_empty"]
        total_tokens += row["total_tokens"]
        total_chars += row["total_chars"]
        for lang, c in zip(row["langs"], row["lang_counts"]):
            lang_counter[lang] += c

    if lang_counter:
        top_lang = min(lang_counter.items(),
                       key=lambda kv: (-kv[1], kv[0]))
    else:
        top_lang = ("", 0)
    return ray.data.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_empty": pa.array([n_empty], pa.int64()),
        "total_tokens": pa.array([total_tokens], pa.int64()),
        "total_chars": pa.array([total_chars], pa.int64()),
        "n_langs": pa.array([len(lang_counter)], pa.int64()),
        "top_lang": pa.array([top_lang[0]], pa.string()),
        "top_lang_docs": pa.array([int(top_lang[1])], pa.int64()),
        "distinct_texts": pa.array([int(distinct)], pa.int64()),
        "dup_docs": pa.array([n_docs - int(distinct)], pa.int64()),
    }))


def table_profile(ds: ray.data.Dataset, *,
                  numeric_cols: dict[str, int],
                  categorical_cols: list[str] | None = None,
                  max_distinct: int = 10_000) -> ray.data.Dataset:
    """Distributed per-column dataset profiler — the data-quality /
    schema-drift check a training pipeline runs before ingesting a new
    corpus drop (what Deequ / Great Expectations profile, re-expressed
    as one Ray Data pass).

    ``numeric_cols`` maps column -> decimal scale (digits after the
    point); sums are carried as EXACT fixed-point integers at that
    scale (``floor(x*10^s + 0.5)`` — the embedding_quantize rounding
    form, bit-identical to the SQL ``floor(x*10^s + 0.5)``), serialized
    as STRING partials so a 100-TB sum can exceed 2^53 without losing
    exactness (the event_interarrival_stats precedent).
    ``categorical_cols`` get an EXACT distinct count, valid only for
    bounded-cardinality columns: partials ship the distinct VALUES
    seen per batch and the merge unions them; if the union exceeds
    ``max_distinct`` the profiler raises (use the HLL sketch for
    unbounded columns).

    Scale shape: ONE stateless map over the projected columns emitting
    a bounded number of partial rows per batch (a handful per column),
    then a single-block merge (repartition(1) + pandas) — the
    pricing_summary bounded-key rule; no shuffle, nothing corpus-sized
    reaches the driver.

    Output (long form, ordered by (col_name, stat)): one row per
    (col_name, stat, value float64) with stats ``rows`` (non-null
    count), ``nulls``, ``min``, ``max``, ``mean`` (floor-6, derived
    from the exact fixed-point sum: ``(sum_fp / 10^s) / rows``) for
    numeric columns; ``rows``, ``nulls``, ``n_distinct`` for
    categorical columns; plus ('*', 'rows', total row count).
    """
    import numpy as np

    from .util import arrow_out, strip_schema_metadata

    cat_cols = list(categorical_cols or [])
    all_cols = list(numeric_cols) + cat_cols
    proj = strip_schema_metadata(ds.select_columns(all_cols))

    def partials(batch: pa.Table) -> pa.Table:
        cols, stats, vals, svals = [], [], [], []

        def emit(c, s, v, sv=None):
            cols.append(c)
            stats.append(s)
            vals.append(float(v) if v is not None else float("nan"))
            svals.append(sv)

        n_rows = batch.num_rows
        emit("*", "rows", n_rows)
        for c, scale in numeric_cols.items():
            col = batch.column(c)
            nn = n_rows - col.null_count
            emit(c, "rows", nn)
            emit(c, "nulls", col.null_count)
            if nn:
                mm = pc.min_max(col)
                emit(c, "min", mm["min"].as_py())
                emit(c, "max", mm["max"].as_py())
                x = col.drop_null().to_numpy(zero_copy_only=False)
                fp = np.floor(
                    x.astype(np.float64) * float(10 ** scale) + 0.5
                ).astype(np.int64)
                # exact big-int sum carried as a string partial
                emit(c, "sum_fp", None, str(int(fp.sum(dtype=object))))
        for c in cat_cols:
            col = batch.column(c)
            nn = n_rows - col.null_count
            emit(c, "rows", nn)
            emit(c, "nulls", col.null_count)
            for v in pc.unique(col.drop_null()).to_pylist():
                if len(svals) > 4 * max_distinct:
                    raise ValueError(
                        f"table_profile: column {c!r} exceeds "
                        f"max_distinct={max_distinct} within one "
                        "batch; use the HLL sketch instead")
                emit(c, "__val", None, v)
        return arrow_out(pd.DataFrame({
            "col_name": pd.Series(cols, dtype="object"),
            "stat": pd.Series(stats, dtype="object"),
            "value": pd.Series(vals, dtype="float64"),
            "sval": pd.Series(svals, dtype="object")}))

    empty = pd.DataFrame({
        "col_name": pd.Series([], dtype="object"),
        "stat": pd.Series([], dtype="object"),
        "value": pd.Series([], dtype="float64")})

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "col_name" not in batch.columns:
            return arrow_out(empty.copy())
        out_c, out_s, out_v = [], [], []

        def emit(c, s, v):
            out_c.append(c)
            out_s.append(s)
            out_v.append(float(v))

        total = batch[(batch["col_name"] == "*")
                      & (batch["stat"] == "rows")]["value"].sum()
        emit("*", "rows", total)
        for c, scale in numeric_cols.items():
            sub = batch[batch["col_name"] == c]
            nn = sub[sub["stat"] == "rows"]["value"].sum()
            emit(c, "rows", nn)
            emit(c, "nulls", sub[sub["stat"] == "nulls"]["value"].sum())
            if nn:
                emit(c, "min", sub[sub["stat"] == "min"]["value"].min())
                emit(c, "max", sub[sub["stat"] == "max"]["value"].max())
                s_fp = sum(int(v) for v in
                           sub[sub["stat"] == "sum_fp"]["sval"])
                # op order mirrored in the SQL oracle:
                # (sum_fp / 10^s) / rows, then floor-6
                mean = (float(s_fp) / float(10 ** scale)) / float(nn)
                emit(c, "mean", np.floor(mean * 1e6) / 1e6)
        for c in cat_cols:
            sub = batch[batch["col_name"] == c]
            emit(c, "rows", sub[sub["stat"] == "rows"]["value"].sum())
            emit(c, "nulls", sub[sub["stat"] == "nulls"]["value"].sum())
            vals = set(sub[sub["stat"] == "__val"]["sval"])
            if len(vals) > max_distinct:
                raise ValueError(
                    f"table_profile: column {c!r} has {len(vals)} "
                    f"distinct values > max_distinct={max_distinct}; "
                    "use the HLL sketch instead")
            emit(c, "n_distinct", len(vals))
        out = pd.DataFrame({
            "col_name": pd.Series(out_c, dtype="object"),
            "stat": pd.Series(out_s, dtype="object"),
            "value": pd.Series(out_v, dtype="float64")})
        return arrow_out(out.sort_values(["col_name", "stat"])
                         .reset_index(drop=True))

    return proj.map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas")


def key_skew_stats(ds: ray.data.Dataset, key_cols: list[str], *,
                   n_partitions: int | None = None) -> ray.data.Dataset:
    """Pre-shuffle skew advisor: per key column, the exact distinct-key
    count, total row count, hottest key and its share — the diagnostic
    a planner consults before keying a 100-TB shuffle on a column (a
    hot key means salt it; near-unique means don't map_groups it).

    Scale shape: per-batch combiners shed the table to (key, cnt)
    partials (one row per distinct key per batch), ONE hash-keyed
    exchange co-locates each key (all columns ride the same exchange —
    keys are tagged ``col:value`` strings), a vectorized per-partition
    pass reduces each partition to ONE candidate row per column
    (local distinct / total / max count / lexicographically-smallest
    argmax key), and a single-block merge resolves the global argmax
    (ties -> key asc).  Nothing key-stream-sized reaches the driver.

    NULL keys are excluded on both sides.  Output, ordered by
    key_col: (key_col, n_keys, total, max_count, top_key, top_share)
    with top_share = floor-6(max_count / total).
    """
    import numpy as np

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata

    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()
    proj = strip_schema_metadata(ds.select_columns(key_cols))

    def partials(batch: pd.DataFrame) -> pa.Table:
        frames = []
        for c in key_cols:
            s = batch[c].dropna().astype(str)
            g = s.groupby(s, sort=False).size()
            frames.append(pd.DataFrame({
                "k": (c + ":" + g.index.to_numpy(dtype=object)),
                "key": g.index.to_numpy(dtype=object),
                "col": c,
                "cnt": g.to_numpy(dtype=np.int64)}))
        out = pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({"k": [], "key": [], "col": [], "cnt": []})
        return arrow_out(pd.DataFrame({
            "k": pd.Series(out["k"], dtype="object"),
            "key": pd.Series(out["key"], dtype="object"),
            "col": pd.Series(out["col"], dtype="object"),
            "cnt": pd.Series(out["cnt"], dtype="int64")}))

    cand_empty = pd.DataFrame({
        "col": pd.Series([], dtype="object"),
        "n_keys": pd.Series([], dtype="int64"),
        "total": pd.Series([], dtype="int64"),
        "max_cnt": pd.Series([], dtype="int64"),
        "max_key": pd.Series([], dtype="object")})

    def per_partition(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "k" not in batch.columns:
            return arrow_out(cand_empty.copy())
        g = batch.groupby(["col", "key"], as_index=False,
                          sort=True)["cnt"].sum()
        rows = []
        for c, sub in g.groupby("col", sort=True):
            mx = int(sub["cnt"].max())
            # sorted by key asc already -> idxmax returns first (min key)
            top = sub.loc[sub["cnt"] == mx, "key"].iloc[0]
            rows.append((c, len(sub), int(sub["cnt"].sum()), mx, top))
        out = pd.DataFrame(rows, columns=["col", "n_keys", "total",
                                          "max_cnt", "max_key"])
        out["n_keys"] = out["n_keys"].astype("int64")
        out["total"] = out["total"].astype("int64")
        out["max_cnt"] = out["max_cnt"].astype("int64")
        return arrow_out(out)

    final_empty = pd.DataFrame({
        "key_col": pd.Series([], dtype="object"),
        "n_keys": pd.Series([], dtype="int64"),
        "total": pd.Series([], dtype="int64"),
        "max_count": pd.Series([], dtype="int64"),
        "top_key": pd.Series([], dtype="object"),
        "top_share": pd.Series([], dtype="float64")})

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "col" not in batch.columns:
            return arrow_out(final_empty.copy())
        rows = []
        for c, sub in batch.groupby("col", sort=True):
            mx = int(sub["max_cnt"].max())
            top = sub.loc[sub["max_cnt"] == mx, "max_key"].min()
            total = int(sub["total"].sum())
            share = np.floor((float(mx) / float(total)) * 1e6) / 1e6
            rows.append((c, int(sub["n_keys"].sum()), total, mx,
                         top, share))
        out = pd.DataFrame(rows, columns=list(final_empty.columns))
        for c in ("n_keys", "total", "max_count"):
            out[c] = out[c].astype("int64")
        return arrow_out(out)

    return proj.map_batches(partials, batch_format="pandas") \
        .repartition(num_blocks=n_parts, keys=["k"]) \
        .map_batches(per_partition, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas")


def table_covariance(ds: ray.data.Dataset,
                     numeric_cols: dict[str, int], *,
                     out_prefix: str = "") -> ray.data.Dataset:
    """EXACT pairwise covariance/correlation matrix over a table's
    numeric columns — quantity_price_correlation generalized to the
    full moment matrix, the one-pass profiler feeding feature
    selection / drift monitors.

    ``numeric_cols`` maps column -> decimal scale (the table_profile
    convention): values become exact integers via
    ``floor(x*10^s + 0.5)``, each batch emits ONE row of integer
    partials (n, per-column sums, upper-triangle product sums — the
    big-int STRING technique, int64-safe chunked reduceat), and the
    single-block merge mirrors the only float steps op-for-op with
    the HUGEINT oracle: cov = (n·Sxy − Sx·Sy)/n², corr = the
    five-sum Pearson form, both floor-6.

    Output: one row per ordered pair (col_a <= col_b alphabetically):
    (col_a, col_b, n, cov, corr); corr NULL on zero variance.
    """
    import math

    import numpy as np

    cols = sorted(numeric_cols)
    scales = [numeric_cols[c] for c in cols]
    d = len(cols)
    iu, ju = np.triu_indices(d)

    def _big_sum(arr: np.ndarray) -> int:
        if len(arr) == 0:
            return 0
        cuts = np.arange(0, len(arr), 1024)
        return sum(int(x) for x in np.add.reduceat(arr, cuts))

    def partials(batch: pd.DataFrame) -> pa.Table:
        mats = []
        for c, s in zip(cols, scales):
            x = batch[c].to_numpy(dtype=np.float64)
            mats.append(np.floor(x * float(10 ** s) + 0.5)
                        .astype(np.int64))
        row = {"n": pd.Series([len(batch)], dtype="int64")}
        for c, m in zip(cols, mats):
            row[f"s_{c}"] = pd.Series([str(_big_sum(m))],
                                      dtype="object")
        for i, j in zip(iu, ju):
            row[f"p_{cols[i]}_{cols[j]}"] = pd.Series(
                [str(_big_sum(mats[i] * mats[j]))], dtype="object")
        return arrow_out(pd.DataFrame(row))

    def merge(batch: pd.DataFrame) -> pa.Table:
        FLOOR6 = 1_000_000
        out = {"col_a": [], "col_b": [], "n": [], "cov": [],
               "corr": []}
        if len(batch) == 0 or "n" not in batch.columns or \
                int(batch["n"].sum()) == 0:
            return pa.table({
                "col_a": pa.array([], pa.string()),
                "col_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "cov": pa.array([], pa.float64()),
                "corr": pa.array([], pa.float64())})
        n = int(batch["n"].sum())
        s = {c: sum(int(v) for v in batch[f"s_{c}"]) for c in cols}
        for i, j in zip(iu, ju):
            a, b = cols[i], cols[j]
            sab = sum(int(v) for v in batch[f"p_{a}_{b}"])
            saa = sum(int(v) for v in batch[f"p_{a}_{a}"])
            sbb = sum(int(v) for v in batch[f"p_{b}_{b}"])
            # cov in SCALED units, normalized back by both scales so
            # the value is in the columns' natural units
            unit = float(10 ** (numeric_cols[a] + numeric_cols[b]))
            cov = float(n * sab - s[a] * s[b]) / float(n * n) / unit
            cov = math.floor(cov * FLOOR6) / FLOOR6
            den = math.sqrt(float(n * saa - s[a] * s[a])) * \
                math.sqrt(float(n * sbb - s[b] * s[b]))
            num = float(n * sab - s[a] * s[b])
            corr = None
            if den != 0.0:
                corr = num / den
                corr = math.floor(corr * FLOOR6) / FLOOR6
            out["col_a"].append(out_prefix + a)
            out["col_b"].append(out_prefix + b)
            out["n"].append(n)
            out["cov"].append(cov)
            out["corr"].append(corr)
        return pa.table({
            "col_a": pa.array(out["col_a"], pa.string()),
            "col_b": pa.array(out["col_b"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "cov": pa.array(out["cov"], pa.float64()),
            "corr": pa.array(out["corr"], pa.float64())})

    return strip_schema_metadata(ds.select_columns(cols)) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# dq_check — declarative data-quality rule engine
# --------------------------------------------------------------------------

def _dq_violation_mask(batch: pd.DataFrame, rule: dict) -> "object":
    """Boolean violation mask for one rule over a pandas batch.

    Null semantics are EXPLICIT on both engines: a null value violates
    range / in_set / regex / col_le rules (mirrored in the oracle as
    ``x IS NULL OR NOT (...)``) — so numpy's NaN-compares-False
    behavior and SQL's three-valued logic can't silently diverge.
    """
    import numpy as np
    kind = rule["kind"]
    if kind == "not_null":
        return batch[rule["col"]].isna().to_numpy()
    if kind == "range":
        x = batch[rule["col"]]
        ok = (x >= rule["lo"]) & (x <= rule["hi"])
        return ~ok.fillna(False).to_numpy()
    if kind == "in_set":
        x = batch[rule["col"]]
        return ~x.isin(rule["values"]).fillna(False).to_numpy()
    if kind == "regex":
        x = batch[rule["col"]]
        ok = x.str.contains(rule["pattern"], regex=True, na=False)
        return ~ok.to_numpy()
    if kind == "col_le":
        a, b = batch[rule["left"]], batch[rule["right"]]
        ok = (a <= b)
        return ~ok.fillna(False).to_numpy()
    raise ValueError(f"unknown dq rule kind: {kind!r}")


def dq_check(ds: ray.data.Dataset, rules: list[dict], *,
             n_partitions: int | None = None) -> ray.data.Dataset:
    """Declarative data-quality audit — the constraint-verification
    pass (Deequ / Great Expectations check suites, re-expressed as one
    Ray Data map): every rule is evaluated VECTORIZED over every
    batch, partial (checked, violated) counts are fixed-width rows,
    and the merge is a single tiny reduce.  Zero keyed exchanges —
    the shape is embarrassingly parallel and scales to any corpus.

    Rule kinds: ``not_null`` {col}; ``range`` {col, lo, hi};
    ``in_set`` {col, values}; ``regex`` {col, pattern — RE2-safe
    subset so the SQL oracle matches}; ``col_le`` {left, right}.
    Nulls VIOLATE every rule kind except where the rule is not_null
    itself (explicit on both engines — see _dq_violation_mask).

    Output: (rule, n_checked, n_violations) sorted by rule name.
    """
    import numpy as np

    names = [r["rule"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")

    def partials(batch: pd.DataFrame) -> pa.Table:
        n = len(batch)
        viol = [int(_dq_violation_mask(batch, r).sum()) if n else 0
                for r in rules]
        return pa.table({
            "rule": pa.array(names, pa.string()),
            "n_checked": pa.array([n] * len(rules), pa.int64()),
            "n_violations": pa.array(viol, pa.int64())})

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "rule" not in batch.columns:
            g = pd.DataFrame({
                "rule": pd.Series(names, dtype="object"),
                "n_checked": pd.Series([0] * len(names),
                                       dtype="int64"),
                "n_violations": pd.Series([0] * len(names),
                                          dtype="int64")})
        else:
            g = batch.groupby("rule", as_index=False, sort=False) \
                .sum()
        g = g.sort_values("rule").reset_index(drop=True)
        return arrow_out(g)

    cols = sorted({c for r in rules for c in
                   (r.get("col"), r.get("left"), r.get("right"))
                   if c})
    return strip_schema_metadata(ds.select_columns(cols)) \
        .map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


LINEITEM_DQ_RULES = [
    {"rule": "discount_range", "kind": "range", "col": "l_discount",
     "lo": 0.0, "hi": 0.1},
    {"rule": "linestatus_domain", "kind": "in_set",
     "col": "l_linestatus", "values": ["O", "F"]},
    {"rule": "price_positive", "kind": "range",
     "col": "l_extendedprice", "lo": 0.01, "hi": 1e12},
    {"rule": "quantity_range", "kind": "range", "col": "l_quantity",
     "lo": 1.0, "hi": 50.0},
    {"rule": "returnflag_domain", "kind": "in_set",
     "col": "l_returnflag", "values": ["A", "N", "R"]},
    {"rule": "tax_range", "kind": "range", "col": "l_tax",
     "lo": 0.0, "hi": 0.08},
]
