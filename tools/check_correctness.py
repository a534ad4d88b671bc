"""Local emulation of the driver's correctness gate: run each
queries() entry via Ray AND its oracle_sql() via DuckDB on the same
parquet tables, compare row-count + schema + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT ray={len(ray_df)} sql={len(sql_df)}"
    a, b = canonical(ray_df), canonical(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA ray={list(a.columns)} sql={list(b.columns)}"
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            return f"DTYPE {col}: ray={a[col].dtype} sql={b[col].dtype}"
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        detail = []
        for c in bad_cols[:2]:
            idx = neq[c].idxmax()
            detail.append(f"{c}[{idx}]: {a[c][idx]!r} vs {b[c][idx]!r}")
        return f"VALUES cols={bad_cols} {detail}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"{name:24s} RAY-ERROR {type(exc).__name__}: {exc}")
            failures += 1
            continue
        elapsed = time.time() - t0
        if name in oracles:
            try:
                sql_df = con.sql(oracles[name]).df()
            except Exception as exc:
                print(f"{name:24s} SQL-ERROR {exc}")
                failures += 1
                continue
            verdict = compare(name, ray_df, sql_df)
        else:
            verdict = f"rows-only ({len(ray_df)} rows)"
        status = verdict if verdict.startswith(("OK", "rows-only")) else \
            f"FAIL {verdict}"
        if status.startswith("FAIL"):
            failures += 1
        print(f"{name:24s} {status}  [{elapsed:.1f}s]")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
