"""Local replica of the driver's Ray-vs-DuckDB correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin on the same
sf dir, normalizes (sort columns by name, sort rows, round floats to 6dp),
and compares row-count + schema + values. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == np.float64 or df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64).round(6)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype(np.int64)
        if df[c].dtype == bool:
            df[c] = df[c].astype(np.int64)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import importlib

    entry = importlib.import_module("__ray_entry__")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_nosql = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {name}: ray side raised: {e!r}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[ROWS] {name}: {len(got)} rows (no oracle)")
            n_nosql += 1
            continue
        try:
            exp = normalize(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {name}: duckdb raised: {e!r}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        if not got.equals(exp):
            diff = (got != exp) & ~(got.isna() & exp.isna())
            bad_rows = diff.any(axis=1)
            print(f"[FAIL] {name}: {int(bad_rows.sum())} mismatching rows; first:")
            idx = bad_rows.idxmax()
            print("  got:", got.loc[idx].to_dict())
            print("  exp:", exp.loc[idx].to_dict())
            n_fail += 1
            continue
        print(f"[ OK ] {name}: {len(got)} rows")
        n_pass += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_nosql}")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
