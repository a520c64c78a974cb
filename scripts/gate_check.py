"""Simulate the driver's correctness gate: run every queries() entry from a
non-repo cwd, compare values against oracle_sql() in DuckDB at sf0.01.

Usage: cd /tmp && python /root/repo/scripts/gate_check.py [sf_dir]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

_args = [a for a in sys.argv[1:] if not a.startswith("--only")]
_only = [
    a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--only=")
]
ONLY = set(_only[0].split(",")) if _only else None
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            if not np.allclose(
                av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9,
                equal_nan=True,
            ):
                return False
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                return False
    return True


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    import __spark_entry__ as e

    n = e.entry(spark).count()
    print(f"entry: {n} rows")
    qs, osql = e.queries(), e.oracle_sql()
    n_ok = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        if ONLY is not None and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            continue
        a, b = norm(sdf), norm(odf)
        if values_match(a, b):
            print(f"OK {name}: {len(a)} rows")
            n_ok += 1
        else:
            print(f"FAIL {name}: mismatch spark={a.shape} oracle={b.shape} "
                  f"cols spark={list(a.columns)} oracle={list(b.columns)}")
            n_fail += 1
    print(f"SUMMARY ok={n_ok} rows_only={n_rows_only} fail={n_fail}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
