"""Driver-gate rehearsal: every queries() entry vs its DuckDB oracle.

Mimics the harness comparison (row count + schema-agnostic sorted value
equality) at sf0.01 so CORRECTNESS_r{N}.json failures are caught here
first. Comparison is EXACT (the driver hashes values); floats must agree
bit-for-bit (our queries round any FP-accumulating column on both sides).
"""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # canonicalize cell values for exact compare
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"f:{int(v)}"
            return f"f:{v!r}"
        if isinstance(v, bool):
            return f"b:{v}"
        return f"{type(v).__name__ if False else ''}{v}"

    out = pdf.map(canon)
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    got = q(spark, SF_DIR).toPandas()
    want = ddb.execute(sql).fetchdf()

    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert len(got) > 0, f"{name}: empty result"
    g = _normalize(got)
    w = _normalize(want)
    assert list(g.columns) == list(w.columns), (
        f"{name}: columns {list(g.columns)} != {list(w.columns)}"
    )
    mism = (g != w).any(axis=1)
    if mism.any():
        idx = mism.idxmax()
        raise AssertionError(
            f"{name}: value mismatch at sorted row {idx}:\n"
            f"spark:  {g.iloc[idx].to_dict()}\n"
            f"oracle: {w.iloc[idx].to_dict()}"
        )


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
