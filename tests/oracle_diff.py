"""Local mirror of the driver's duckdb-oracle comparison: row count,
schema (column names), and order-insensitive values after sorting
columns by name and rows by value."""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(path).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime64"):
            df[c] = col.astype("datetime64[us]")
        elif col.dtype == object:
            df[c] = col.map(lambda v: str(v) if v is not None else None)
        elif str(col.dtype) in ("float32",):
            df[c] = col.astype("float64")
        elif str(col.dtype).startswith(("int", "uint", "Int")):
            df[c] = col.astype("int64")
        elif str(col.dtype) == "bool" or str(col.dtype) == "boolean":
            df[c] = col.astype("bool")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    got = normalize(spark_df.toPandas())
    want = normalize(duckdb_run(oracle_sql, sf_dir))
    problems: list[str] = []
    if list(got.columns) != list(want.columns):
        problems.append(f"schema: spark={list(got.columns)} oracle={list(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rowcount: spark={len(got)} oracle={len(want)}")
        return problems
    try:
        # check_dtype=True: after normalize() semantically-equal frames share
        # dtypes, so an int64-vs-float64 drift (e.g. a DuckDB HUGEINT SUM
        # arriving as float64 against a Spark BIGINT) fails locally instead of
        # surfacing as a driver hash mismatch.
        pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=False, rtol=0, atol=1e-12)
    except AssertionError as e:
        problems.append(f"values: {str(e)[:2000]}")
    return problems
