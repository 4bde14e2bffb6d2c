"""Local re-implementation of the driver's Spark-vs-DuckDB comparator.

Used by tests to validate every ``queries()``/``oracle_sql()`` pair before
the driver does: row count, column names, and an order-insensitive value
comparison (sort columns by name, canonicalize values to strings, sort rows,
compare). Stricter than a hash — on mismatch it shows the first differing rows.
"""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pandas as pd

from gensor_spark.sources.tables import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).df()


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_cell)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    if not got.equals(want):
        diff_mask = (got != want).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch; first spark rows:\n"
            f"{got[diff_mask].head(5)}\nfirst oracle rows:\n{want[diff_mask].head(5)}"
        )
