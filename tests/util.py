"""Order-insensitive DataFrame comparison mimicking the driver's check:
row count + schema (column names) + value multiset equality."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the driver-contract views pre-registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9).astype(str)
        else:
            df[c] = s.astype(str)
        df.loc[s.isna(), c] = "<NULL>"
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, oracle: str, min_rows: int = 1, sf_dir: str | None = None) -> None:
    got = normalize(spark_df.toPandas())
    con = duckdb_conn(sf_dir) if sf_dir else duckdb
    want = normalize(con.sql(oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert len(got) >= min_rows, f"suspiciously few rows: {len(got)}"
    eq = got.equals(want)
    if not eq:
        diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
        for c in diff_cols[:3]:
            m = got[c] != want[c]
            raise AssertionError(
                f"value mismatch in column {c}: "
                f"got {got[m][c].head(3).tolist()} want {want[m][c].head(3).tolist()}"
            )
    assert eq
