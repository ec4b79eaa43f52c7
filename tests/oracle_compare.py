"""Shared Spark-vs-DuckDB comparison harness, mimicking the driver's
correctness gate: row-count + schema-width + order-insensitive value
compare under sorted column names."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            s = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.round(6)
        elif s.dtype == object:
            s = s.map(
                lambda v: str(v)
                if not isinstance(v, float)
                else f"{round(v, 6)}"
            )
        out[c] = s.astype(str)
    norm = pd.DataFrame(out)
    return norm.sort_values(by=list(norm.columns)).reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()
    if len(actual) != len(expected):
        return False, f"row count {len(actual)} != {len(expected)}"
    if sorted(actual.columns) != sorted(expected.columns):
        return False, f"col names {sorted(actual.columns)} != {sorted(expected.columns)}"
    a, e = _normalize(actual), _normalize(expected)
    if not a.equals(e):
        diff_mask = (a != e).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(3).add_suffix("_spark"),
             e[diff_mask].head(3).add_suffix("_oracle")],
            axis=1,
        )
        return False, f"{int(diff_mask.sum())} differing rows; sample:\n{sample}"
    return True, f"ok ({len(actual)} rows)"
