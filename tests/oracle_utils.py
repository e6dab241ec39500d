"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

Registers the testdata parquet tables as DuckDB views, runs the oracle
SQL, and compares against the Spark result: row count, column names,
and order-insensitive values (floats to 9 significant digits — stricter
than needed; the driver hashes, so we also expose an exact mode).
"""

from __future__ import annotations

import math

import duckdb

from databus_spark import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _sort_key(row):
    return tuple((v is None, str(v)) for v in row)


def rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(canon, key=_sort_key), [colnames[i] for i in order]


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_set, cols = rowset(spark_rows, spark_cols)
    d_set, _ = rowset(duck_rows, duck_cols)
    for i, (a, b) in enumerate(zip(s_set, d_set)):
        assert a == b, f"value mismatch at sorted row {i} (cols {cols}):\n spark={a}\n duck ={b}"
