"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

Registers the testdata parquet tables as DuckDB views, runs the oracle
SQL, and compares against the Spark result: row count, column names,
and order-insensitive values (floats to 9 significant digits — stricter
than needed; the driver hashes, so we also expose an exact mode).

The DuckDB side is fetched via ``.df()`` (pandas/arrow), NOT
``fetchall()``: the driver serializes a pandas frame, where DuckDB's
HUGEINT (bare integer ``sum()``) and DECIMAL render as float64 while
Spark emits bigint — ``fetchall()`` returns Python ints and is
structurally blind to that class (bit r5 and r6 ``text_novelty``).
On top of value equality we assert integer-vs-float dtype-kind
compatibility per column so an uncast aggregate fails locally the same
way it fails at the driver.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

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
    if isinstance(v, np.ndarray):
        return tuple(_canon(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (float, np.floating, Decimal)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if isinstance(v, (int, np.integer)):
        return int(v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        # midnight-naive timestamps canonicalize to the date so a DATE
        # column on one side and midnight TIMESTAMP on the other agree
        if v.tzinfo is None and (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _sort_key(row):
    return tuple((v is None, str(v)) for v in row)


def rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(canon, key=_sort_key), [colnames[i] for i in order]


_NUMERIC_KINDS = {"i", "u", "f"}


def _assert_numeric_kind_compat(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    """Fail when one engine delivers an integer column and the other a
    float column — the HUGEINT/DECIMAL leak class the driver's hash
    catches. Non-numeric / mixed-object columns fall through to value
    comparison."""
    for c in spark_pdf.columns:
        sk = spark_pdf[c].dtype.kind
        dk = duck_pdf[c].dtype.kind
        if sk in _NUMERIC_KINDS and dk in _NUMERIC_KINDS:
            s_int = sk in ("i", "u")
            d_int = dk in ("i", "u")
            assert s_int == d_int, (
                f"dtype-kind mismatch on column {c!r}: spark={spark_pdf[c].dtype} "
                f"duck={duck_pdf[c].dtype} — integer on one side, float on the "
                f"other; CAST the oracle aggregate (DuckDB bare sum() is "
                f"HUGEINT → float64 in the driver's pandas fetch)"
            )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(sql).df()
    spark_cols = list(spark_pdf.columns)
    duck_cols = list(duck_pdf.columns)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    _assert_numeric_kind_compat(spark_pdf, duck_pdf[spark_cols])

    spark_rows = list(spark_pdf.itertuples(index=False, name=None))
    duck_rows = list(duck_pdf.itertuples(index=False, name=None))
    s_set, cols = rowset(spark_rows, spark_cols)
    d_set, _ = rowset(duck_rows, duck_cols)
    for i, (a, b) in enumerate(zip(s_set, d_set)):
        assert a == b, f"value mismatch at sorted row {i} (cols {cols}):\n spark={a}\n duck ={b}"
