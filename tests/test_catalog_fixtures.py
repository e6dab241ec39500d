"""Fixture-drift guard: load_table must succeed and yield stable dtypes.

The driver regenerates /root/testdata between rounds and has already changed
the physical encoding of events.ts once (TIMESTAMP(NANOS) -> timestamp[us]),
which broke every events-path query for a round. This test runs first
(test_catalog_* sorts early) and pins the *loaded* schema for every table so
an encoding drift fails here, loudly, before any query-level test.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import TimestampType

from databus_spark import TABLES
from databus_spark.catalog import load_table

EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("table", TABLES)
def test_load_table_succeeds_and_columns_stable(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    missing = EXPECTED_COLUMNS[table] - set(df.columns)
    assert not missing, f"{table}: fixture lost columns {missing}; got {df.columns}"
    # Force analysis + one batch of actual reading so physical-encoding
    # drift (not just schema drift) is caught here.
    assert df.limit(1).count() >= 0


def test_events_ts_is_session_tz_timestamp(spark, sf_dir):
    """Whatever the parquet encoding (nanos-as-long, timestamp[us] NTZ, or
    timestamp-with-tz), load_table must normalize events.ts to TimestampType
    so every downstream window/lag/sessionize query and its DuckDB oracle
    agree on values (session tz is UTC)."""
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.schema["ts"].dataType
    row = df.selectExpr("min(ts) as lo", "max(ts) as hi").collect()[0]
    assert row.lo is not None and row.hi >= row.lo


def test_queries_survive_non_utc_host_session(spark, sf_dir):
    """The driver passes its OWN SparkSession; if its timezone is not
    UTC, naive-timestamp normalization and window bucketing would skew
    instants vs the DuckDB oracle. load_table pins the session timezone,
    so time-dependent queries must stay oracle-green even when the host
    session starts in another zone."""
    from databus_spark.registry import ORACLES, QUERIES
    from tests.oracle_utils import compare, duck_connect

    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        con = duck_connect(sf_dir)
        for q in ["time_window_tumbling", "sessionize", "event_rate_anomaly"]:
            compare(QUERIES[q](spark, sf_dir), con, ORACLES[q])
        con.close()
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
