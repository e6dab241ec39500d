"""The engine's SQL surface: temp views + scalar SQL functions.

SURVEY §2.6 notes grouping sets / cube / rollup come free "if we expose
SQL over materialized change tables" — this module is that exposure.
``register_sql_surface(spark, sf_dir)`` registers:

* the base tables (region .. embeddings) as temp views,
* the change streams (``orders_changelog``, ``customer_changelog``,
  ``lineitem_changelog``, and the interleaved ``databus_stream``),
* compacted latest-state views (``orders_state``, ``customer_state``),
* the scalar function family as **SQL UDFs** (Spark 4 `CREATE
  TEMPORARY FUNCTION ... RETURN expr` — pure Catalyst expressions, so
  a SQL author gets the same codegen'd plan the Python API builds;
  NOT `spark.udf.register` Python UDFs, which would put a Python
  round-trip in every row):

  - ``java_string_hashcode(s)`` — bit-exact Java String.hashCode()
    (KeyModFilter.java:72-79 buckets string keys with it)
  - ``key_mod_bucket(s, buckets)`` — the KeyModFilter bucket id
  - ``portable_hash64(s, seed)`` — the engine's seedable 60-bit hash
    (DuckDB-mirrorable md5 fold used by minhash/simhash/LSH)

After registration every query in this engine's registry is authorable
in pure SQL; ``registry.sql_surface_window_stats`` is the
driver-checked proof query (grouping-sets + key_mod_bucket + a windowed
latest-state dedup, all in one SQL string).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from databus_spark import TABLES
from databus_spark.catalog import register_views

_SQL_FUNCTIONS = (
    # NULL guard mirrors functions/hashes.py: Objects.hashCode(null) is 0,
    # but the engine's contract is NULL in -> NULL out
    """
    CREATE OR REPLACE TEMPORARY FUNCTION java_string_hashcode(s STRING)
    RETURNS INT
    RETURN CASE WHEN s IS NULL THEN CAST(NULL AS INT)
                ELSE CAST(reflect('java.util.Objects', 'hashCode', s) AS INT)
           END
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION key_mod_bucket(s STRING, buckets INT)
    RETURNS BIGINT
    RETURN abs(CAST(java_string_hashcode(s) AS BIGINT)) % buckets
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION portable_hash64(s STRING, seed BIGINT)
    RETURNS BIGINT
    RETURN CAST(conv(substring(md5(concat_ws('|', seed, s)), 1, 15), 16, 10)
                AS BIGINT)
    """,
)


def register_sql_surface(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the engine's views + SQL functions; returns view names."""
    from databus_spark.envelope import (
        CUSTOMER_PAYLOAD,
        ORDERS_PAYLOAD,
        customer_changelog,
        lineitem_changelog,
        multi_source_changelog,
        orders_changelog,
    )
    from databus_spark.operators.compaction import snapshot

    register_views(spark, sf_dir)
    views: list[str] = list(TABLES)

    o = orders_changelog(spark, sf_dir)
    c = customer_changelog(spark, sf_dir)
    for name, df in (
        ("orders_changelog", o),
        ("customer_changelog", c),
        ("lineitem_changelog", lineitem_changelog(spark, sf_dir)),
        ("databus_stream", multi_source_changelog(spark, sf_dir)),
        ("orders_state", snapshot(o, key_cols=("key_str",), payload_cols=ORDERS_PAYLOAD)),
        ("customer_state", snapshot(c, key_cols=("key_str",), payload_cols=CUSTOMER_PAYLOAD)),
    ):
        df.createOrReplaceTempView(name)
        views.append(name)

    for ddl in _SQL_FUNCTIONS:
        spark.sql(ddl)
    return views
