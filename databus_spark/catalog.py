"""Source catalog: the engine's analog of databus' /sources + /register.

The reference addresses streams as
(physicalSource, physicalPartition, logicalSource[, logicalPartition])
(reference: databus-core/.../core/data_model/DatabusSubscription.java:45-123)
and serves a sourceId<->name registry
(reference: databus2-relay-impl/.../request/SourcesRequestProcessor.java:47).

Here a "physical source" is a dataset root directory (an sf dir of
parquet tables), logical sources are tables, and the registry is a tiny
broadcast-able dimension DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databus_spark import TABLES

# Logical-source id assignment (stable; mirrors the reference's
# SourceIdNameRegistry role, databus-core-schemas/.../SourceIdNameRegistry.java).
# CDC-enabled sources get the low ids used by envelope.py.
SOURCE_IDS: dict[str, int] = {
    "orders": 1,
    "customer": 2,
    "lineitem": 3,
    "events": 4,
    "documents": 5,
    "embeddings": 6,
    "region": 7,
    "nation": 8,
    "supplier": 9,
    "part": 10,
}
assert set(SOURCE_IDS) == set(TABLES)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The engine's time semantics (NTZ->timestamp normalization, window
    # bucketing, unix_timestamp) and every DuckDB oracle assume UTC. The
    # driver harness passes its OWN SparkSession, whose timezone we don't
    # control — pin it here, on the path every query's table access
    # takes, so a non-UTC host session can't skew instants vs the oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Fixture generations differ in how events.ts is written:
        #   - TIMESTAMP(NANOS): Spark's parquet reader rejects it unless
        #     nanosAsLong is set, in which case ts loads as LongType and we
        #     truncate to micros (what DuckDB's micro TIMESTAMP does);
        #   - timestamp[us] (isAdjustedToUTC=false): loads as TIMESTAMP_NTZ.
        # Branch on the *loaded* dtype so both layouts work, and normalize to
        # TimestampType (session tz is UTC, so NTZ -> TZ is value-preserving).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sources_registry(spark: SparkSession) -> DataFrame:
    """Small dimension table: source_id <-> source name (broadcast side
    of J2/J5). Built as a pure-JVM LocalRelation (SQL VALUES), NOT
    createDataFrame over Python rows: the latter plans as a
    pickle-serialized Python RDD whose first evaluation spawns a
    non-Arrow Python worker (~1.2 s billed to whichever query touches
    the dim first — the r6 source_registry_join 'regression'), and its
    UnknownPartitioning scan blocks stats-based planning."""
    rows_sql = ", ".join(f"({sid}, '{name}')" for name, sid in SOURCE_IDS.items())
    return spark.sql(
        f"SELECT col1 AS source_id, col2 AS source FROM (VALUES {rows_sql})"
    )
