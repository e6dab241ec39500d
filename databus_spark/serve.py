"""Relay serving facade: the /sources /register /stream API surface.

The reference relay exposes three HTTP endpoints consumers use in order
(reference: databus2-relay-impl/.../relay/HttpRelay.java:249-269 registers
the processors; SourcesRequestProcessor.java:47, RegisterRequestProcessor.java:57,
ReadEventsRequestProcessor.java:75-240):

  /sources   -> the sourceId<->name registry
  /register  -> schemas for the subscribed sources (writer versions)
  /stream    -> events after a checkpoint, through server-side filters,
                bounded by a byte budget

Spark restatement: the facade answers each call with a DataFrame built
from the same primitives the rest of the engine uses — the transport is
whatever the caller does with the frame (collect for an RPC-sized page,
write for a bulk hand-off). This is the single entry point a reference
client would port against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from databus_spark.catalog import SOURCE_IDS, sources_registry
from databus_spark.plans.filterconfig import compile_config
from databus_spark.sources.schema_registry import SchemaRegistry
from databus_spark.streaming.checkpoint import Checkpoint

EVENT_HEADER_BYTES = 45  # DbusEventV2 fixed header (DbusEventV2.java:33-90)


class RelayFacade:
    def __init__(self, spark: SparkSession, log: DataFrame, schemas: SchemaRegistry | None = None):
        self.spark = spark
        self.log = log
        self.schemas = schemas or SchemaRegistry()

    # -- /sources -------------------------------------------------------------
    def sources(self) -> DataFrame:
        return sources_registry(self.spark)

    # -- /register ------------------------------------------------------------
    def register(self, source_names: list[str]) -> DataFrame:
        """Schemas (all versions) for the subscribed sources; consumers
        cache these before streaming (RegisterRequestProcessor)."""
        unknown = [s for s in source_names if s not in SOURCE_IDS]
        if unknown:
            raise KeyError(f"unknown sources: {unknown}")
        rows = [
            (s.schema_id, s.name, s.version, s.ddl)
            for name in source_names
            for s in self.schemas._versions.get(name, [])
        ]
        return self.spark.createDataFrame(
            rows, "schema_id STRING, schema_name STRING, schema_version INT, ddl STRING"
        )

    # -- /stream --------------------------------------------------------------
    def stream(
        self,
        checkpoint: Checkpoint | int,
        sources: list[str] | None = None,
        filter_config: dict | None = None,
        partitions: list[int] | None = None,
        size_bytes: int | None = None,
    ) -> DataFrame:
        """Events after the checkpoint SCN through the server-side filter
        conjunction {source, partition, key filters}, size-bounded —
        ReadEventsRequestProcessor.process semantics as one plan."""
        since = checkpoint.windowScn if isinstance(checkpoint, Checkpoint) else int(checkpoint)
        out = self.log.where(F.col("scn") > since)
        pred: Column = F.lit(True)
        if sources is not None:
            pred = pred & F.col("source").isin(sources)
        if partitions is not None:
            pred = pred & F.col("part_id").isin(partitions)
        if filter_config is not None:
            pred = pred & compile_config(filter_config)
        out = out.where(pred)
        if size_bytes is not None:
            row_bytes = (
                EVENT_HEADER_BYTES + F.length("key_str") + F.length("source")
            ).cast("long")
            w = Window.orderBy("scn", "source", "key_str").rowsBetween(
                Window.unboundedPreceding, 0
            )
            out = (
                out.withColumn("_rb", row_bytes)
                .withColumn("_cum", F.sum("_rb").over(w))
                .where(F.col("_cum") <= size_bytes)
                .drop("_rb", "_cum")
            )
        return out
