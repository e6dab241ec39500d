"""Streaming-native capabilities the reference lacks (SURVEY §2.10 T13):
event-time windows + watermarks with late data, and a custom stateful
per-key operator via applyInPandasWithState."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _write_chunk(spark, rows, schema, path, i):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/chunk={i:04d}"
    )


def test_watermark_drops_too_late_events(spark, tmp_path):
    """Windowed agg with a 10-minute watermark: an event arriving far
    behind the watermark is discarded; a mildly-late one is merged."""
    schema = "ts timestamp, k string, v long"
    src = str(tmp_path / "src")

    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1, 0, 0, 0)
    m = timedelta(minutes=1)
    _write_chunk(spark, [(base + 2 * m, "a", 1), (base + 61 * m, "a", 1)], schema, src, 1)
    # mildly late (within watermark of head 61m): 55m -> window [50,60) OK
    _write_chunk(spark, [(base + 55 * m, "a", 10)], schema, src, 2)
    # far too late (behind watermark): 2m again -> dropped
    _write_chunk(spark, [(base + 3 * m, "a", 100)], schema, src, 3)
    _write_chunk(spark, [(base + 120 * m, "a", 1)], schema, src, 4)  # advance wm

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/chunk=*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "k")
        .agg(F.sum("v").alias("s"))
        .select(F.col("w.start").alias("ws"), "k", "s")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = {r["ws"].isoformat(): r["s"] for r in spark.sql("SELECT * FROM wm_out").collect()}
    # first window emitted once the watermark passed, WITHOUT the too-late 100
    assert out.get("2024-01-01T00:00:00") == 1
    # the mildly-late event made its own window
    assert out.get("2024-01-01T00:50:00") == 10


def test_apply_in_pandas_with_state_per_key_dedup(spark, tmp_path):
    """Custom stateful operator: cross-batch per-key max-scn dedup —
    emits only events with scn greater than any previously seen for the
    key (the stateful streaming analog of the applier's last-wins)."""
    schema = "key string, scn long, payload string"
    src = str(tmp_path / "src")
    _write_chunk(spark, [("k1", 5, "a"), ("k2", 1, "b")], schema, src, 1)
    _write_chunk(spark, [("k1", 3, "STALE"), ("k2", 2, "c"), ("k3", 7, "d")], schema, src, 2)
    _write_chunk(spark, [("k1", 6, "e"), ("k3", 7, "DUP")], schema, src, 3)

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("scn", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("max_scn", T.LongType())])

    def dedup_fn(key, pdfs, state: GroupState):
        seen = state.get[0] if state.exists else -1
        rows = pd.concat(list(pdfs)).sort_values("scn")
        fresh = rows[rows["scn"] > seen]
        if len(fresh):
            state.update((int(fresh["scn"].max()),))
        yield fresh[["key", "scn", "payload"]]

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/chunk=*")
    )
    dedup = stream.groupBy("key").applyInPandasWithState(
        dedup_fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {(r["key"], r["scn"], r["payload"]) for r in spark.sql("SELECT * FROM state_out").collect()}
    assert ("k1", 3, "STALE") not in rows          # cross-batch stale dropped
    assert ("k3", 7, "DUP") not in rows            # cross-batch duplicate dropped
    assert {("k1", 5, "a"), ("k1", 6, "e"), ("k2", 1, "b"), ("k2", 2, "c"), ("k3", 7, "d")} <= rows
