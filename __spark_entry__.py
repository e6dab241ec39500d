"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship pipeline; queries()/oracle_sql() expose every
implemented operator with its DuckDB oracle (see databus_spark.registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: change-stream -> subscription filter -> compacted snapshot.

    The minimum end-to-end databus slice (SURVEY.md §7 Phase 1): a
    deterministic change log derived from sf0.001 orders, filtered by a
    mod-partition subscription, compacted to latest-state per key.
    """
    from pyspark.sql import functions as F

    from databus_spark.envelope import ORDERS_PAYLOAD, orders_changelog
    from databus_spark.operators.compaction import snapshot
    from databus_spark.operators.filters import key_mod_filter

    log = orders_changelog(spark, "/root/testdata/sf0.001")
    subscribed = log.where(key_mod_filter(4, 0, 2))
    return snapshot(subscribed, key_cols=("key_str",), payload_cols=ORDERS_PAYLOAD)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from databus_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from databus_spark.registry import ORACLES

    return dict(ORACLES)
