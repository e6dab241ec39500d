"""databus_spark — a PySpark-native change-data-capture analytics engine.

A from-scratch rebuild of the *capabilities* of linkedin/databus
(reference read-only at /root/reference) on Apache Spark: change-event
envelope streams, server-side subscription filter algebra, snapshot
compaction (bootstrap log/applier), snapshot+catchup handoff, consumer
checkpoints — re-expressed as DataFrame/SQL plans and Structured
Streaming, plus large-scale training-data operators (dedup, similarity
search, text analysis) the original never had.

Design stance (see SURVEY.md):
- DataFrame/SQL first; Catalyst owns physical planning.
- The transport layer of the reference (relays, Netty, ring buffers)
  is replaced by Spark sources/sinks + checkpoints, not re-implemented.
- Every operator that is SQL-expressible ships with a DuckDB oracle
  (databus_spark.registry) for bit-level correctness checks.
"""

__version__ = "0.1.0"

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
