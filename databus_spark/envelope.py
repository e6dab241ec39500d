"""The change-event envelope and deterministic changelog fixtures.

The unit of data in the reference is a DbusEvent: (sequence/SCN, key,
timestamp, sourceId, partitionId, opcode UPSERT|DELETE, Avro payload)
(reference: databus-core/databus-core-impl/.../core/DbusEventV2.java:33-90,
DbusOpcode.java:21-26, DbusEventKey.java:30-35). This module defines the
Spark-native envelope (one schema for all change streams) and builds
deterministic change logs from the driver's TPC-H-ish base tables so
every downstream operator is verifiable against a DuckDB oracle.

Envelope columns (CRC/magic/length bookkeeping of the wire format is
dropped — Spark storage integrity replaces it):

    scn       BIGINT   event-window sequence, total order per partition
    ts        TIMESTAMP event creation time
    opcode    STRING   'UPSERT' | 'DELETE'
    source    STRING   logical source name
    source_id INT
    part_id   INT      physical partition id
    key_num   BIGINT   numeric key (NULL for string-keyed sources)
    key_str   STRING   canonical string key (always set)
    txn_end   BOOLEAN  end-of-window marker (DbusEvent.isEndOfPeriodMarker analog)
    + flattened payload columns of the source table

Deterministic changelog rules (seeded by the key itself, so Spark and
DuckDB reproduce the identical log):

  orders   (long key o_orderkey, source_id 1, 1 row per txn window)
    insert : scn = o_orderkey
    update : keys with o_orderkey % 7 == 0 -> scn = 1e9 + key,
             o_totalprice += 1000.0, o_orderstatus = 'U'
    delete : keys with o_orderkey % 13 == 0 -> scn = 2e9 + key, NULL payload
  customer (string key c_name, source_id 2)
    insert : scn = 10000 + c_custkey
    update : c_custkey % 5 == 0 -> scn = 20000 + c_custkey, c_acctbal += 100.0
    delete : c_custkey % 11 == 0 -> scn = 30000 + c_custkey
  lineitem (composite key (l_orderkey, l_linenumber), source_id 3,
            MULTI-ROW txn windows: one scn per order)
    insert : scn = 4e9 + l_orderkey   (all lines of an order share a window)
    update : l_orderkey % 3 == 0 -> scn = 5e9 + l_orderkey, l_quantity += 1.0

Each builder has a mirrored `*_CHANGELOG_SQL` DuckDB CTE used by the
correctness oracles in databus_spark.registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from databus_spark.catalog import load_table

ENVELOPE_COLS = [
    "scn",
    "ts",
    "opcode",
    "source",
    "source_id",
    "part_id",
    "key_num",
    "key_str",
    "txn_end",
]

UPDATE_BASE = 1_000_000_000
DELETE_BASE = 2_000_000_000
LI_INSERT_BASE = 4_000_000_000
LI_UPDATE_BASE = 5_000_000_000

ORDERS_PAYLOAD = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]
CUSTOMER_PAYLOAD = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
LINEITEM_PAYLOAD = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def _envelope(df: DataFrame, payload_cols: list[str]) -> DataFrame:
    return df.select(*ENVELOPE_COLS, *payload_cols)


# Once-per-process changelog staging, opt-in via DATABUS_CACHE_CHANGELOGS=1.
# The relay persists events ONCE and every consumer reads the staged
# buffer; re-deriving the synthetic changelog inside each of 70+ queries
# measures fixture construction, not the operator. With the flag set,
# each builder writes its changelog to a per-process parquet stage dir on
# first use and every later call reads that — a real file source, so
# column pruning and predicate pushdown still shape downstream plans
# (unlike a localCheckpoint, which would also be destroyed by the bench's
# unpersist-between-queries hygiene). Off by default so plan tests that
# assert pushdown into the BASE tables see the original scans.
_STAGE_ROOT: str | None = None


def _staged(kind: str, spark: SparkSession, sf_dir: str, build) -> DataFrame:
    import hashlib
    import os
    import tempfile

    if os.environ.get("DATABUS_CACHE_CHANGELOGS") != "1":
        return build()
    global _STAGE_ROOT
    if _STAGE_ROOT is None:
        _STAGE_ROOT = tempfile.mkdtemp(prefix="databus_staged_")
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(_STAGE_ROOT, f"{kind.replace(':', '_')}_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _staged("orders", spark, sf_dir, lambda: _build_orders(spark, sf_dir))


def _build_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base_env = [
        F.col("o_orderdate").alias("ts"),
        F.lit("orders").alias("source"),
        F.lit(1).alias("source_id"),
        (k % 4).cast("int").alias("part_id"),
        k.alias("key_num"),
        k.cast("string").alias("key_str"),
        F.lit(True).alias("txn_end"),
    ]
    inserts = o.select(k.alias("scn"), *base_env, F.lit("UPSERT").alias("opcode"), *ORDERS_PAYLOAD)
    updates = o.where(k % 7 == 0).select(
        (k + UPDATE_BASE).alias("scn"),
        *base_env,
        F.lit("UPSERT").alias("opcode"),
        k.alias("o_orderkey"),
        F.col("o_custkey"),
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.col("o_orderdate"),
        F.col("o_orderpriority"),
    )
    deletes = o.where(k % 13 == 0).select(
        (k + DELETE_BASE).alias("scn"),
        *base_env,
        F.lit("DELETE").alias("opcode"),
        k.alias("o_orderkey"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    return _envelope(inserts.unionByName(updates).unionByName(deletes), ORDERS_PAYLOAD)


ORDERS_CHANGELOG_SQL = f"""
    SELECT o_orderkey AS scn, o_orderdate AS ts, 'UPSERT' AS opcode,
           'orders' AS source, 1 AS source_id,
           CAST(o_orderkey % 4 AS INT) AS part_id,
           o_orderkey AS key_num, CAST(o_orderkey AS VARCHAR) AS key_str,
           TRUE AS txn_end,
           o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM orders
    UNION ALL
    SELECT o_orderkey + {UPDATE_BASE}, o_orderdate, 'UPSERT', 'orders', 1,
           CAST(o_orderkey % 4 AS INT), o_orderkey, CAST(o_orderkey AS VARCHAR),
           TRUE, o_orderkey, o_custkey, 'U', o_totalprice + 1000.0,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey + {DELETE_BASE}, o_orderdate, 'DELETE', 'orders', 1,
           CAST(o_orderkey % 4 AS INT), o_orderkey, CAST(o_orderkey AS VARCHAR),
           TRUE, o_orderkey, NULL, NULL, NULL, NULL, NULL
    FROM orders WHERE o_orderkey % 13 = 0
"""


def customer_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _staged("customer", spark, sf_dir, lambda: _build_customer(spark, sf_dir))


def _build_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    base_env = [
        F.timestamp_micros((F.lit(800_000_000) + k) * 1_000_000).alias("ts"),
        F.lit("customer").alias("source"),
        F.lit(2).alias("source_id"),
        (k % 4).cast("int").alias("part_id"),
        F.lit(None).cast("long").alias("key_num"),
        F.col("c_name").alias("key_str"),
        F.lit(True).alias("txn_end"),
    ]
    inserts = c.select(
        (k + 10_000).alias("scn"), *base_env, F.lit("UPSERT").alias("opcode"), *CUSTOMER_PAYLOAD
    )
    updates = c.where(k % 5 == 0).select(
        (k + 20_000).alias("scn"),
        *base_env,
        F.lit("UPSERT").alias("opcode"),
        k.alias("c_custkey"),
        F.col("c_name"),
        F.col("c_nationkey"),
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.col("c_mktsegment"),
    )
    deletes = c.where(k % 11 == 0).select(
        (k + 30_000).alias("scn"),
        *base_env,
        F.lit("DELETE").alias("opcode"),
        k.alias("c_custkey"),
        F.col("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
    )
    return _envelope(inserts.unionByName(updates).unionByName(deletes), CUSTOMER_PAYLOAD)


CUSTOMER_CHANGELOG_SQL = """
    SELECT c_custkey + 10000 AS scn,
           make_timestamp((800000000 + c_custkey) * 1000000) AS ts,
           'UPSERT' AS opcode, 'customer' AS source, 2 AS source_id,
           CAST(c_custkey % 4 AS INT) AS part_id,
           CAST(NULL AS BIGINT) AS key_num, c_name AS key_str, TRUE AS txn_end,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    UNION ALL
    SELECT c_custkey + 20000, make_timestamp((800000000 + c_custkey) * 1000000),
           'UPSERT', 'customer', 2, CAST(c_custkey % 4 AS INT),
           NULL, c_name, TRUE,
           c_custkey, c_name, c_nationkey, c_acctbal + 100.0, c_mktsegment
    FROM customer WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey + 30000, make_timestamp((800000000 + c_custkey) * 1000000),
           'DELETE', 'customer', 2, CAST(c_custkey % 4 AS INT),
           NULL, c_name, TRUE,
           c_custkey, c_name, NULL, NULL, NULL
    FROM customer WHERE c_custkey % 11 = 0
"""


def lineitem_changelog(
    spark: SparkSession, sf_dir: str, with_schema_key: bool = False
) -> DataFrame:
    return _staged(
        f"lineitem:{with_schema_key}",
        spark,
        sf_dir,
        lambda: _build_lineitem(spark, sf_dir, with_schema_key),
    )


def _build_lineitem(
    spark: SparkSession, sf_dir: str, with_schema_key: bool = False
) -> DataFrame:
    """Multi-row txn windows: every lineitem of one order shares one scn.

    txn_end marks the window's last row (highest l_linenumber), the
    analog of the end-of-period control event written by
    DbusEventBuffer.endEvents (reference: core/DbusEventBuffer.java:1982).

    with_schema_key=True adds the first-class composite `key_struct`
    column (DbusEventKey SCHEMA type — operators/keys.py); its canonical
    string form equals key_str by construction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    # The synthetic lineitem has duplicate (l_orderkey, l_linenumber) pairs;
    # a CDC key must identify a row, so disambiguate with a deterministic
    # in-group sequence (the 6-col order below is a total order at all SFs).
    seq_w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    # NOTE: a localCheckpoint here (sharing the seq window across the two
    # union branches) was measured SLOWER end-to-end — materializing kills
    # downstream column pruning, which outweighs the duplicated window.
    li = li.withColumn("_seq", F.row_number().over(seq_w))
    max_ln = F.max("l_linenumber").over(Window.partitionBy("l_orderkey", "scn"))

    def env(scn_col):
        cols = [
            scn_col.alias("scn"),
            F.col("l_shipdate").alias("ts"),
            F.lit("lineitem").alias("source"),
            F.lit(3).alias("source_id"),
            (ok % 4).cast("int").alias("part_id"),
            F.lit(None).cast("long").alias("key_num"),
            F.concat_ws(":", ok, ln, F.col("_seq")).alias("key_str"),
        ]
        if with_schema_key:
            from databus_spark.operators.keys import schema_key

            cols.append(
                schema_key(
                    l_orderkey=ok, l_linenumber=ln.cast("bigint"), seq=F.col("_seq")
                ).alias("key_struct")
            )
        return cols

    inserts = li.select(*env(ok + LI_INSERT_BASE), F.lit("UPSERT").alias("opcode"), *LINEITEM_PAYLOAD)
    updates = li.where(ok % 3 == 0).select(
        *env(ok + LI_UPDATE_BASE),
        F.lit("UPSERT").alias("opcode"),
        *[
            (F.col(c) + 1.0).alias(c) if c == "l_quantity" else F.col(c)
            for c in LINEITEM_PAYLOAD
        ],
    )
    log = inserts.unionByName(updates)
    log = log.withColumn("txn_end", ln == max_ln)
    extra = ["key_struct"] if with_schema_key else []
    return _envelope(log, [*extra, *LINEITEM_PAYLOAD])


LINEITEM_CHANGELOG_SQL = f"""
    SELECT scn, ts, opcode, source, source_id, part_id, key_num, key_str,
           l_linenumber = max(l_linenumber)
               OVER (PARTITION BY l_orderkey, scn) AS txn_end,
           l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           l_shipdate
    FROM (
        WITH li_seq AS (
            SELECT *, row_number() OVER (
                PARTITION BY l_orderkey, l_linenumber
                ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice
            ) AS _seq
            FROM lineitem
        )
        SELECT l_orderkey + {LI_INSERT_BASE} AS scn, l_shipdate AS ts,
               'UPSERT' AS opcode, 'lineitem' AS source, 3 AS source_id,
               CAST(l_orderkey % 4 AS INT) AS part_id,
               CAST(NULL AS BIGINT) AS key_num,
               concat(l_orderkey, ':', l_linenumber, ':', _seq) AS key_str,
               l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate
        FROM li_seq
        UNION ALL
        SELECT l_orderkey + {LI_UPDATE_BASE}, l_shipdate, 'UPSERT', 'lineitem', 3,
               CAST(l_orderkey % 4 AS INT), NULL,
               concat(l_orderkey, ':', l_linenumber, ':', _seq),
               l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity + 1.0,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate
        FROM li_seq WHERE l_orderkey % 3 = 0
    )
"""


def multi_source_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope-only union of all changelogs (payload dropped).

    The analog of DbusEventBufferMult streaming the union of per-partition
    buffers (reference: core/DbusEventBufferMult.java:61-121).
    """
    return _staged("multi", spark, sf_dir, lambda: _build_multi(spark, sf_dir))


def _build_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = [
        orders_changelog(spark, sf_dir),
        customer_changelog(spark, sf_dir),
        lineitem_changelog(spark, sf_dir),
    ]
    out = frames[0].select(*ENVELOPE_COLS)
    for f in frames[1:]:
        out = out.unionByName(f.select(*ENVELOPE_COLS))
    return out


MULTI_SOURCE_CHANGELOG_SQL = f"""
    SELECT scn, ts, opcode, source, source_id, part_id, key_num, key_str, txn_end
    FROM ({ORDERS_CHANGELOG_SQL})
    UNION ALL
    SELECT scn, ts, opcode, source, source_id, part_id, key_num, key_str, txn_end
    FROM ({CUSTOMER_CHANGELOG_SQL})
    UNION ALL
    SELECT scn, ts, opcode, source, source_id, part_id, key_num, key_str, txn_end
    FROM ({LINEITEM_CHANGELOG_SQL})
"""


def with_event_metadata(df: DataFrame, origin: str = "relay-1") -> DataFrame:
    """Optional event-level METADATA part, distinct from the payload.

    The reference's DbusEventV2 carries up to three parts — key, payload,
    and an optional metadata part serialized under its own (versioned)
    schema (reference: core/DbusEventPart.java; consumer-visible shape
    tested by databus-client/.../consumer/TestInternalMetadata.java).
    Spark restatement: a typed struct column, populated producer-side;
    consumers read fields with plain column access (metadata.origin ...)
    and Catalyst prunes the struct like any nested column.

    Fields: origin (emitting relay), emit_ts_ms (event-time millis),
    payload_schema_digest (md5 over the source's schema identity — the
    digest the metadata part carries in the reference)."""
    return df.withColumn(
        "metadata",
        F.struct(
            F.lit(origin).alias("origin"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias("emit_ts_ms"),
            F.md5(F.concat_ws("|", F.col("source"), F.col("source_id"))).alias(
                "payload_schema_digest"
            ),
        ),
    )
