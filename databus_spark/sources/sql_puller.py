"""Chunked-scan SQL txlog puller against a REAL SQL database (S1/S2).

Reference parity — the Oracle txlog relay poller:
  event query `scn > lastScn AND scn <= cap ORDER BY scn`
      <- OracleTxlogEventReader.generateEventQuery
         (databus2-relay-impl/.../db/OracleTxlogEventReader.java:613-683)
  chunked scans bounding each pull           <- :683-723
  max-SCN probe                              <- getMaxTxlogSCN (:784-810)
  durable watermark                          <- FileMaxSCNHandler

This module issues those exact query shapes through a DBAPI-style
executor (`sql -> pyarrow.Table`), so any SQL engine with an Arrow
path serves as the transaction-log database — the test suite runs it
against DuckDB, an actual SQL database, closing the "no real SQL
source" gap without a JDBC server in the image.

Chunking is KEYSET + TXN-ATOMIC: each chunk's upper bound is the scn of
the N-th candidate row (`ORDER BY scn LIMIT N` boundary probe), then
the chunk pulls `scn > last AND scn <= boundary` — so a transaction
(all rows of one scn) is never split across chunks, the same window
atomicity the reference's scn-range chunking guarantees.

Scale note: this adapter is the single-relay ingest shape (the driver
is the relay). On a cluster with a JDBC-reachable database, swap the
executor for `spark.read.jdbc(partitionColumn=scn, lowerBound,
upperBound, numPartitions)` — the same predicates become remote WHERE
clauses sharded across executors; the poll/commit protocol here is
unchanged.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from databus_spark.sources.incremental import FileMaxSCNHandler


class SqlTxlogPuller:
    def __init__(
        self,
        spark: SparkSession,
        executor: Callable[[str], Any],  # sql -> pyarrow.Table
        table: str,
        scn_handler: FileMaxSCNHandler,
        scn_col: str = "scn",
        chunk_rows: int = 10_000,
        columns: str = "*",
    ) -> None:
        self.spark = spark
        self.executor = executor
        self.table = table
        self.scn_handler = scn_handler
        self.scn_col = scn_col
        self.chunk_rows = chunk_rows
        self.columns = columns
        self._pending_scn: int | None = None

    # -- probes ---------------------------------------------------------------
    def probe_max_scn(self) -> int:
        t = self.executor(f"SELECT max({self.scn_col}) AS m FROM {self.table}")
        v = t.column("m")[0].as_py()
        return -1 if v is None else int(v)

    def _chunk_boundary(self, last: int) -> int | None:
        """scn of the chunk_rows-th candidate row — the txn-atomic upper
        bound of the next chunk (keyset probe, no OFFSET scans)."""
        t = self.executor(
            f"SELECT max({self.scn_col}) AS b FROM ("
            f"SELECT {self.scn_col} FROM {self.table} "
            f"WHERE {self.scn_col} > {int(last)} "
            f"ORDER BY {self.scn_col} LIMIT {int(self.chunk_rows)})"
        )
        v = t.column("b")[0].as_py()
        return None if v is None else int(v)

    # -- pulls ----------------------------------------------------------------
    def poll(self) -> DataFrame | None:
        """One chunk: last < scn <= boundary, whole transactions only.
        Watermark advances on commit() AFTER the downstream sink lands
        the chunk (crash -> re-poll replays it: at-least-once, and the
        idempotent MERGE store makes it exactly-once)."""
        last = self.scn_handler.read()
        boundary = self._chunk_boundary(last)
        if boundary is None:
            return None
        arrow = self.executor(
            f"SELECT {self.columns} FROM {self.table} "
            f"WHERE {self.scn_col} > {int(last)} AND {self.scn_col} <= {int(boundary)} "
            f"ORDER BY {self.scn_col}"
        )
        self._pending_scn = boundary
        # Arrow-native path: pandas round-trip would promote nullable int
        # columns to float64 and lose the exact dtypes the MERGE store keys on.
        return self.spark.createDataFrame(arrow)

    def commit(self) -> None:
        if self._pending_scn is not None:
            self.scn_handler.write(self._pending_scn)
            self._pending_scn = None

    def drain(self, sink: Callable[[DataFrame], None]) -> int:
        cycles = 0
        while True:
            batch = self.poll()
            if batch is None:
                return cycles
            sink(batch)
            self.commit()
            cycles += 1


def duckdb_executor(con) -> Callable[[str], Any]:
    """Executor over a DuckDB connection (the test/dev database)."""

    def run(sql: str):
        return con.execute(sql).arrow()

    return run
