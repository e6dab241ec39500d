"""REAL JDBC txlog puller (S1/S2, the `spark.read.jdbc` ingest path).

`SqlTxlogPuller` proves the reference's SQL shapes against DuckDB via
an Arrow executor; this module runs the SAME poll/commit protocol
through Spark's actual JDBC source — executor-side partitioned range
scans (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`),
exactly how a cluster would drain a JDBC-reachable transaction log
(reference: OracleTxlogEventReader.generateEventQuery,
databus2-relay-impl/.../db/OracleTxlogEventReader.java:613-723;
max-SCN probe :784-810).

The test database is embedded Apache Derby — the JDBC engine Spark
already ships for its Hive metastore — seeded through `df.write.jdbc`
(also the real JDBC write path). No extra jars, no network listener;
on a cluster only the URL changes.

Chunking is keyset + txn-atomic, identical to SqlTxlogPuller: the
boundary probe takes the scn of the chunk_rows-th candidate row
(`ORDER BY scn FETCH FIRST n ROWS ONLY` — Derby has no LIMIT), and
the pull reads `scn > last AND scn <= boundary`, so all rows of one
transaction always travel in one chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databus_spark.sources.incremental import FileMaxSCNHandler

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


class JdbcTxlogPuller:
    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        scn_handler: FileMaxSCNHandler,
        scn_col: str = "scn",
        chunk_rows: int = 10_000,
        columns: str = "*",
        driver: str = DERBY_DRIVER,
        n_partitions: int = 4,
    ) -> None:
        self.spark = spark
        self.url = url
        self.table = table
        self.scn_handler = scn_handler
        self.scn_col = scn_col
        self.chunk_rows = chunk_rows
        self.columns = columns
        self.driver = driver
        self.n_partitions = n_partitions
        self._pending_scn: int | None = None

    # -- plumbing -------------------------------------------------------------
    def _read_query(self, query: str) -> DataFrame:
        """One JDBC query as a single-partition read (probes only —
        the event pull below uses the partitioned form)."""
        return (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("driver", self.driver)
            .option("dbtable", f"({query}) probe")
            .load()
        )

    # -- probes ---------------------------------------------------------------
    @property
    def _qscn(self) -> str:
        # Spark's JDBC writer creates columns QUOTED (case-sensitive in
        # Derby), so hand-written SQL must quote them the same way.
        return f'"{self.scn_col}"'

    def probe_max_scn(self) -> int:
        df = self._read_query(
            f"SELECT max({self._qscn}) AS m FROM {self.table}"
        )
        v = df.collect()[0][0]
        return -1 if v is None else int(v)

    def _chunk_boundary(self, last: int) -> int | None:
        """scn of the chunk_rows-th candidate row — txn-atomic upper
        bound (keyset probe; FETCH FIRST is Derby/ANSI LIMIT)."""
        df = self._read_query(
            f"SELECT max(s) AS b FROM ("
            f"SELECT {self._qscn} AS s FROM {self.table} "
            f"WHERE {self._qscn} > {int(last)} "
            f"ORDER BY {self._qscn} "
            f"FETCH FIRST {int(self.chunk_rows)} ROWS ONLY) cand"
        )
        v = df.collect()[0][0]
        return None if v is None else int(v)

    # -- pulls ----------------------------------------------------------------
    def poll(self) -> DataFrame | None:
        """One chunk as a PARTITIONED JDBC read: Spark plans
        n_partitions range slices of (last, boundary] and each executor
        issues its own remote WHERE-clause scan — the cluster ingest
        shape the reference's single-threaded poller cannot do."""
        last = self.scn_handler.read()
        boundary = self._chunk_boundary(last)
        if boundary is None:
            return None
        df = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("driver", self.driver)
            .option(
                "dbtable",
                f"(SELECT {self.columns} FROM {self.table} "
                f"WHERE {self._qscn} > {int(last)} "
                f"AND {self._qscn} <= {int(boundary)}) chunk",
            )
            .option("partitionColumn", self.scn_col)
            .option("lowerBound", int(last) + 1)
            .option("upperBound", int(boundary) + 1)
            .option("numPartitions", self.n_partitions)
            .load()
        )
        self._pending_scn = boundary
        return df

    def commit(self) -> None:
        if self._pending_scn is not None:
            self.scn_handler.write(self._pending_scn)
            self._pending_scn = None

    def drain(self, sink) -> int:
        """At-least-once chunk loop; commit only after the sink lands."""
        cycles = 0
        while True:
            batch = self.poll()
            if batch is None:
                return cycles
            sink(batch)
            self.commit()
            cycles += 1


def seed_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    index_col: str | None = "scn",
) -> None:
    """Seed the txlog database through Spark's real JDBC WRITE path
    (executor-side batched INSERTs; Derby creates the table), then
    index the SCN column — the range scans the puller issues must be
    index scans, not per-chunk full table scans (the reference's txlog
    table is likewise SCN-indexed)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("driver", driver)
        .option("dbtable", table)
        .mode("overwrite")
        .save()
    )
    if index_col is not None:
        jvm = df.sparkSession._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            stmt = conn.createStatement()
            # Spark's JDBC writer creates quoted (case-sensitive) columns
            stmt.execute(f'CREATE INDEX {table}_scn_idx ON {table} ("{index_col}")')
            stmt.close()
        finally:
            conn.close()
