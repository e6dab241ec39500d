"""S1/S2: chunked-scan SQL txlog puller against DuckDB — a real SQL
database standing in for the Oracle txlog."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from databus_spark.envelope import ORDERS_CHANGELOG_SQL
from databus_spark.sources.incremental import FileMaxSCNHandler
from databus_spark.sources.sql_puller import SqlTxlogPuller, duckdb_executor


def _txlog_db(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    con.execute(f"CREATE TABLE txlog AS SELECT * FROM ({ORDERS_CHANGELOG_SQL})")
    return con


def test_chunked_pull_is_txn_atomic_and_complete(spark, sf_dir, tmp_path):
    con = _txlog_db(sf_dir)
    n_total = con.execute("SELECT count(*) FROM txlog").fetchone()[0]

    puller = SqlTxlogPuller(
        spark,
        duckdb_executor(con),
        "txlog",
        FileMaxSCNHandler(str(tmp_path / "scn.json")),
        chunk_rows=400,
    )
    assert puller.probe_max_scn() == con.execute("SELECT max(scn) FROM txlog").fetchone()[0]

    chunks = []
    cycles = puller.drain(lambda b: chunks.append(b.localCheckpoint(eager=True)))
    assert cycles >= 3  # chunking actually chunked
    assert sum(c.count() for c in chunks) == n_total

    # txn atomicity: an scn never spans two chunks
    seen_scns = set()
    for c in chunks:
        scns = {r["scn"] for r in c.select("scn").distinct().collect()}
        assert not (scns & seen_scns), "transaction split across chunks"
        seen_scns |= scns

    # chunks are bounded: row count can only exceed chunk_rows by the
    # final transaction's spillover (scn-boundary snap)
    max_txn = con.execute(
        "SELECT max(n) FROM (SELECT count(*) AS n FROM txlog GROUP BY scn)"
    ).fetchone()[0]
    for c in chunks:
        assert c.count() <= 400 + max_txn

    # union equals the database's log exactly
    union = chunks[0]
    for c in chunks[1:]:
        union = union.unionByName(c)
    assert union.select("scn", "key_str").distinct().count() == n_total


def test_pull_resumes_from_watermark_after_crash(spark, sf_dir, tmp_path):
    con = _txlog_db(sf_dir)
    handler = FileMaxSCNHandler(str(tmp_path / "scn.json"))
    puller = SqlTxlogPuller(
        spark, duckdb_executor(con), "txlog", handler, chunk_rows=1000
    )

    b1 = puller.poll()
    n1 = b1.count()
    # crash BEFORE commit: the same chunk replays (at-least-once)
    b1_again = puller.poll()
    assert b1_again.count() == n1
    puller.commit()

    # after commit the next chunk starts strictly past the watermark
    b2 = puller.poll()
    assert b2.agg(F.min("scn")).collect()[0][0] > handler.read() - 1
    assert b2.agg(F.min("scn")).collect()[0][0] > b1.agg(F.max("scn")).collect()[0][0]

    # new rows arriving in the DB are picked up incrementally
    puller.commit()
    head = puller.probe_max_scn()
    con.execute(
        f"INSERT INTO txlog SELECT scn + {head + 100}, ts, opcode, source, source_id,"
        " part_id, key_num, key_str, txn_end, o_orderkey, o_custkey, o_orderstatus,"
        " o_totalprice, o_orderdate, o_orderpriority FROM txlog LIMIT 5"
    )
    puller.drain(lambda b: None)
    tail = puller.poll()
    assert tail is None  # fully caught up
    assert handler.read() == puller.probe_max_scn()
