"""Changelog compaction: latest-row-per-key, the heart of the bootstrap applier.

The reference maintains snapshot tables by replaying the change log with
``INSERT ... ON DUPLICATE KEY UPDATE`` — last writer (highest SCN) wins
per key (reference: databus-bootstrap-producer/.../BootstrapApplierThread.java:850;
intra-txn merge: databus2-relay-impl/.../producers/gg/DBUpdatesMergeUtils.java).

Two physical strategies, both shuffle exactly once on the key:

* ``latest_by_key`` — groupBy(key).agg(max_by(struct(*), scn)): partial
  aggregation runs map-side (combiner), so at 100 TB the shuffle carries
  one row per key per input partition, not the whole log. Preferred.
* ``latest_by_key_window`` — row_number() over (partition by key order
  by scn desc) = 1: no map-side combine, but keeps ties deterministic
  and supports returning ALL columns without struct packing. Used where
  tie-break semantics matter.

SCNs are unique per key in this engine (event windows are totally
ordered per partition), so both agree.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_by_key(
    log: DataFrame, key_cols: Sequence[str] = ("source", "key_str"), order_col: str = "scn"
) -> DataFrame:
    """Latest event per key via max_by — map-side combinable."""
    others = [c for c in log.columns if c not in key_cols]
    packed = log.groupBy(*key_cols).agg(
        F.max_by(F.struct(*others), F.col(order_col)).alias("_latest")
    )
    return packed.select(*key_cols, *[F.col(f"_latest.{c}").alias(c) for c in others])


def latest_by_key_window(
    log: DataFrame, key_cols: Sequence[str] = ("source", "key_str"), order_col: str = "scn"
) -> DataFrame:
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(F.desc(order_col))
    return (
        log.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def snapshot(
    log: DataFrame,
    key_cols: Sequence[str] = ("source", "key_str"),
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Reconstruct the current table state from a change log.

    Latest event per key, tombstones (DELETE) removed — exactly what the
    reference's applier leaves in ``tab_<srcid>``.
    """
    latest = latest_by_key(log, key_cols)
    live = latest.where(F.col("opcode") != "DELETE")
    if payload_cols is not None:
        live = live.select(*key_cols, "scn", *payload_cols)
    return live


def snapshot_oracle_sql(
    changelog_sql: str,
    key_cols: Sequence[str] = ("source", "key_str"),
    payload_cols: Sequence[str] | None = None,
) -> str:
    """DuckDB oracle for ``snapshot`` over a changelog CTE body."""
    keys = ", ".join(key_cols)
    cols = f"{keys}, scn" + ("" if payload_cols is None else ", " + ", ".join(payload_cols))
    return f"""
        SELECT {cols}
        FROM (
            SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY scn DESC) AS _rn
            FROM ({changelog_sql})
        )
        WHERE _rn = 1 AND opcode <> 'DELETE'
    """
