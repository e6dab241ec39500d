"""Bootstrap: snapshot + catchup for consumers that fell off the stream.

Reference protocol: a consumer whose checkpoint SCN is no longer in the
relay buffer bootstraps — phase 1 serves the compacted snapshot table
(rows with scn < startSCN), phase 2 replays the change log over
(startSCN, targetSCN], then the client resumes online consumption
(reference: databus-bootstrap-server/.../BootstrapProcessor.java:214-273,
core/BootstrapCheckpointHandler.java:161-215, snapshot/catchup SQL with
keyset paging `order by id limit ?` at BootstrapProcessor.java:239,271).

Spark restatement: both phases are one declarative plan —
    snapshot_rows (scn <= start) UNION ALL log_window (start < scn <= target)
    -> latest-per-key -> drop tombstones
which yields exactly the state at targetSCN. The union+dedup gives the
same at-least-once-then-exact semantics as the reference's phase pair;
Catalyst prunes both scans by the scn predicates (parquet min/max
skipping stands in for the reference's ScnIndex, core/ScnIndex.java:42-96).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from databus_spark.operators.compaction import latest_by_key


def bootstrap_state(
    log: DataFrame,
    start_scn: int,
    target_scn: int,
    key_cols: Sequence[str] = ("source", "key_str"),
) -> DataFrame:
    """State at target_scn via snapshot(<=start) ∪ catchup((start, target]).

    Both phases read the SAME changelog here, and their scn windows
    partition (-inf, target], so the union fuses into ONE pruned scan
    with an OR predicate — a unionByName of two filters over one source
    would scan it twice (Catalyst does not merge union branches).
    When the phases come from physically different sources (a compacted
    snapshot table + a live log, the reference's layout), build each
    side separately and unionByName them before latest_by_key — the
    dedup handles any overlap either way.
    """
    snapshot_phase = F.col("scn") <= start_scn
    catchup_phase = (F.col("scn") > start_scn) & (F.col("scn") <= target_scn)
    merged = log.where(snapshot_phase | catchup_phase)
    return latest_by_key(merged, key_cols).where(F.col("opcode") != "DELETE")


def bootstrap_oracle_sql(
    changelog_sql: str,
    start_scn: int,
    target_scn: int,
    key_cols: Sequence[str] = ("source", "key_str"),
    out_cols: str = "*",
) -> str:
    """DuckDB oracle: direct compaction at scn <= target (provably equal)."""
    keys = ", ".join(key_cols)
    return f"""
        SELECT {out_cols}
        FROM (
            SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY scn DESC) AS _rn
            FROM ({changelog_sql})
            WHERE scn <= {target_scn}
        )
        WHERE _rn = 1 AND opcode <> 'DELETE'
    """


def keyset_page(
    log: DataFrame, after: int, limit: int, id_col: str = "scn"
) -> DataFrame:
    """One keyset-paged chunk: WHERE id > ? ORDER BY id LIMIT ?.

    The reference pages snapshot/catchup serving this way
    (BootstrapProcessor.java:239,271). TopK by id is a Spark
    TakeOrderedAndProject — no full sort, no full shuffle.
    """
    return log.where(F.col(id_col) > after).orderBy(id_col).limit(limit)
