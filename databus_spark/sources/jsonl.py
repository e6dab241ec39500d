"""JSONL corpus ingestion with corrupt-record quarantine.

Crawl dumps and vendor corpora arrive as JSON-lines; at 100 TB a
fraction of lines is always torn, truncated, or shape-violating, and
the difference between "clean ingest" and "silent data loss" is whether
those lines are QUARANTINED with provenance or just dropped.

Shape: one `spark.read.json` pass in PERMISSIVE mode with an explicit
schema (never schema inference — a second full scan at corpus scale)
plus the `_corrupt_record` escape column. The reader splits the result
into (clean, quarantine): clean rows drop the audit column; quarantine
rows keep the raw line and its source file for reprocessing — the same
audit stance as the trail parser's corrupt-line accounting
(sources/trail.py parse_health) and the CDC source's on_corrupt policy.

Beyond JSON validity, `require` enforces semantic shape (non-null
doc_id/text): a syntactically-valid record missing required fields
quarantines too, with reason='shape' instead of reason='json'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_DDL = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    ddl: str = DOCUMENTS_DDL,
    require: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, quarantine).

    clean: rows parsing to the schema with all `require` fields non-null.
    quarantine: (source_file, reason, raw) — reason 'json' for
    unparseable lines, 'shape' for parsed rows violating `require`.
    """
    raw = (
        spark.read.schema(f"{ddl}, {CORRUPT_COL} STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .withColumn("_file", F.input_file_name())
    )
    is_json_bad = F.col(CORRUPT_COL).isNotNull()
    shape_bad = F.lit(False)
    for c in require:
        shape_bad = shape_bad | F.col(c).isNull()

    clean = raw.where(~is_json_bad & ~shape_bad).drop(CORRUPT_COL, "_file")
    quarantine = raw.where(is_json_bad | shape_bad).select(
        F.col("_file").alias("source_file"),
        F.when(is_json_bad, F.lit("json")).otherwise(F.lit("shape")).alias("reason"),
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(*[c.strip().split()[0] for c in ddl.split(",")]))).alias("raw"),
    )
    return clean, quarantine
