"""Join operators Spark lacks natively, built from DataFrame primitives.

as_of_join: for each left row, the latest right row with the same key
and right.ts <= left.ts — the CDC workhorse ("state as of event time";
the reference's consumers hand-roll this against bootstrap snapshots).
Implemented as union + last-value window: ONE shuffle on the key, no
range cross product, no per-group Python. DuckDB's native ASOF JOIN is
the correctness oracle.

Scale: the window partitions by key — co-partitioned with the shuffle,
skew bounded by per-key version counts. For billion-row sides with few
versions per key, this beats bucketized range joins (no fan-out) and
pd.merge_asof (no Python crossing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    ts_col: str = "ts",
    right_value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Left as-of join: latest right values with right.ts <= left.ts.

    Left rows with no prior right row keep NULL right values.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (*keys, ts_col)]

    # the whole right row travels as ONE struct so the as-of fill is
    # row-atomic (per-column fills would mix versions when right values
    # contain legitimate NULLs)
    r_struct = F.struct(
        F.col(ts_col).alias("right_ts"),
        *[F.col(c).alias(f"right_{c}") for c in right_value_cols],
    )
    r_tag = right.select(
        *keys, F.col(ts_col).alias("_ts"), F.lit(0).alias("_is_left"),
        r_struct.alias("_r"),
    )
    l_tag = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_tag.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
    )
    r_tag = r_tag.withColumn("_left", F.lit(None).cast(l_tag.schema["_left"].dataType))
    # right rows sort BEFORE left rows at equal ts -> right.ts <= left.ts inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tag.unionByName(r_tag).withColumn(
        "_f", F.last(F.col("_r"), ignorenulls=True).over(w)
    )
    return filled.where(F.col("_is_left") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_f.right_{c}").alias(f"right_{c}") for c in right_value_cols],
        F.col("_f.right_ts").alias("right_ts"),
    )
