"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

Beyond-reference capability. The reference serves single-key streams,
so physical order = SCN order is enough; an analytics corpus at 100 TB
is queried along SEVERAL axes at once (user AND time, source AND key
range). Parquet scan pruning is driven by per-file/row-group min-max
stats, which only help along the sort order — sorting by `a` destroys
locality in `b`. Z-ordering interleaves the bits of both keys so that
files hold compact ranges in EVERY interleaved dimension: a predicate
on either axis (or both) overlaps a small fraction of files, and the
engine's ordinary min-max skipping does the rest. (The same layout
trick Delta/Iceberg expose as OPTIMIZE ZORDER BY — restated here as a
plain column + repartitionByRange write, no table format required.)

Determinism: the z-key is pure integer bit math (no floats, no RNG), so
the DuckDB oracle reproduces it exactly.

Scale shape: computing the key is map-side; laying out the table is ONE
range shuffle (repartitionByRange on the z-key) — the same cost as any
sorted write — after which every multi-dim slice query is pruned at the
scan. Re-clustering after appends is incremental: only files whose
z-range overlaps the new data need rewriting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per dimension (32-bit z-key for 2 dims)
ZB_BITS = 8  # bucket bits per dimension after min-max normalization


def minmax_bucket(c: Column, cmin: Column, cmax: Column, bits: int = ZB_BITS) -> Column:
    """Normalize a dimension into [0, 2^bits) by min-max scaling:
    floor((x - min) * 2^bits / (max - min + 1)). REQUIRED before
    interleaving: raw dimensions of different magnitudes (user ids vs
    epoch hours) would otherwise let the wider one own all the high
    z bits and the narrower one contribute nothing to file layout.
    The numerator stays far below 2^53, so the double division is exact
    and floor() agrees across engines."""
    span = (cmax - cmin + F.lit(1)).cast("double")
    return F.floor((c - cmin).cast("double") * (1 << bits) / span).cast("long")


def minmax_bucket_sql(c: str, cmin: str, cmax: str, bits: int = ZB_BITS) -> str:
    return (
        f"CAST(floor(CAST(({c}) - ({cmin}) AS DOUBLE) * {1 << bits}"
        f" / CAST(({cmax}) - ({cmin}) + 1 AS DOUBLE)) AS BIGINT)"
    )


def zorder_key(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave the low `bits` of two non-negative int columns:
    bit i of x lands at position 2i, bit i of y at 2i+1. Values are
    masked into range first (callers normally pass pre-bucketed
    dimensions, e.g. pmod(hash(user), 2^16) and a time bucket).
    """
    xm = F.pmod(x.cast("long"), F.lit(1 << bits))
    ym = F.pmod(y.cast("long"), F.lit(1 << bits))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of zorder_key (same masked bit interleave)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) % {1 << bits}) >> {i} & 1) * {1 << (2 * i)}")
        terms.append(f"((({y}) % {1 << bits}) >> {i} & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, n_files: int = 32, bits: int = ZB_BITS
) -> DataFrame:
    """Cluster `df` for multi-dim pruning: min-max-bucket both
    dimensions (one tiny agg, broadcast back), interleave, then ONE
    range shuffle so each output partition (= output file on write)
    covers a compact, disjoint z-range — and therefore a compact
    rectangle-ish region in (x, y) space. Write with .write.parquet()
    as usual; the min-max stats parquet already keeps per
    file/row-group make every x-slice, y-slice, or box query skip
    non-overlapping files.
    """
    mm = df.agg(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    keyed = df.crossJoin(F.broadcast(mm)).withColumn(
        "z",
        zorder_key(
            minmax_bucket(F.col(x_col), F.col("_xmin"), F.col("_xmax"), bits),
            minmax_bucket(F.col(y_col), F.col("_ymin"), F.col("_ymax"), bits),
            bits,
        ),
    ).drop("_xmin", "_xmax", "_ymin", "_ymax")
    return keyed.repartitionByRange(n_files, "z").sortWithinPartitions("z")
