"""Size-gated broadcast: measure the side, then hint.

Catalyst's static size estimates are wrong in exactly the places this
engine hand-pins join sides (post-explode streams inherit their parquet
scan's estimate; aggregate outputs are unknown), so several operators
carry an explicit ``F.broadcast()``. But an UNCONDITIONAL hint is its
own scale hazard: the hinted side is collected and replicated to every
executor whatever its size turns out to be — e.g. ExactSubstr's cut
table is one row per doc-with-removable-spans, which on duplicate-heavy
corpora is ~every doc (the x100 rotation soak measured ~99% of windows
removable), i.e. a corpus-proportional broadcast and an OOM at the
100 TB target.

``gated_broadcast`` closes that class without adding a job: the side is
materialized once (``localCheckpoint``) with the row count riding the
SAME job via ``Observation`` (the star-signature pattern — metrics are
collected while the checkpoint job runs), and the hint is chosen from
the MEASURED count. The checkpointed blocks feed the downstream join
either way, so the measurement costs nothing beyond a materialization
the broadcast build would have paid anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def measure_under_cap(df: DataFrame, cap_rows: int) -> tuple[DataFrame, bool]:
    """Materialize ``df`` once and return ``(checkpointed_df, fits)``
    where ``fits`` is row_count <= cap_rows — for callers that join
    several PROJECTIONS of the same side and want one measurement to
    decide every hint (lm2's three unigram-table joins)."""
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    return df, int(obs.get["n"]) <= cap_rows


def gated_broadcast(
    df: DataFrame, cap_rows: int, broadcast: bool | None = None
) -> DataFrame:
    """Return ``df`` hinted for its measured size: ``F.broadcast`` when
    its row count is <= ``cap_rows``, else a sort-merge hint (the safe
    any-size join; a shuffle both sides pay, never a single-node
    HashedRelation build).

    ``broadcast`` forces the decision without measuring (True/False) —
    the escape hatch for callers that already know the side's bound
    (e.g. a 128-row centroid table) or a fixture that wants the big-side
    plan pinned. ``None`` (default) measures.
    """
    if broadcast is None:
        df, broadcast = measure_under_cap(df, cap_rows)
    return F.broadcast(df) if broadcast else df.hint("merge")


def widen_scan(df: DataFrame) -> DataFrame:
    """Input-parallelism guard for CPU-heavy per-row operators (guide
    §2.5 "input skew: one huge unsplittable file ... repartition
    immediately after the read").

    The fixture tables are single-file single-row-group parquet, so a
    bare scan is ONE task — and every per-row text/vector stage fused
    onto it (tokenize, n-gram build, marker filters, window hashing,
    quantization) runs serial on a 32-core box. Measured at sf0.1
    (best-of-2, otherwise-idle): v1 curation 3.92 s -> 1.13 s,
    decontaminate 3.93 s -> 0.80 s, fingerprint 2.98 s -> 0.42 s,
    repetition profile 2.36 s -> 0.73 s from a 32-way round-robin
    repartition directly above the scan.

    Width: min(defaultParallelism, 8), NOT full core count — every
    extra map task multiplies the DOWNSTREAM shuffles' block count
    (M x R, guide §2.2), and the composite pipelines (curation v3 /
    release_gate, ~50 exchanges) measurably pay it in shuffle-write
    time (node metrics: 18.4 s total shuffle write at W=32 on one
    exchange). Fresh-JVM width matrix at sf0.1 (best-of-2 each):
    v1 1.34/1.23/1.35, curation_v3 5.32/5.66/5.73, release_gate
    5.40/5.75/6.12 for W=8/16/32 — W=8 keeps ~all of the compute
    spread while bounding block growth.

    Scale behavior: a no-op whenever the input already has >= W
    partitions — the 100 TB case, where scans arrive in thousands of
    splits and an unconditional repartition would be a full shuffle of
    the corpus for nothing. The round-robin exchange it inserts at
    fixture scale moves <1 MB.
    """
    sc = df.sparkSession.sparkContext
    par = min(sc.defaultParallelism, 8)
    try:
        if df.rdd.getNumPartitions() >= par:
            return df
    except Exception:
        return df
    return df.repartition(par)
