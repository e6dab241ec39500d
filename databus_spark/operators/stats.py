"""Event-stream statistics — the engine's DbusEventsStatisticsCollector.

The reference tracks per-source/per-peer event counts, byte sizes,
min/max SCN and time lags in mergeable JMX collectors
(reference: databus-core-impl/.../core/monitoring/mbean/DbusEventsTotalStats.java,
AggregatedDbusEventsTotalStats.java), consumer-lag percentiles in a
mergeable decaying reservoir (databus-client-api/.../UnifiedClientStats.java:283-300),
and bucketed int histograms (core/monitoring/HistogramBasedIntStats.java).

Spark restatement: plain aggregations — partial/final merge is Spark's
native two-phase aggregation, so the "mergeable collector" property is
free; percentiles use the exact `percentile` aggregate (the approximate
variant is `percentile_approx` when 100 TB demands it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_source_stats(log: DataFrame) -> DataFrame:
    """A2/A3 analog: counts, scn span, key cardinality, tombstones per source."""
    return log.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("scn").alias("min_scn"),
        F.max("scn").alias("max_scn"),
        F.countDistinct("key_str").alias("n_keys"),
        F.sum(F.when(F.col("opcode") == "DELETE", 1).otherwise(0)).alias("n_deletes"),
        F.sum(F.length("key_str")).alias("key_bytes"),
    )


PER_SOURCE_STATS_SQL = """
    SELECT source,
           count(*) AS n_events,
           min(scn) AS min_scn,
           max(scn) AS max_scn,
           count(DISTINCT key_str) AS n_keys,
           CAST(sum(CASE WHEN opcode = 'DELETE' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
           CAST(sum(length(key_str)) AS BIGINT) AS key_bytes
    FROM ({changelog}) GROUP BY source
"""


def lag_percentiles(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """A4 analog: p50/p90/p95/p99 of event lag vs the stream head (seconds).

    Exact interpolated percentiles (matches DuckDB quantile_cont); at
    cluster scale swap percentile -> percentile_approx, which is the
    true analog of the reference's decaying-reservoir estimate.
    """
    head = events.agg(F.max(ts_col).alias("_head"))
    lagged = events.crossJoin(F.broadcast(head)).select(
        (F.col("_head").cast("double") - F.col(ts_col).cast("double")).alias("lag_s")
    )
    return lagged.agg(
        *[
            F.round(F.percentile("lag_s", q), 4).alias(f"p{int(q * 100)}")
            for q in (0.5, 0.9, 0.95, 0.99)
        ]
    )


LAG_PERCENTILES_SQL = """
    SELECT round(quantile_cont(lag_s, 0.50), 4) AS p50,
           round(quantile_cont(lag_s, 0.90), 4) AS p90,
           round(quantile_cont(lag_s, 0.95), 4) AS p95,
           round(quantile_cont(lag_s, 0.99), 4) AS p99
    FROM (
        SELECT epoch(max({ts}) OVER ()) - epoch({ts}) AS lag_s FROM {table}
    )
"""


def value_histogram(events: DataFrame, col: str = "value", width: float = 10.0) -> DataFrame:
    """A5 analog: fixed-width bucket histogram of a numeric column."""
    bucket = F.floor(F.col(col) / F.lit(width)).cast("long").alias("bucket")
    return (
        events.select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


VALUE_HISTOGRAM_SQL = """
    SELECT CAST(floor({col} / {width}) AS BIGINT) AS bucket, count(*) AS n
    FROM {table} GROUP BY 1
"""


def txn_window_stats(log: DataFrame) -> DataFrame:
    """Event-window accounting (A7): rows and end-markers per scn window,
    then windows-per-size histogram (how many txns have k rows)."""
    per_window = log.groupBy("source", "scn").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("txn_end"), 1).otherwise(0)).alias("n_end_markers"),
    )
    return per_window.groupBy("source", "n_rows").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("n_end_markers").alias("n_end_markers"),
    )


TXN_WINDOW_STATS_SQL = """
    SELECT source, n_rows, count(*) AS n_windows,
           CAST(sum(n_end_markers) AS BIGINT) AS n_end_markers
    FROM (
        SELECT source, scn, count(*) AS n_rows,
               sum(CASE WHEN txn_end THEN 1 ELSE 0 END) AS n_end_markers
        FROM ({changelog}) GROUP BY source, scn
    ) GROUP BY source, n_rows
"""


def event_rate_anomaly(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-(event_type, hour) volume anomalies: z-score of each hourly
    count against that type's own mean/stddev, |z| >= 2 flagged.

    The monitoring-side complement of the stats collectors: the
    reference surfaces raw rates over JMX and leaves anomaly detection
    to external tooling; here it is one plan — two aggregations (hourly
    counts, then per-type moments) joined back, all map-side-combinable.
    Cross-engine determinism: population stddev, z rounded to 4dp, and
    integer hour buckets (epoch//3600) rather than engine-specific
    date_trunc output types.
    """
    hours = events.select(
        "event_type",
        (F.unix_timestamp(ts_col) / 3600).cast("bigint").alias("hour_bucket"),
    )
    hourly = hours.groupBy("event_type", "hour_bucket").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    moments = hourly.groupBy("event_type").agg(
        F.avg("n_events").alias("mean_n"),
        F.stddev_pop("n_events").alias("sd_n"),
    )
    z = F.round(
        (F.col("n_events") - F.col("mean_n"))
        / F.when(F.col("sd_n") > 0, F.col("sd_n")),
        4,
    )
    return (
        hourly.join(moments, "event_type")
        .select(
            "event_type",
            "hour_bucket",
            "n_events",
            z.alias("z_score"),
        )
        .where(F.abs(F.col("z_score")) >= 2.0)
    )


EVENT_RATE_ANOMALY_SQL_TEMPLATE = """
    WITH hourly AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
               count(*) AS n_events
        FROM ({from_sql})
        GROUP BY 1, 2
    ),
    moments AS (
        SELECT event_type, avg(n_events) AS mean_n, stddev_pop(n_events) AS sd_n
        FROM hourly GROUP BY 1
    )
    SELECT event_type, hour_bucket, n_events,
           round((n_events - mean_n) / (CASE WHEN sd_n > 0 THEN sd_n END), 4) AS z_score
    FROM hourly JOIN moments USING (event_type)
    WHERE abs(round((n_events - mean_n) / (CASE WHEN sd_n > 0 THEN sd_n END), 4)) >= 2.0
"""


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Shuffle-skew diagnostics: the top-k heaviest keys of a column
    with each key's share of the table and its ratio to the mean key
    population — the number that says whether a join/agg on this key
    needs salting or AQE skew handling before you run it at 100 TB.

    One agg shuffle on the key (map-side combined), then a distributed
    TakeOrdered for the top-k (never a global sort) against broadcast
    scalar totals. Deterministic ties: count DESC, key ASC with NULLS
    LAST — asc_nulls_last, because Spark's asc sorts NULL first while
    the DuckDB oracle's ORDER BY key ASC sorts it last; a NULL key
    tied at the top_k boundary would otherwise pick different rows.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc_nulls_last("key")).limit(top_k)
    return top.crossJoin(F.broadcast(totals)).select(
        "key",
        "n_rows",
        F.round(F.col("n_rows").cast("double") / F.col("_total").cast("double"), 6)
        .alias("share"),
        F.round(
            F.col("n_rows").cast("double")
            / (F.col("_total").cast("double") / F.col("_n_keys").cast("double")),
            4,
        ).alias("skew_ratio"),
    )


def key_skew_profile_sql(from_sql: str, key_col: str, top_k: int = 20) -> str:
    return f"""
        WITH counts AS (
            SELECT CAST({key_col} AS VARCHAR) AS key, count(*) AS n_rows
            FROM ({from_sql}) GROUP BY 1
        ),
        totals AS (SELECT sum(n_rows) AS total, count(*) AS n_keys FROM counts)
        SELECT key, n_rows,
               round(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
               round(CAST(n_rows AS DOUBLE)
                     / (CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE)), 4)
                   AS skew_ratio
        FROM (SELECT key, n_rows FROM counts
              ORDER BY n_rows DESC, key ASC LIMIT {top_k})
        CROSS JOIN totals
    """


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch — deterministic and oracle-exact
# ---------------------------------------------------------------------------
# Spark's approx_count_distinct is a black-box HLL++ no other engine can
# reproduce bit-for-bit, so it can only ever get a rows-only check. This
# is the engine's own HLL built from the portable md5 hash family both
# engines share: the SKETCH ITSELF is deterministic, so the estimate —
# including its error — is oracle-checkable to the last bit.
#
# Determinism engineering:
# * register index = low HLL_P bits of the 60-bit portable hash; the
#   rank input w = the remaining 52 bits; rho(w) = 53 - bit_length(w)
#   (rho(0) = 53), all integer ops.
# * the harmonic sum is kept EXACT: sum of 2^(53 - rho) as DECIMAL(38,0)
#   (every term is an integer because rho <= 53), with absent registers
#   contributing 2^53 each — no float summation order anywhere.
# * alpha * m^2 * 2^53 is precomputed HERE and embedded as one double
#   literal in both engines; the estimate is a single IEEE division by
#   the (exact) scaled sum. The small-range linear-counting branch uses
#   ln(m/zeros) — one transcendental on integer inputs, same class of
#   cross-engine determinism as lm_quality_score's log().
#
# 100 TB shape: ONE shuffle keyed (group, register) — at most m=256
# rows per group survive the map-side partial max — then a per-group
# fold of 256 registers. This is exactly why HLL exists: the distinct
# count of a 100 TB column flows through kilobytes.

HLL_P = 8
HLL_M = 1 << HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_NUMER = repr(_HLL_ALPHA * HLL_M * HLL_M * float(1 << 53))  # exact literal


def hll_registers(df: DataFrame, key_col: str, group_col: str) -> DataFrame:
    """(grp, b, r): the per-group HLL register state — the MERGEABLE
    sketch. Merging sketches of any partition of the data is a plain
    ``groupBy(grp, b).max(r)`` (register-wise max is associative,
    commutative and idempotent), which is also exactly what a partial
    aggregate does map-side — mergeability of the reference's stats
    collectors (A2/A3) falls out of Spark's two-phase aggregation, and
    the same property makes the sketch streamable (max-merge per
    micro-batch) and unionable across corpora without rescanning."""
    from databus_spark.functions.hashes import portable_hash64

    h = portable_hash64(F.col(key_col).cast("string"), F.lit("hll"))
    bucket = F.pmod(h, F.lit(HLL_M))
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(w))
    )
    return (
        df.select(F.col(group_col).alias("grp"), bucket.alias("b"), rho.alias("r"))
        .groupBy("grp", "b")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Fold register state (grp, b, r) to (grp, n_hll): the exact
    decimal harmonic sum, the embedded-literal numerator, and the
    linear-counting small-range branch."""
    per_group = regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(F.expr("shiftleft(1L, 53 - r)").cast("decimal(38,0)")).alias("_zsum"),
    )
    zeros = F.lit(HLL_M) - F.col("_present")
    z = (
        F.col("_zsum") + zeros.cast("decimal(38,0)") * F.lit(1 << 53).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(float(_HLL_NUMER)) / z
    est = F.when(
        (raw <= 2.5 * HLL_M) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select("grp", F.round(est, 4).alias("n_hll"))


def hll_distinct(df: DataFrame, key_col: str, group_col: str) -> DataFrame:
    """(group, n_exact, n_hll, rel_err): HLL estimate of distinct
    `key_col` per group next to the exact count — the estimator AND its
    realized error, both bit-identical across engines."""
    estimates = hll_estimate(hll_registers(df, key_col, group_col))
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count_distinct(F.col(key_col)).alias("n_exact")
    )
    return (
        estimates.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            "n_hll",
            F.round(
                F.abs(F.col("n_hll") - F.col("n_exact")) / F.col("n_exact"), 4
            ).alias("rel_err"),
        )
    )


def hll_distinct_sql(from_sql: str, key_col: str, group_col: str) -> str:
    from databus_spark.functions.hashes import portable_hash64_sql

    h = portable_hash64_sql(f"CAST({key_col} AS VARCHAR)", "'hll'")
    return f"""
        WITH base AS (
            SELECT {group_col} AS grp,
                   ({h}) % {HLL_M} AS b,
                   ({h}) // {HLL_M} AS w
            FROM ({from_sql})
        ),
        regs AS (
            SELECT grp, b,
                   max(CASE WHEN w = 0 THEN 53
                            ELSE 53 - length(bin(w)) END) AS r
            FROM base GROUP BY 1, 2
        ),
        pg AS (
            SELECT grp, count(*) AS present,
                   sum(CAST(1::BIGINT << (53 - r) AS DECIMAL(38,0))) AS zsum
            FROM regs GROUP BY 1
        ),
        exact AS (
            SELECT {group_col} AS grp, count(DISTINCT {key_col}) AS n_exact
            FROM ({from_sql}) GROUP BY 1
        ),
        scored AS (
            SELECT grp, n_exact,
                   CASE WHEN ({_HLL_NUMER} / zd) <= {2.5 * HLL_M}
                             AND ({HLL_M} - present) > 0
                        THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                                 / CAST({HLL_M} - present AS DOUBLE))
                        ELSE {_HLL_NUMER} / zd END AS est
            FROM (
                SELECT pg.grp, exact.n_exact, present,
                       CAST(zsum + CAST({HLL_M} - present AS DECIMAL(38,0))
                                * CAST({1 << 53} AS DECIMAL(38,0)) AS DOUBLE) AS zd
                FROM pg JOIN exact ON pg.grp = exact.grp
            )
        )
        SELECT grp AS {group_col}, n_exact,
               round(est, 4) AS n_hll,
               round(abs(round(est, 4) - n_exact) / n_exact, 4) AS rel_err
        FROM scored
    """


# ---------------------------------------------------------------------------
# Count-Min frequency sketch — the HLL's counting sibling
# ---------------------------------------------------------------------------
# Approximate per-key frequencies in d*w integers regardless of key
# cardinality: d seeded hash rows of w counters; estimate = min over
# rows of the key's counter (one-sided error: NEVER an undercount,
# overcounts only from collisions). Everything is integer arithmetic on
# the shared portable hash family, so unlike probabilistic sketch
# libraries the estimates are bit-identical across engines and the
# overcount is deterministic — the oracle checks exact equality AND the
# one-sided bound.
#
# Mergeability: counters ADD (sum per (row, pos)) — map-side partial
# aggregation merges shard sketches for free, same as hll_registers'
# max-merge. 100 TB shape: one groupBy on (seed_row, pos) bounded by
# d*w = 768 output rows; scoring keys is a broadcast join against the
# sketch table.

CM_D = 3    # hash rows
CM_W = 256  # counters per row


def _cm_pos(key_col, s_col):
    from databus_spark.functions.hashes import portable_hash64

    seed = F.concat(F.lit("cm"), s_col.cast("string"))
    return F.pmod(portable_hash64(key_col.cast("string"), seed), F.lit(CM_W))


def cm_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """(s, pos, c): the d x w counter table — at most CM_D * CM_W rows."""
    fan = df.select(
        F.col(key_col).alias("_k"),
        F.explode(F.sequence(F.lit(0), F.lit(CM_D - 1))).alias("s"),
    )
    return (
        fan.select("s", _cm_pos(F.col("_k"), F.col("s")).alias("pos"))
        .groupBy("s", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cm_estimate(keys: DataFrame, sketch: DataFrame, key_col: str) -> DataFrame:
    """(key, n_cm): min-over-rows counter lookup for each input key.
    The sketch is broadcast (<= d*w rows)."""
    fan = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(CM_D - 1))).alias("s"),
    ).withColumn("pos", _cm_pos(F.col(key_col), F.col("s")))
    return (
        fan.join(F.broadcast(sketch), ["s", "pos"])
        .groupBy(key_col)
        .agg(F.min("c").alias("n_cm"))
    )


def cm_frequency_profile(df: DataFrame, key_col: str) -> DataFrame:
    """(key, n_exact, n_cm, overcount) for every distinct key — the
    sketch estimate next to the truth, overcount >= 0 by construction."""
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_exact"))
    est = cm_estimate(exact.select(key_col), cm_sketch(df, key_col), key_col)
    return exact.join(est, key_col).select(
        key_col,
        "n_exact",
        "n_cm",
        (F.col("n_cm") - F.col("n_exact")).alias("overcount"),
    )


def cm_frequency_profile_sql(from_sql: str, key_col: str) -> str:
    from databus_spark.functions.hashes import portable_hash64_sql

    # pos is built per column REFERENCE (bare vs e.-qualified), never by
    # post-hoc string replacement — a key column whose name is a
    # substring of the generated expression (e.g. 's', 'cm', 'pos')
    # would corrupt the SQL silently under replace()
    def _pos(ref: str) -> str:
        return (
            "("
            + portable_hash64_sql(
                f"CAST({ref} AS VARCHAR)", "('cm' || CAST(s AS VARCHAR))"
            )
            + f") % {CM_W}"
        )

    return f"""
        WITH seeds AS (SELECT unnest(range(0, {CM_D})) AS s),
        sketch AS (
            SELECT s, {_pos(key_col)} AS pos, count(*) AS c
            FROM ({from_sql}) CROSS JOIN seeds
            GROUP BY 1, 2
        ),
        exact AS (
            SELECT {key_col}, count(*) AS n_exact
            FROM ({from_sql}) GROUP BY 1
        ),
        est AS (
            SELECT {key_col}, min(c) AS n_cm
            FROM (
                SELECT e.{key_col}, s, {_pos(f'e.{key_col}')} AS pos
                FROM exact e CROSS JOIN seeds
            ) k
            JOIN sketch USING (s, pos)
            GROUP BY 1
        )
        SELECT {key_col}, n_exact, n_cm, n_cm - n_exact AS overcount
        FROM exact JOIN est USING ({key_col})
    """


# ---------------------------------------------------------------------------
# Funnel analysis (ordered-step conversion over the event stream)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(events: DataFrame, steps=FUNNEL_STEPS, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts") -> DataFrame:
    """(stage, step, n_users): users reaching each funnel stage IN ORDER
    — stage k counts users with an event of step k strictly after their
    earliest qualifying step k-1 event.

    Scale shape: one map-side-combinable min-agg per stage keyed by
    user, chained by user-keyed equi-joins whose right side only ever
    SHRINKS (stage-k survivors); no windows over the full stream, no
    per-user event collection.
    """
    reached = None
    out = []
    for i, step in enumerate(steps):
        stage_events = events.where(F.col(type_col) == step)
        if reached is None:
            cur = stage_events.groupBy(F.col(user_col).alias("u")).agg(
                F.min(ts_col).alias("t")
            )
        else:
            cur = (
                stage_events.join(
                    reached, F.col(user_col) == F.col("u"), "inner"
                )
                .where(F.col(ts_col) > F.col("t"))
                .groupBy("u")
                .agg(F.min(ts_col).alias("t2"))
                .select("u", F.col("t2").alias("t"))
            )
        reached = cur.localCheckpoint(eager=False)
        out.append(
            reached.agg(
                F.lit(i + 1).alias("stage"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def funnel_counts_sql(from_sql: str, steps=FUNNEL_STEPS) -> str:
    ctes = [
        f"s1 AS (SELECT user_id AS u, min(ts) AS t FROM ({from_sql}) "
        f"WHERE event_type = '{steps[0]}' GROUP BY 1)"
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"s{i + 1} AS (SELECT e.user_id AS u, min(e.ts) AS t "
            f"FROM ({from_sql}) e JOIN s{i} ON e.user_id = s{i}.u "
            f"WHERE e.event_type = '{steps[i]}' AND e.ts > s{i}.t GROUP BY 1)"
        )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage, '{s}' AS step, count(*) AS n_users FROM s{i + 1}"
        for i, s in enumerate(steps)
    )
    return "WITH " + ", ".join(ctes) + " " + selects


# ---------------------------------------------------------------------------
# Retention cohorts (first-seen cohort x activity offset)
# ---------------------------------------------------------------------------

def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """(cohort_week, week_offset, n_active): users grouped by first-seen
    week, counted distinct in each later week — the activity-retention
    triangle. Integer week buckets (epoch // 604800) so both engines
    bucket identically; two user-keyed aggs + one join, all map-side
    combinable."""
    weeks = events.select(
        F.col(user_col).alias("u"),
        (F.unix_timestamp(ts_col) / 604800).cast("bigint").alias("w"),
    )
    first = weeks.groupBy("u").agg(F.min("w").alias("w0"))
    return (
        weeks.dropDuplicates(["u", "w"])
        .join(first, "u")
        .groupBy(
            F.col("w0").alias("cohort_week"),
            (F.col("w") - F.col("w0")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def retention_cohorts_sql(from_sql: str) -> str:
    return f"""
        WITH weeks AS (
            SELECT DISTINCT user_id AS u,
                   CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w
            FROM ({from_sql})
        ),
        first AS (SELECT u, min(w) AS w0 FROM weeks GROUP BY 1)
        SELECT w0 AS cohort_week, w - w0 AS week_offset,
               count(*) AS n_active
        FROM weeks JOIN first USING (u)
        GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# Binned quantile estimation — the deterministic approximate-percentile
# ---------------------------------------------------------------------------
# percentile_approx / t-digest style sketches are engine-private and
# merge-order-sensitive, so they can only ever get a rows-only check
# (the repo's approx_stats). This is the deterministic alternative: a
# fixed-B equi-width histogram (built from a broadcast min/max probe),
# cumulative counts, and within-bin linear interpolation — every step
# an expression BOTH engines evaluate identically, so the estimate AND
# its error against the exact percentile are hash-checked.
#
# 100 TB shape: one scalar min/max agg, one map-side-combinable
# histogram agg (B rows out), then all quantile math happens on B rows.
# The exact comparison column is the only full-sort-ish cost and exists
# for the error report; production callers drop it.

QB_BINS = 64


def binned_quantiles(df: DataFrame, col: str, qs=(0.5, 0.9, 0.99)) -> DataFrame:
    """(q, n_est, n_exact, abs_err): interpolated equi-width-histogram
    quantile vs the exact interpolated percentile."""
    mm = df.agg(F.min(col).alias("_mn"), F.max(col).alias("_mx"))
    span = F.col("_mx") - F.col("_mn")
    binned = (
        df.crossJoin(F.broadcast(mm))
        .select(
            F.least(
                F.floor((F.col(col) - F.col("_mn")) * QB_BINS / span).cast("int"),
                F.lit(QB_BINS - 1),
            ).alias("bin"),
            "_mn",
            "_mx",
        )
    )
    hist = binned.groupBy("bin", "_mn", "_mx").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window as W

    cum = hist.withColumn(
        "cum", F.sum("n").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0))
    ).withColumn("total", F.sum("n").over(W.partitionBy()))
    qdf = None
    for q in qs:
        one = (
            cum.where(F.col("cum") >= F.lit(q) * F.col("total"))
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(q).alias("q"),
                # floor-scale instead of round(,4): floor on a double is
                # IEEE-exact and therefore cross-engine-identical, while
                # round(double, n) is HALF_UP-on-BigDecimal in Spark vs
                # scaled-float rounding in DuckDB (boundary-divergent)
                (
                    F.floor(
                        (
                            F.col("_mn")
                            + (
                                F.col("bin")
                                + (
                                    (
                                        F.lit(q) * F.col("total")
                                        - (F.col("cum") - F.col("n"))
                                    )
                                    / F.col("n")
                                )
                            )
                            * (F.col("_mx") - F.col("_mn"))
                            / QB_BINS
                        )
                        * 10000.0
                    )
                    / 10000.0
                ).alias("n_est"),
            )
        )
        qdf = one if qdf is None else qdf.unionByName(one)
    exact = df.agg(
        *[
            (F.floor(F.percentile(col, q) * 10000.0) / 10000.0).alias(f"_p{i}")
            for i, q in enumerate(qs)
        ]
    )
    exact_rows = None
    for i, q in enumerate(qs):
        row = exact.select(F.lit(q).alias("q"), F.col(f"_p{i}").alias("n_exact"))
        exact_rows = row if exact_rows is None else exact_rows.unionByName(row)
    return (
        qdf.join(exact_rows, "q")
        .select(
            "q",
            "n_est",
            "n_exact",
            (
                F.floor(F.abs(F.col("n_est") - F.col("n_exact")) * 10000.0) / 10000.0
            ).alias("abs_err"),
        )
    )


def binned_quantiles_sql(from_sql: str, col: str, qs=(0.5, 0.9, 0.99)) -> str:
    # CAST the q literals: DuckDB types bare 0.9 as DECIMAL(2,1) where
    # Spark's lit(0.9) is DOUBLE — schema must match for the hash gate
    q_union_est = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q" for q in qs
    )
    # floor-scale (matches the Spark twin): floor on a double is IEEE-
    # exact cross-engine; round(double, n) is not
    q_union_exact = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q,"
        f" CAST(floor(quantile_cont({col}, {q}) * 10000.0) AS BIGINT)"
        f" / 10000.0 AS n_exact"
        f" FROM ({from_sql})"
        for q in qs
    )
    return f"""
        WITH mm AS (SELECT min({col}) AS mn, max({col}) AS mx FROM ({from_sql})),
        binned AS (
            SELECT least(CAST(floor(({col} - mn) * {QB_BINS} / (mx - mn)) AS INT),
                         {QB_BINS - 1}) AS bin, mn, mx
            FROM ({from_sql}) CROSS JOIN mm
        ),
        hist AS (SELECT bin, mn, mx, count(*) AS n FROM binned GROUP BY 1, 2, 3),
        cum AS (
            SELECT bin, mn, mx, n,
                   sum(n) OVER (ORDER BY bin
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   sum(n) OVER () AS total
            FROM hist
        ),
        est AS (
            SELECT q,
                   CAST(floor((mn + (bin + ((q * total - (cum - n)) / n))
                             * (mx - mn) / {QB_BINS}) * 10000.0) AS BIGINT)
                       / 10000.0 AS n_est
            FROM ({q_union_est}) qs
            CROSS JOIN LATERAL (
                SELECT bin, mn, mx, n, cum, total FROM cum
                WHERE cum >= qs.q * total ORDER BY bin LIMIT 1
            )
        )
        SELECT q, n_est, n_exact,
               CAST(floor(abs(n_est - n_exact) * 10000.0) AS BIGINT)
                   / 10000.0 AS abs_err
        FROM est JOIN ({q_union_exact}) e USING (q)
    """
