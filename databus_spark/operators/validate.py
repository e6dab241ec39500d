"""Data-expectation checks — the pipeline guardrail layer.

A 100 TB ingest without automated expectations fails silently: a
producer schema drift or a torn extract shows up weeks later as bad
training data. This is the Deequ/Great-Expectations shape restated as
plain aggregations: each check is one declarative measurement
(anti-join for referential integrity, groupBy for uniqueness, a
predicate aggregate for ranges) reduced to a one-row summary, so a
whole expectation suite over a 100 TB table costs one pass per
distinct input + a union of scalar rows.

Check results are (check, n_rows, n_violations, pass) — exact
integers, trivially oracle-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_integrity(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, name: str
) -> DataFrame:
    """Referential integrity: child keys missing from the parent.
    Anti-join keyed on the FK — broadcast the parent's distinct keys
    when the dimension is small, shuffle otherwise (Catalyst/AQE
    decides from sizes)."""
    total = child.agg(F.count(F.lit(1)).alias("n_rows"))
    viol = (
        child.select(F.col(child_key))
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return total.crossJoin(viol).select(
        F.lit(name).alias("check"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("pass"),
    )


def uniqueness(df: DataFrame, key: str, name: str) -> DataFrame:
    """Key uniqueness: rows beyond the first per key value count as
    violations. One map-side-combinable count agg."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    return per_key.agg(
        F.lit(name).alias("check"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.sum(F.col("_n") - 1).cast("long").alias("n_violations"),
    ).select(
        "check", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("pass")
    )


def predicate_check(df: DataFrame, predicate, name: str) -> DataFrame:
    """Row-level expectation: rows violating `predicate` (a boolean
    Column; NULL counts as a violation)."""
    return df.agg(
        F.lit(name).alias("check"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.coalesce(predicate, F.lit(False)), 0).otherwise(1))
        .cast("long")
        .alias("n_violations"),
    ).select(
        "check", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("pass")
    )


def expectation_suite(checks: list[DataFrame]) -> DataFrame:
    """Union of one-row check results — the suite report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def _one_check_sql(name: str, n_rows_sql: str, n_viol_sql: str) -> str:
    return f"""
        SELECT '{name}' AS check,
               CAST(({n_rows_sql}) AS BIGINT) AS n_rows,
               CAST(({n_viol_sql}) AS BIGINT) AS n_violations,
               ({n_viol_sql}) = 0 AS pass
    """


def tpch_expectations_sql() -> str:
    """The oracle for the registry's TPC-H expectation suite."""
    checks = [
        _one_check_sql(
            "orders.custkey->customer",
            "SELECT count(*) FROM orders",
            "SELECT count(*) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey"
            " FROM customer) c ON o.o_custkey = c.c_custkey"
            " WHERE c.c_custkey IS NULL",
        ),
        _one_check_sql(
            "lineitem.orderkey->orders",
            "SELECT count(*) FROM lineitem",
            "SELECT count(*) FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey"
            " FROM orders) o ON l.l_orderkey = o.o_orderkey"
            " WHERE o.o_orderkey IS NULL",
        ),
        _one_check_sql(
            "orders.orderkey unique",
            "SELECT count(*) FROM orders",
            "SELECT sum(n - 1) FROM (SELECT count(*) AS n FROM orders"
            " GROUP BY o_orderkey)",
        ),
        _one_check_sql(
            "orders.totalprice > 0",
            "SELECT count(*) FROM orders",
            "SELECT count(*) FROM orders"
            " WHERE NOT coalesce(o_totalprice > 0, FALSE)",
        ),
        _one_check_sql(
            "events.ts not null",
            "SELECT count(*) FROM events",
            "SELECT count(*) FROM events WHERE ts IS NULL",
        ),
    ]
    return " UNION ALL ".join(f"({c})" for c in checks)


# ---------------------------------------------------------------------------
# k-anonymity audit (privacy guardrail)
# ---------------------------------------------------------------------------
# The release-gate sibling of redact_pii: before a table (or a training
# corpus's metadata) ships, every quasi-identifier combination must be
# shared by at least k records, or the rare combination re-identifies
# its members (Sweeney, "k-anonymity: a model for protecting privacy",
# IJUFKS 2002). One map-combinable groupBy; the violating groups ARE
# the actionable output (generalize or suppress exactly those).

K_ANON_DEFAULT = 8


def k_anonymity(
    df: DataFrame, qi_cols: list[str], k: int = K_ANON_DEFAULT
) -> DataFrame:
    """(qi..., group_n): quasi-identifier combinations carried by fewer
    than k records. Empty result == the table is k-anonymous over the
    declared QI set. NULL QI values group together (a NULL combination
    can re-identify like any other rare value)."""
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("group_n"))
        .where(F.col("group_n") < k)
    )


def k_anonymity_sql(
    from_sql: str, qi_cols: list[str], k: int = K_ANON_DEFAULT
) -> str:
    cols = ", ".join(qi_cols)
    return f"""
        SELECT {cols}, CAST(count(*) AS BIGINT) AS group_n
        FROM ({from_sql})
        GROUP BY {cols}
        HAVING count(*) < {k}
    """


def k_anonymity_gate(
    df: DataFrame,
    qi_cols: list[str],
    k: int = K_ANON_DEFAULT,
    keep_pred=None,
) -> DataFrame:
    """Per-ROW k-anonymity verdict — the release-path form of the
    audit: every row annotated with its QI group's population among
    the RELEASE CANDIDATES (rows passing ``keep_pred``; all rows when
    None) and a ``suppress`` flag for rows whose group is under k.
    Counting only candidates is the correct direction: a row already
    dropped by upstream curation cannot pad out its group's anonymity
    in the shipped corpus. One map-combinable groupBy + one broadcast-
    or shuffle-join back on the QI key (Catalyst/AQE sizes it); NULL
    QI values group together, like the audit — the join back is
    null-SAFE (<=>), so a NULL-QI group with >= k candidates carries
    its real count instead of being unconditionally suppressed (r12
    ADVICE: the null-rejecting equality join gave NULL-QI rows
    group_n=0 in both engines, silently over-suppressing)."""
    cand = df if keep_pred is None else df.where(keep_pred)
    counts = cand.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("group_n"))
    # alias the count side's key columns so the <=> condition resolves
    # unambiguously (counts derives from df, so bare names collide)
    counts = counts.select(
        *[F.col(c).alias(f"_qi_{c}") for c in qi_cols], "group_n"
    )
    cond = None
    for c in qi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_qi_{c}"))
        cond = eq if cond is None else (cond & eq)
    return (
        df.join(counts, cond, "left")
        .drop(*[f"_qi_{c}" for c in qi_cols])
        .withColumn("group_n", F.coalesce(F.col("group_n"), F.lit(0)).cast("long"))
        .withColumn("suppress", F.col("group_n") < k)
    )
