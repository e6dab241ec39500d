"""Bucketed tables: co-located joins without a shuffle (SCALE.md's
'bucketing for co-located joins' claim, demonstrated and guarded)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    from databus_spark.catalog import load_table

    # warehouse dir is a static conf; the default (./spark-warehouse,
    # gitignored) is fine for this managed-table demo
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed):
    # force the big-big join strategy (broadcast would hide the point:
    # bucketing removes the SHUFFLE from a sort-merge join)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            """
            SELECT o.o_orderkey, count(*) AS n
            FROM b_orders o JOIN b_lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
            """
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan[:600]}"
        )
        got = sorted((r[0], r[1]) for r in joined.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # and it is correct vs the plain (shuffling) join
    from databus_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    exp = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey")
        .count()
        .collect()
    )
    assert got == sorted((r[0], r[1]) for r in exp)
