"""The local oracle gate must see what the driver sees.

Round 6 post-mortem: DuckDB types a bare integer ``sum()`` as HUGEINT,
which the driver's pandas/arrow fetch renders float64 while Spark emits
bigint — so the driver's value hash diverges even when every value is
numerically identical. The old ``fetchall()``-based gate compared Python
ints and was structurally blind to this, which let ``text_novelty`` ship
red twice. These tests pin the hardened gate: an intentionally-uncast
fixture must FAIL locally, and the cast form must pass.
"""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


def test_gate_catches_uncast_hugeint_sum(spark, duck):
    """Bit-identical values, bigint vs HUGEINT typing → must fail."""
    df = spark.sql("SELECT 1 AS g, CAST(34 AS BIGINT) AS n")
    with pytest.raises(AssertionError, match="dtype-kind mismatch"):
        compare(df, duck, "SELECT 1 AS g, sum(x) AS n FROM (SELECT 34 AS x)")


def test_gate_accepts_cast_sum(spark, duck):
    df = spark.sql("SELECT 1 AS g, CAST(34 AS BIGINT) AS n")
    compare(df, duck, "SELECT 1 AS g, CAST(sum(x) AS BIGINT) AS n FROM (SELECT 34 AS x)")


def test_gate_catches_value_divergence(spark, duck):
    df = spark.sql("SELECT 1 AS g, CAST(35 AS BIGINT) AS n")
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(df, duck, "SELECT 1 AS g, CAST(sum(x) AS BIGINT) AS n FROM (SELECT 34 AS x)")


def test_gate_float_columns_still_compare_by_value(spark, duck):
    """Float-on-both-sides is fine — only int-vs-float kind splits fail."""
    df = spark.sql("SELECT CAST(0.5 AS DOUBLE) AS r")
    compare(df, duck, "SELECT CAST(0.5 AS DOUBLE) AS r")
