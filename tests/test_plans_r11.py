"""r11 plan guard: the INVERSE of r10's broadcast-over-Generate guard.

r10 pinned "never broadcast a subtree whose size is statically
unknowable"; this round adds the opposite miss — paying a sort-merge
shuffle where one side is PROVABLY tiny at plan time, i.e. the build
side should have been broadcast. Statically provable tiny shapes:

* a scalar aggregate (HashAggregate/SortAggregate with no grouping
  keys — exactly one output row);
* GlobalLimit n / TakeOrderedAndProject(limit=n) with small n;
* a Range scan of bounded count.

Keyed aggregates are NOT flagged: their cardinality is data-sized
(distinct keys grow with the corpus), and the r11 audit of all 154
registry plans found exactly 9 SortMergeJoin-over-aggregate sides, all
keyed on data-proportional keys (per-doc scores, bigram counts,
per-key snapshot states) — sort-merge is the right plan for every one
(the clean-registry pass r10 verdict #8 asked for; recorded in
PLANS.md).
"""

from __future__ import annotations

import re

import pytest


def _depth(s: str) -> int:
    return len(s) - len(s.lstrip(" :+-*("))


# nodes that neither grow nor hide a side's cardinality — walk through
_TRANSPARENT = (
    "Sort ",
    "Sort(",
    "Exchange",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "InputAdapter",
    "WholeStageCodegen",
    "ColumnarToRow",
    "ReusedExchange",
    "Project",
    "Filter",
    "Coalesce",
)

_TINY_LIMIT = 1024  # rows; anything this small is always broadcast-cheap


def _is_tiny(node: str) -> bool:
    if re.match(r"(Hash|Sort|ObjectHash)Aggregate\((keys|key)=\[\]", node):
        return True  # scalar aggregate: exactly one row
    m = re.match(r"GlobalLimit (\d+)", node)
    if m and int(m.group(1)) <= _TINY_LIMIT:
        return True
    m = re.match(r"TakeOrderedAndProject\(limit=(\d+)", node)
    if m and int(m.group(1)) <= _TINY_LIMIT:
        return True
    m = re.match(r"Range \((\d+), (\d+)", node)
    if m and int(m.group(2)) - int(m.group(1)) <= _TINY_LIMIT:
        return True
    return False


def _smj_over_tiny_side(plan: str) -> list[str]:
    """Offending node strings: a SortMergeJoin child that is provably
    tiny once transparent wrappers are unwrapped."""
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    hits = []
    for i, ln in enumerate(lines):
        if "SortMergeJoin" not in ln:
            continue
        d0 = _depth(ln)
        sub = []
        for l2 in lines[i + 1 :]:
            if _depth(l2) <= d0:
                break
            sub.append(l2)
        if not sub:
            continue
        dmin = min(_depth(l) for l in sub)
        kid_idx = [j for j, l in enumerate(sub) if _depth(l) == dmin]
        for k, j in enumerate(kid_idx):
            end = kid_idx[k + 1] if k + 1 < len(kid_idx) else len(sub)
            node = sub[j].strip(" :+-*(")
            hops = 0
            while (
                any(node.startswith(w) for w in _TRANSPARENT)
                and j + 1 < end
                and hops < 16
            ):
                j += 1
                node = sub[j].strip(" :+-*(")
                hops += 1
            if _is_tiny(node):
                hits.append(node[:120])
    return hits


@pytest.fixture(scope="module")
def registry_plans(spark, sf_dir):
    from databus_spark.registry import QUERIES

    plans = {}
    for name, fn in QUERIES.items():
        plans[name] = (
            fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
    return plans


def test_no_query_shuffles_a_provably_tiny_side(registry_plans):
    offenders = {
        name: hits
        for name, plan in registry_plans.items()
        if (hits := _smj_over_tiny_side(plan))
    }
    assert not offenders, offenders


def test_guard_detects_the_scalar_agg_shape(spark):
    """Planted positive/negative: forcing sort-merge against a scalar
    aggregate must trip; broadcasting it (the fix) must not."""
    from pyspark.sql import functions as F

    big = spark.range(100_000).select(F.col("id"), (F.col("id") % 97).alias("x"))
    scalar = big.agg(F.max("x").alias("x"))  # exactly one row

    bad = big.join(scalar.hint("merge"), "x")
    assert _smj_over_tiny_side(
        bad._jdf.queryExecution().executedPlan().toString()
    )

    good = big.join(F.broadcast(scalar), "x")
    assert not _smj_over_tiny_side(
        good._jdf.queryExecution().executedPlan().toString()
    )


def test_guard_ignores_keyed_aggregates(spark):
    """A keyed aggregate side is data-sized — sort-merge there is a
    legitimate plan and must NOT be flagged (the 9 audited registry
    shapes are all this class)."""
    from pyspark.sql import functions as F

    big = spark.range(100_000).select(F.col("id"), (F.col("id") % 97).alias("x"))
    keyed = big.groupBy("x").agg(F.count(F.lit(1)).alias("n"))
    df = big.join(keyed.hint("merge"), "x")
    assert not _smj_over_tiny_side(
        df._jdf.queryExecution().executedPlan().toString()
    )
