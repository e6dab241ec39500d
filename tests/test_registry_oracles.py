"""Every registered query must match its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (it runs the same pairs at
sf0.01); parametrized so a new registry entry is automatically covered.
"""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare, duck_connect


def _pairs():
    from databus_spark.registry import ORACLES, QUERIES

    return [(name, QUERIES[name], ORACLES[name]) for name in QUERIES if name in ORACLES]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", [p[0] for p in _pairs()])
def test_oracle_parity(name, spark, sf_dir, duck):
    from databus_spark.registry import ORACLES, QUERIES

    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLES[name])
