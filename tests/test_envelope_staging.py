"""The bench-only staged-changelog path must be row-identical to the
direct derivation — bench correctness rides on it (envelope._staged)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def staged_env(monkeypatch):
    import databus_spark.envelope as env

    monkeypatch.setenv("DATABUS_CACHE_CHANGELOGS", "1")
    # fresh stage dir for the test, restored after
    monkeypatch.setattr(env, "_STAGE_ROOT", None)
    yield
    monkeypatch.setattr(env, "_STAGE_ROOT", None)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_staged_equals_direct(spark, sf_dir, staged_env):
    import os

    from databus_spark.envelope import multi_source_changelog, orders_changelog

    staged = multi_source_changelog(spark, sf_dir)
    staged_rows = _rows(staged)

    os.environ.pop("DATABUS_CACHE_CHANGELOGS")
    direct = multi_source_changelog(spark, sf_dir)
    assert staged.columns == direct.columns
    assert staged_rows == _rows(direct)

    # dtypes survive the parquet round trip (ts stays a timestamp etc.)
    os.environ["DATABUS_CACHE_CHANGELOGS"] = "1"
    assert orders_changelog(spark, sf_dir).dtypes == direct.sparkSession.createDataFrame(
        [], orders_changelog(spark, sf_dir).schema
    ).dtypes


def test_staged_writes_once(spark, sf_dir, staged_env):
    import os

    import databus_spark.envelope as env

    env.orders_changelog(spark, sf_dir)
    root = env._STAGE_ROOT
    assert root is not None
    dirs = os.listdir(root)
    assert len(dirs) == 1
    mtime = os.path.getmtime(os.path.join(root, dirs[0], "_SUCCESS"))
    env.orders_changelog(spark, sf_dir)  # second call reads, no rewrite
    assert os.path.getmtime(os.path.join(root, dirs[0], "_SUCCESS")) == mtime
