"""Round-15 additions (optimization round 2): the scheme guard on the
serve-path driver-side stats read, and the shared-groups contract the
record-linkage latency work relies on."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_is_local_path_scheme_decisions():
    """Bare paths and file:// URIs are local (pyarrow-readable); any
    other scheme must route through Spark's Hadoop filesystem layer."""
    from databus_spark.operators.similarity import _is_local_path

    assert _is_local_path("/tmp/idx/stats")
    assert _is_local_path("file:///tmp/idx/stats")
    assert not _is_local_path("hdfs://nn:8020/idx/stats")
    assert not _is_local_path("s3a://bucket/idx/stats")
    assert not _is_local_path("abfss://c@a.dfs.core.windows.net/idx")


def test_stats_read_local_and_spark_fallback(spark, tmp_path):
    """_stats_n_rows sums the one-row stats files identically through
    the pyarrow fast path (bare path AND file:// URI) and through the
    Spark fallback a non-local scheme takes — the fallback is exercised
    with a shim whose read.parquet strips the mocked scheme, proving
    the non-local branch really is the Spark read."""
    from databus_spark.operators.similarity import _is_local_path, _stats_n_rows

    d = str(tmp_path / "stats")
    spark.range(1).select(F.lit(7).cast("long").alias("n_rows")).write.parquet(d)
    spark.range(1).select(F.lit(5).cast("long").alias("n_rows")).write.mode(
        "append"
    ).parquet(d)

    assert _stats_n_rows(spark, d) == 12
    assert _stats_n_rows(spark, "file://" + d) == 12

    class _SchemeStrippingReader:
        def __init__(self, s):
            self._s = s

        def parquet(self, path):
            assert path.startswith("mockfs://")
            return self._s.read.parquet(path[len("mockfs://"):])

    class _SparkShim:
        def __init__(self, s):
            self.read = _SchemeStrippingReader(s)

    mocked = "mockfs://" + d
    assert not _is_local_path(mocked)
    assert _stats_n_rows(_SparkShim(spark), mocked) == 12


def test_fuzzy_shared_groups_identical_pairs(spark, sf_dir):
    """fuzzy_join_pairs with a caller-supplied precomputed groups frame
    (the record_linkage_incremental sharing path) returns exactly the
    pairs of the self-derived path."""
    from databus_spark.operators import joins
    from databus_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    shared = joins._fuzzy_groups(
        docs, "text", "lang", "n_chars", joins.LINK_PREFIX, joins.LINK_LEN_BUCKET
    )
    a = sorted(map(tuple, joins.fuzzy_join_pairs(docs).collect()))
    b = sorted(map(tuple, joins.fuzzy_join_pairs(docs, grouped=shared).collect()))
    assert a == b
    c = sorted(
        map(
            tuple,
            joins.fuzzy_join_incremental(docs, base=docs, grouped=shared)
            .collect(),
        )
    )
    d = sorted(
        map(tuple, joins.fuzzy_join_incremental(docs, base=docs).collect())
    )
    assert c == d
