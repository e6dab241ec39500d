"""RelayFacade: the /sources /register /stream lifecycle composed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databus_spark.envelope import multi_source_changelog
from databus_spark.serve import RelayFacade
from databus_spark.sources.schema_registry import SchemaRegistry, VersionedSchema
from databus_spark.streaming.checkpoint import Checkpoint


@pytest.fixture(scope="module")
def facade(spark, sf_dir):
    reg = SchemaRegistry()
    reg.register(VersionedSchema("orders", 1, "o_orderkey BIGINT, o_totalprice DOUBLE"))
    reg.register(
        VersionedSchema("orders", 2, "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING")
    )
    log = multi_source_changelog(spark, sf_dir).localCheckpoint(eager=True)
    return RelayFacade(spark, log, reg), log


def test_sources_endpoint(facade):
    f, _ = facade
    rows = {r["source"]: r["source_id"] for r in f.sources().collect()}
    assert rows["orders"] == 1 and rows["customer"] == 2


def test_register_endpoint_returns_all_versions(facade):
    f, _ = facade
    rows = f.register(["orders"]).collect()
    assert {r["schema_version"] for r in rows} == {1, 2}
    assert all(len(r["schema_id"]) == 32 for r in rows)
    with pytest.raises(KeyError):
        f.register(["not_a_source"])


def test_stream_checkpoint_filters_and_size(facade):
    f, log = facade
    ckpt = Checkpoint().on_window_end(1_000_000_000, 0)

    # after-checkpoint + source + partition conjunction
    out = f.stream(ckpt, sources=["orders"], partitions=[0, 1])
    exp = log.where(
        (F.col("scn") > 1_000_000_000)
        & (F.col("source") == "orders")
        & F.col("part_id").isin([0, 1])
    )
    assert out.count() == exp.count()
    assert out.agg(F.min("scn")).collect()[0][0] > 1_000_000_000

    # key-filter config narrows further
    cfg = {"orders": {"partitionType": "MOD", "numBuckets": 4, "buckets": "[0]"}}
    narrowed = f.stream(ckpt, sources=["orders"], filter_config=cfg)
    assert 0 < narrowed.count() < out.count() + 1

    # byte budget caps the scan in scn order
    budget = 5000
    page = f.stream(0, size_bytes=budget).collect()
    assert len(page) > 0
    total = sum(45 + len(r["key_str"]) + len(r["source"]) for r in page)
    assert total <= budget
    scns = [r["scn"] for r in page]
    assert scns == sorted(scns)


def test_stream_pagination_is_resumable(facade):
    """Two consecutive size-bounded pages are disjoint and contiguous."""
    f, _ = facade
    page1 = f.stream(0, size_bytes=4000).collect()
    last_scn = max(r["scn"] for r in page1)
    page2 = f.stream(last_scn, size_bytes=4000).collect()
    assert page2
    assert min(r["scn"] for r in page2) > last_scn


class _FlakyFacade(RelayFacade):
    """Relay replica that dies for a stretch of calls, then recovers."""

    def __init__(self, spark, log, fail_calls=range(0, 10**9)):
        super().__init__(spark, log)
        self._calls = 0
        self._fail_calls = fail_calls

    def stream_windows(self, since_scn, n_windows):
        call, self._calls = self._calls, self._calls + 1
        if call in self._fail_calls:
            raise ConnectionError("relay down")
        return super().stream_windows(since_scn, n_windows)


def test_multi_relay_failover_no_loss_no_dup(facade, spark):
    """A relay dying mid-stream rotates the client to a replica; the
    page retries from the same checkpoint — final drain equals the log
    exactly (window-atomic: no partial transactions at any boundary)."""
    from databus_spark.serve import MultiRelayClient

    _, log = facade
    # relay 0 serves 2 pages then dies; relay 1 healthy throughout
    primary = _FlakyFacade(spark, log, fail_calls=range(2, 10**9))
    replica = RelayFacade(spark, log)
    client = MultiRelayClient([primary, replica], start_scn=-1)  # log's min scn is 0

    pages: list = []
    n_pages = client.drain(lambda p: pages.append(p.localCheckpoint(eager=True)), n_windows=600)
    assert client.failovers == 1
    assert n_pages >= 3  # failover happened mid-stream, drain continued

    union = pages[0]
    for p in pages[1:]:
        union = union.unionByName(p)
    assert union.count() == log.count()  # no loss, no dup
    assert union.select("scn", "source", "key_str").distinct().count() == \
        log.select("scn", "source", "key_str").distinct().count()

    # window atomicity: no scn spans two pages
    seen: set = set()
    for p in pages:
        scns = {r["scn"] for r in p.select("scn").distinct().collect()}
        assert not (scns & seen)
        seen |= scns


def test_multi_relay_all_down_raises(facade, spark):
    from databus_spark.serve import MultiRelayClient, RelayUnavailableError

    _, log = facade
    client = MultiRelayClient([_FlakyFacade(spark, log), _FlakyFacade(spark, log)])
    import pytest as _pytest

    with _pytest.raises(RelayUnavailableError):
        client.pull()


def test_failover_drain_builds_exact_snapshot(facade, spark, tmp_path):
    """End-to-end: a consumer drains the log through the failover client
    into the MERGE store; despite a mid-stream relay death the final
    store state equals batch compaction of the full log exactly."""
    from databus_spark.operators.compaction import latest_by_key
    from databus_spark.serve import MultiRelayClient
    from databus_spark.store.snapshot import ParquetSnapshotStore

    _, log = facade
    primary = _FlakyFacade(spark, log, fail_calls=range(1, 3))  # dies after page 0
    replica = RelayFacade(spark, log)
    client = MultiRelayClient([primary, replica], start_scn=-1)
    store = ParquetSnapshotStore(spark, str(tmp_path / "snap"), key_cols=("source", "key_str"))

    client.drain(lambda p: store.merge(p), n_windows=700)
    assert client.failovers >= 1

    got = sorted(
        (r["source"], r["key_str"], r["scn"]) for r in store.read().collect()
    )
    want_df = latest_by_key(log, ("source", "key_str")).where(F.col("opcode") != "DELETE")
    want = sorted((r["source"], r["key_str"], r["scn"]) for r in want_df.collect())
    assert got == want


def test_stale_checkpoint_scn_not_found_then_bootstrap_cue(facade, spark):
    """A checkpoint below a relay's retention floor never silently skips
    the pruned gap: the relay answers SCNNotFound; the client first
    tries a replica with deeper retention, and only when every relay
    has pruned past the checkpoint does SCNNotFoundError surface as the
    bootstrap cue."""
    from databus_spark.serve import MultiRelayClient
    from databus_spark.streaming.controller import SCNNotFoundError

    _, log = facade
    shallow = RelayFacade(spark, log, retained_min_scn=2_000_000_000)
    deep = RelayFacade(spark, log)  # full history

    # stale checkpoint + a deep replica: rotation saves the stream
    client = MultiRelayClient([shallow, deep], start_scn=-1)
    page = client.pull(n_windows=50)
    assert page is not None and client.failovers == 1
    assert page.agg(F.min("scn")).collect()[0][0] >= 0  # served from scn 0, no gap

    # every relay pruned -> SCNNotFoundError (not RelayUnavailableError)
    client2 = MultiRelayClient(
        [
            RelayFacade(spark, log, retained_min_scn=2_000_000_000),
            RelayFacade(spark, log, retained_min_scn=1_000_000_000),
        ],
        start_scn=-1,
    )
    with pytest.raises(SCNNotFoundError):
        client2.pull()

    # a checkpoint AT the floor boundary is still served (events > ckpt all retained)
    ok = RelayFacade(spark, log, retained_min_scn=2_000_000_000)
    page, bound = ok.stream_windows(1_999_999_999, 10)
    assert bound > 1_999_999_999
