"""Streaming entity resolution: batches merged into persisted cluster
state must equal a from-scratch batch recompute over everything seen —
including cross-BATCH incoming matches (via the accumulated incoming
block index) and merges of pre-existing base clusters bridged by a
late arrival. Replays skip; state survives vacuum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databus_spark.operators import joins
from databus_spark.operators.dedup import dedup_clusters
from databus_spark.streaming.sketches import StreamingEntityResolver

BIG = 1 << 20  # generous caps so blocking populations can't mask equivalence


def _docs(spark, rows, start=0):
    return spark.createDataFrame(
        [
            (start + i, t, lang, "s", len(t))
            for i, (t, lang) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _resolver(spark, tmp_path, base):
    return StreamingEntityResolver(
        spark,
        str(tmp_path / "er"),
        base_blocks=joins.fuzzy_join_blocks(base, max_block=BIG),
        base_labels=dedup_clusters(joins.fuzzy_join_pairs(base, max_block=BIG)),
    )


def test_streamed_batches_equal_full_recompute(spark, tmp_path):
    base = _docs(
        spark,
        [
            ("aaaaaaaaaaaaaaaaaaaa", "en"),
            ("aaaaaaaaaaaaaaaaaabb", "en"),  # base cluster {0, 1}
            ("cccccccccccccccccccc", "en"),
            ("qqqq totally unrelated qqqqqq", "en"),
        ],
    )
    # batch 1: one doc linking base doc 2; one novel doc (no match yet)
    b1 = _docs(
        spark,
        [("ccccccccccccccccccdd", "en"), ("eeeeeeeeeeeeeeeeeeee", "en")],
        start=100,
    )
    # batch 2: matches batch 1's novel doc (cross-BATCH incoming link —
    # only findable through the accumulated incoming index) and a
    # bridge that merges base cluster {0,1} with base doc 2's cluster
    b2 = _docs(
        spark,
        # doc 201 sits 10 edits from BOTH the a-run and the c-run
        [("eeeeeeeeeeeeeeeeeeff", "en"), ("aaaaaaaaaacccccccccc", "en")],
        start=200,
    )
    r = _resolver(spark, tmp_path, base)
    r.process_batch(b1, 0)
    r.process_batch(b2, 1)
    got = sorted(tuple(x) for x in r.labels().collect())
    want = sorted(
        tuple(x)
        for x in dedup_clusters(
            joins.fuzzy_join_pairs(
                base.unionByName(b1).unionByName(b2), max_block=BIG
            )
        ).collect()
    )
    assert got == want
    lab = {d: c for d, c, _ in got}
    assert lab[100] == lab[2]  # batch-1 edit joined base doc 2
    assert lab[200] == lab[101]  # cross-batch incoming pair via the inc index
    # the bridge merged {0,1} with {2,100}: everything labels to min 0
    assert lab[0] == lab[1] == lab[2] == lab[100] == lab[201] == 0


def test_per_batch_state_write_is_o_batch(spark, tmp_path):
    """Round-12 rework: the incoming block index is append-only (one
    leaf per batch under inc_leaves/), so the bytes written for batch N
    must track BATCH size, not accumulated stream size — the r11 shape
    rewrote the whole index every micro-batch (O(total ingested))."""
    import os

    def _dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )

    base = _docs(spark, [("aaaaaaaaaaaaaaaaaaaa", "en")])
    r = _resolver(spark, tmp_path, base)
    leaves_root = str(tmp_path / "er" / "inc_leaves")
    # 5 equal-size batches of mutually-unrelated docs
    sizes = []
    for b in range(5):
        batch = _docs(
            spark,
            [(f"{chr(103 + b)}{i:02d}" + "m" * 17, "en") for i in range(8)],
            start=1000 * (b + 1),
        )
        r.process_batch(batch, b)
        leafs = sorted(os.listdir(leaves_root))
        sizes.append(_dir_bytes(os.path.join(leaves_root, leafs[-1])))
    # every batch writes ONE new leaf whose size is flat across the
    # stream's life (parquet metadata dominates at this scale; the
    # assertion is "not proportional to accumulated total", which by
    # batch 5 would be ~5x)
    assert len(os.listdir(leaves_root)) == 5
    assert max(sizes) <= 1.5 * min(sizes)
    # and no version directory carries a rewritten index copy
    v_dirs = [d for d in os.listdir(tmp_path / "er") if d.startswith("v")]
    for d in v_dirs:
        assert "inc_blocks" not in os.listdir(tmp_path / "er" / d)


def test_replay_and_vacuum(spark, tmp_path):
    base = _docs(spark, [("aaaaaaaaaaaaaaaaaaaa", "en")])
    b1 = _docs(spark, [("aaaaaaaaaaaaaaaaaabb", "en")], start=100)
    r = _resolver(spark, tmp_path, base)
    r.process_batch(b1, 0)
    before = sorted(tuple(x) for x in r.labels().collect())
    r.process_batch(b1, 0)  # at-least-once redelivery
    assert sorted(tuple(x) for x in r.labels().collect()) == before
    r.process_batch(
        _docs(spark, [("aaaaaaaaaaaaaaaaaacc", "en")], start=200), 1
    )
    r.vacuum(keep_last=1)
    assert {x.doc_id for x in r.labels().collect()} == {0, 100, 200}
