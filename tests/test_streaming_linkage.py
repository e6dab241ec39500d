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
