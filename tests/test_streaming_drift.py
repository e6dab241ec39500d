"""Streaming corpus-drift monitor: accumulated micro-batch counts vs a
staged baseline must (a) converge to the batch operator when the
baseline IS the streamed corpus, (b) skip at-least-once replays, and
(c) raise the alarm on novel-vocabulary slices through the OOV bin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databus_spark.catalog import load_table
from databus_spark.streaming.sketches import StreamingDriftMonitor


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_streamed_halves_equal_batch_corpus_drift(spark, sf_dir, tmp_path):
    """Baseline = the whole corpus; streaming the same corpus in two
    halves must reproduce operators/text.corpus_drift EXACTLY (same
    vocab — staged from the same counts — same bin counts, same KL)."""
    from databus_spark.operators.text import corpus_drift

    docs = _docs(spark, sf_dir)
    mon = StreamingDriftMonitor(spark, str(tmp_path / "drift"), baseline_docs=docs)
    mon.process_batch(docs.where(F.col("doc_id") % 2 == 0), 0)
    mon.process_batch(docs.where(F.col("doc_id") % 2 == 1), 1)
    got = sorted(tuple(r) for r in mon.drift().collect())
    want = sorted(tuple(r) for r in corpus_drift(docs).collect())
    assert got == want


def test_replay_is_skipped(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    mon = StreamingDriftMonitor(spark, str(tmp_path / "drift"), baseline_docs=docs)
    h1 = docs.where(F.col("doc_id") % 2 == 0)
    mon.process_batch(h1, 0)
    before = sorted(tuple(r) for r in mon.drift().collect())
    mon.process_batch(h1, 0)  # at-least-once redelivery
    assert sorted(tuple(r) for r in mon.drift().collect()) == before
    # vacuum keeps the current version readable
    mon.process_batch(docs.where(F.col("doc_id") % 2 == 1), 1)
    mon.vacuum(keep_last=1)
    assert mon.drift().count() > 0


def test_novel_vocabulary_slice_raises_oov_alarm(spark, sf_dir, tmp_path):
    """A stream slice whose tokens the baseline never saw must score
    clearly above a slice drawn from the baseline distribution."""
    docs = _docs(spark, sf_dir)
    mon = StreamingDriftMonitor(spark, str(tmp_path / "drift"), baseline_docs=docs)
    clean = docs.limit(50).select(
        "doc_id", "text", "lang", F.lit("clean").alias("source"), "n_chars"
    )
    novel = docs.limit(50).select(
        "doc_id",
        F.regexp_replace("text", r"\w+", "zzznovel").alias("text"),
        "lang",
        F.lit("novel").alias("source"),
        "n_chars",
    )
    mon.process_batch(clean.unionByName(novel), 0)
    kl = {r.source: r.kl_div for r in mon.drift().collect()}
    assert kl["novel"] > kl["clean"] + 0.5


def test_unstaged_baseline_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no staged baseline"):
        StreamingDriftMonitor(spark, str(tmp_path / "empty"))
