"""Streaming sketch maintenance: mergeable HLL / Count-Min state kept
current across micro-batches.

The reference's stats collectors are MERGEABLE JMX beans — partial
collectors merge up the aggregation tree (reference:
databus-core-impl/.../core/monitoring/mbean/AggregatedDbusEventsTotalStats.java).
The batch sketches in operators/stats.py have the same algebra
(register-wise max for HLL, counter addition for Count-Min), which is
exactly what makes them streamable: per micro-batch, sketch the batch,
merge with the persisted state, commit. No per-key state store, no
watermark bookkeeping — the state is O(m) per group FOREVER, however
many keys the stream carries.

Persistence follows the snapshot store's crash contract: versioned
directories + an atomically-replaced ``_VERSION`` pointer, so a crash
mid-commit leaves the previous state readable and the batch replays
(merges are idempotent for HLL's max; for Count-Min the applier's
at-least-once replay can double-add a batch, so the committed version
records the last batch_id and replays of it are skipped).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingDistinctCounter:
    """Per-group distinct-key estimate maintained across micro-batches
    via HLL register max-merge. Use as a foreachBatch sink:

        q = (stream.writeStream.foreachBatch(counter.process_batch)
             .start())
        ...
        counter.estimates()   # (grp, n_hll) at any commit point
    """

    def __init__(self, spark: SparkSession, root: str, key_col: str, group_col: str):
        self.spark, self.root = spark, root
        self.key_col, self.group_col = key_col, group_col
        os.makedirs(root, exist_ok=True)

    # -- version plumbing (snapshot-store contract) -------------------------
    def _version(self) -> int:
        p = os.path.join(self.root, "_VERSION")
        return int(open(p).read().split(":")[0]) if os.path.exists(p) else 0

    def _last_batch(self) -> int:
        p = os.path.join(self.root, "_VERSION")
        if not os.path.exists(p):
            return -1
        parts = open(p).read().split(":")
        return int(parts[1]) if len(parts) > 1 else -1

    def _commit(self, v: int, batch_id: int) -> None:
        tmp = os.path.join(self.root, "_VERSION.tmp")
        with open(tmp, "w") as f:
            f.write(f"{v}:{batch_id}")
        os.replace(tmp, os.path.join(self.root, "_VERSION"))

    def registers(self) -> DataFrame | None:
        v = self._version()
        if v == 0:
            return None
        return self.spark.read.parquet(os.path.join(self.root, f"v{v}"))

    # -- the foreachBatch hook ----------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Sketch the batch, max-merge with persisted registers, commit
        the next version. Replay-safe WITHOUT a batch-id check: max is
        idempotent, so re-merging a replayed batch changes nothing."""
        from databus_spark.operators.stats import hll_registers

        fresh = hll_registers(batch, self.key_col, self.group_col)
        prev = self.registers()
        merged = (
            fresh
            if prev is None
            else fresh.unionByName(prev).groupBy("grp", "b").agg(F.max("r").alias("r"))
        )
        v = self._version() + 1
        merged.write.mode("overwrite").parquet(os.path.join(self.root, f"v{v}"))
        self._commit(v, batch_id)

    def estimates(self) -> DataFrame:
        from databus_spark.operators.stats import hll_estimate

        regs = self.registers()
        if regs is None:
            return self.spark.createDataFrame([], "grp STRING, n_hll DOUBLE")
        return hll_estimate(regs)

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop register versions older than the last keep_last."""
        v = self._version()
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) <= v - keep_last:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)


class StreamingFrequencySketch:
    """Per-key frequency estimates maintained across micro-batches via
    Count-Min counter ADDITION. Addition is NOT idempotent, so the
    committed ``_VERSION`` records the last merged batch_id and an
    at-least-once replay of the same batch is skipped rather than
    double-added."""

    def __init__(self, spark: SparkSession, root: str, key_col: str):
        self.spark, self.root, self.key_col = spark, root, key_col
        os.makedirs(root, exist_ok=True)

    _version = StreamingDistinctCounter._version
    _last_batch = StreamingDistinctCounter._last_batch
    _commit = StreamingDistinctCounter._commit
    vacuum = StreamingDistinctCounter.vacuum

    def sketch(self) -> DataFrame | None:
        v = self._version()
        if v == 0:
            return None
        return self.spark.read.parquet(os.path.join(self.root, f"v{v}"))

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from databus_spark.operators.stats import cm_sketch

        if batch_id <= self._last_batch():
            return  # replay of an already-merged batch: adding twice would overcount
        fresh = cm_sketch(batch, self.key_col)
        prev = self.sketch()
        merged = (
            fresh
            if prev is None
            else fresh.unionByName(prev).groupBy("s", "pos").agg(F.sum("c").alias("c"))
        )
        v = self._version() + 1
        merged.write.mode("overwrite").parquet(os.path.join(self.root, f"v{v}"))
        self._commit(v, batch_id)

    def estimate(self, keys: DataFrame) -> DataFrame:
        from databus_spark.operators.stats import cm_estimate

        sk = self.sketch()
        if sk is None:
            return keys.select(self.key_col).withColumn("n_cm", F.lit(0).cast("long"))
        return cm_estimate(keys, sk, self.key_col)


class StreamingDriftMonitor:
    """Per-slice token-distribution drift of an incoming document
    stream against a STAGED baseline corpus — the streaming guardrail
    form of operators/text.corpus_drift (a scraper regression or
    encoding bug in one source shows up as rising KL long before it
    poisons a training mixture).

    The baseline is staged ONCE (its drift_vocab fixes the top-V + OOV
    bin space; its bin distribution is the KL reference), so every
    micro-batch bins identically forever. Per batch, the stream's
    (slice, bin) counts ADD into persisted state — the Count-Min
    algebra, NOT idempotent — so the committed ``_VERSION`` records the
    last merged batch_id and at-least-once replays are skipped (the
    FrequencySketch contract). ``drift()`` is then available at any
    commit point as smoothed KL(accumulated slice || baseline), OOV
    included: a stream token the baseline never saw lands in the OOV
    bin against a near-zero baseline mass, which is exactly the
    novel-vocabulary alarm.

    State is O(slices x (V+1)) FOREVER, however many tokens flow.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        baseline_docs: DataFrame | None = None,
        slice_col: str = "source",
        text_col: str = "text",
        vocab_size: int | None = None,
    ):
        from databus_spark.operators.text import DRIFT_VOCAB, drift_vocab

        self.spark, self.root = spark, root
        self.slice_col, self.text_col = slice_col, text_col
        self.vocab_size = DRIFT_VOCAB if vocab_size is None else vocab_size
        os.makedirs(root, exist_ok=True)
        staged = os.path.join(root, "baseline", "_STAGED")
        if not os.path.exists(staged):
            if baseline_docs is None:
                raise ValueError(
                    "StreamingDriftMonitor: no staged baseline at "
                    f"{root}/baseline — pass baseline_docs on first use"
                )
            tc = self._token_counts(baseline_docs)
            vocab = drift_vocab(tc, self.vocab_size).localCheckpoint(eager=False)
            vocab.write.mode("overwrite").parquet(
                os.path.join(root, "baseline", "vocab")
            )
            self._bin_counts(tc).groupBy("bin").agg(
                F.sum("c").alias("cb")
            ).write.mode("overwrite").parquet(os.path.join(root, "baseline", "bins"))
            with open(staged + ".tmp", "w") as f:
                f.write(str(self.vocab_size))
            os.replace(staged + ".tmp", staged)

    _version = StreamingDistinctCounter._version
    _last_batch = StreamingDistinctCounter._last_batch
    _commit = StreamingDistinctCounter._commit
    vacuum = StreamingDistinctCounter.vacuum

    # -- shared binning against the staged space ----------------------------
    def _token_counts(self, docs: DataFrame) -> DataFrame:
        from databus_spark.operators.text import tokens_col

        return (
            docs.select(
                F.col(self.slice_col).alias("src"),
                F.explode(tokens_col(self.text_col)).alias("tok"),
            )
            .groupBy("src", "tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def _bin_counts(self, tc: DataFrame, staged_vocab: DataFrame | None = None) -> DataFrame:
        from databus_spark.operators.text import drift_bin_counts

        vocab = (
            staged_vocab
            if staged_vocab is not None
            else self.spark.read.parquet(os.path.join(self.root, "baseline", "vocab"))
        )
        return drift_bin_counts(tc, vocab)

    def counts(self) -> DataFrame | None:
        v = self._version()
        if v == 0:
            return None
        return self.spark.read.parquet(os.path.join(self.root, f"v{v}"))

    # -- the foreachBatch hook ----------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_batch():
            return  # replayed batch: counter addition would double-count
        fresh = self._bin_counts(self._token_counts(batch))
        prev = self.counts()
        merged = (
            fresh
            if prev is None
            else fresh.unionByName(prev)
            .groupBy("src", "bin")
            .agg(F.sum("c").alias("c"))
        )
        v = self._version() + 1
        merged.write.mode("overwrite").parquet(os.path.join(self.root, f"v{v}"))
        self._commit(v, batch_id)

    def drift(self) -> DataFrame:
        """(source, n_tokens, kl_div) of everything merged so far."""
        from databus_spark.operators.text import drift_kl

        state = self.counts()
        if state is None:
            return self.spark.createDataFrame(
                [], "source STRING, n_tokens LONG, kl_div DOUBLE"
            )
        baseline = self.spark.read.parquet(
            os.path.join(self.root, "baseline", "bins")
        )
        return drift_kl(state, baseline)


class StreamingEntityResolver:
    """Rolling entity resolution across micro-batches — the streaming
    form of record_linkage_incremental, applied repeatedly against
    GROWING state. Per batch:

    * edge legs: the batch probed against (staged base blocks ∪ the
      accumulated incoming-block index) — so records in DIFFERENT
      batches that match each other still link, not just records
      sharing a base neighbor — plus the batch's own internal pairs;
    * merge: previous cluster labels enter as star edges and the
      hybrid CC solver relabels every touched component (the
      contraction identity, same as the batch operator);
    * state: (doc_id, cluster_id) labels + the incoming block index,
      both versioned parquet with the snapshot-store crash contract.

    Edge merging via CC is idempotent, but APPENDING a replayed
    batch's blocks to the index is not, so the committed ``_VERSION``
    records the last batch_id and replays are skipped (the CM/
    FrequencySketch contract).

    State IO discipline (round-12 rework of the r11 shape, which
    read-union-OVERWROTE the whole accumulated index every batch —
    per-batch write cost O(total ingested)): the incoming block index
    is APPEND-ONLY, one parquet leaf per batch under ``inc_leaves/``,
    named by the version that commits it. Per-batch write cost is
    O(batch); a crash between leaf write and commit leaves an orphan
    leaf numbered past ``_VERSION`` that readers ignore and the replay
    overwrites. Every ``compact_every``-th leaf FOLDS the live leaves
    into itself instead (log-structured compaction, r12 verdict #8:
    append-only fixed the write cost but left the probe-side read
    growing O(#batches) file listings/opens) — the ``_VERSION`` file
    carries a third field, the leaf FLOOR, and readers union only
    leaves in (floor, version], so live-leaf count is bounded by
    ``compact_every`` for the life of the stream. The fold write is
    O(accumulated) but amortizes to O(batch x const) per batch; a
    crash mid-fold leaves the floor unmoved and the orphan fold leaf
    ignored, exactly like an ordinary leaf. Within-batch pair
    generation runs at the configured
    ``max_block`` (default the base LINK_MAX_BLOCK — the r11 1<<30
    effectively-uncapped value let one hot block go quadratic in batch
    size). The ACCUMULATED index still has no cross-batch cap: the cap
    is an index-BUILD-time property, and a production deployment
    periodically re-stages the merged corpus through fuzzy_join_blocks
    to re-impose it (at which point this resolver restarts from the
    new base) — pinned by the streamed-equals-batch-recompute test.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        base_blocks: DataFrame,
        base_labels: DataFrame | None = None,
        text_col: str = "text",
        block_col: str = "lang",
        len_col: str = "n_chars",
        prefix_len: int | None = None,
        max_dist: int | None = None,
        bucket: int | None = None,
        max_block: int | None = None,
        compact_every: int = 16,
    ):
        from databus_spark.operators import joins

        self.spark, self.root = spark, root
        self.text_col, self.block_col, self.len_col = text_col, block_col, len_col
        self.prefix_len = joins.LINK_PREFIX if prefix_len is None else prefix_len
        self.max_dist = joins.LINK_MAX_DIST if max_dist is None else max_dist
        self.bucket = joins.LINK_LEN_BUCKET if bucket is None else bucket
        self.max_block = joins.LINK_MAX_BLOCK if max_block is None else max_block
        self.compact_every = compact_every
        os.makedirs(root, exist_ok=True)
        staged = os.path.join(root, "base_blocks", "_STAGED")
        if not os.path.exists(staged):
            base_blocks.write.mode("overwrite").parquet(
                os.path.join(root, "base_blocks", "data")
            )
            # seed v1 with the base corpus's own cluster labels (the
            # staged entity state, same seed as the batch operator) —
            # without it base-internal clusters would never surface,
            # since batches only probe the index, never base vs base
            if base_labels is not None and self._version() == 0:
                vdir = os.path.join(self.root, "v1")
                base_labels.write.mode("overwrite").parquet(
                    os.path.join(vdir, "labels")
                )
                self._commit(1, -1)
            with open(staged + ".tmp", "w") as f:
                f.write("1")
            os.replace(staged + ".tmp", staged)

    _version = StreamingDistinctCounter._version
    _last_batch = StreamingDistinctCounter._last_batch
    _commit = StreamingDistinctCounter._commit

    def _leaf_floor(self) -> int:
        """Compaction watermark: leaves numbered <= floor were folded
        into a later leaf and are dead (vacuum-able). Third field of
        _VERSION; absent (pre-compaction state dirs) means 0."""
        p = os.path.join(self.root, "_VERSION")
        if not os.path.exists(p):
            return 0
        parts = open(p).read().split(":")
        return int(parts[2]) if len(parts) > 2 else 0

    def _commit_er(self, v: int, batch_id: int, floor: int) -> None:
        tmp = os.path.join(self.root, "_VERSION.tmp")
        with open(tmp, "w") as f:
            f.write(f"{v}:{batch_id}:{floor}")
        os.replace(tmp, os.path.join(self.root, "_VERSION"))

    def _read(self, leaf: str) -> DataFrame | None:
        v = self._version()
        if v == 0:
            return None
        return self.spark.read.parquet(os.path.join(self.root, f"v{v}", leaf))

    def labels(self) -> DataFrame:
        got = self._read("labels")
        if got is None:
            return self.spark.createDataFrame(
                [], "doc_id LONG, cluster_id LONG, is_survivor BOOLEAN"
            )
        return got

    def _inc_leaf_dirs(self) -> list[str]:
        """LIVE committed incoming-index leaves: leaf numbers in
        (floor, version] — an orphan leaf from a crash-before-commit is
        numbered past the version and ignored until its replay
        overwrites it; leaves at or below the compaction floor were
        folded into a later leaf and are skipped (then vacuumed)."""
        d = os.path.join(self.root, "inc_leaves")
        v = self._version()
        floor = self._leaf_floor()
        if not os.path.isdir(d):
            return []
        return [
            os.path.join(d, name)
            for name in sorted(os.listdir(d))
            if name.startswith("leaf")
            and name[4:].isdigit()
            and floor < int(name[4:]) <= v
        ]

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from databus_spark.operators import joins
        from databus_spark.operators.dedup import dedup_clusters

        if batch_id <= self._last_batch():
            return  # replay: appending its blocks again would duplicate the index
        kw = dict(
            text_col=self.text_col,
            block_col=self.block_col,
            len_col=self.len_col,
            prefix_len=self.prefix_len,
            bucket=self.bucket,
        )
        base_blocks = self.spark.read.parquet(
            os.path.join(self.root, "base_blocks", "data")
        )
        leaves = self._inc_leaf_dirs()
        probe_index = (
            base_blocks
            if not leaves
            else base_blocks.unionByName(self.spark.read.parquet(*leaves))
        )
        cross = joins.fuzzy_join_incremental(
            batch, base_blocks=probe_index, max_dist=self.max_dist, **kw
        ).select(F.col("doc_id").alias("doc_a"), F.col("base_id").alias("doc_b"))
        within = joins.fuzzy_join_pairs(
            batch, max_dist=self.max_dist, max_block=self.max_block, **kw
        ).select("doc_a", "doc_b")
        star = (
            self.labels()
            .where(F.col("doc_id") != F.col("cluster_id"))
            .select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("doc_b"))
        )
        merged = dedup_clusters(cross.unionByName(within).unionByName(star))
        # accumulated-index rows carry the sentinel secondary key: a
        # per-batch leaf has no cross-stream population context, and
        # incremental probes always probe the sentinel leg (joins.py)
        new_inc = joins._fuzzy_blocks(
            batch, self.text_col, self.block_col, self.len_col,
            self.prefix_len, self.bucket, id_alias="base_id",
        ).select(
            "base_id", "_blk", "_pfx", "_bkt",
            F.lit(joins._LINK_SEC_NONE).alias("_sec"),
            F.lit(joins._LINK_SEC_NONE).alias("_sec2"),
        )
        v = self._version() + 1
        vdir = os.path.join(self.root, f"v{v}")
        merged.write.mode("overwrite").parquet(os.path.join(vdir, "labels"))
        # append-only: ONE leaf per batch, O(batch) bytes written — never
        # the r11 read-union-overwrite of the whole accumulated index.
        # Every compact_every-th leaf instead FOLDS the live leaves in
        # with the batch (log-structured compaction: probe-side leaf
        # count stays bounded; the fold cost amortizes over the window).
        floor = self._leaf_floor()
        if leaves and len(leaves) + 1 >= self.compact_every:
            new_inc = new_inc.unionByName(self.spark.read.parquet(*leaves))
            floor = v - 1  # everything before this fold is dead
        new_inc.write.mode("overwrite").parquet(
            os.path.join(self.root, "inc_leaves", f"leaf{v}")
        )
        self._commit_er(v, batch_id, floor)

    def vacuum(self, keep_last: int = 2) -> None:
        v = self._version()
        floor = self._leaf_floor()
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) <= v - keep_last:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        # dead leaves: folded into a later leaf by compaction
        leaf_dir = os.path.join(self.root, "inc_leaves")
        if os.path.isdir(leaf_dir):
            for name in os.listdir(leaf_dir):
                if (
                    name.startswith("leaf")
                    and name[4:].isdigit()
                    and int(name[4:]) <= floor
                ):
                    shutil.rmtree(os.path.join(leaf_dir, name), ignore_errors=True)
