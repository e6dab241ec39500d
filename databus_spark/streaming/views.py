"""Incrementally-maintained aggregate views over the snapshot.

A consumer of the reference that wants "orders per customer, live"
re-aggregates from scratch or hand-rolls delta math. Here it's an
engine operator: after each merged micro-batch, ONLY the groups whose
keys appeared in the batch are recomputed from the snapshot and
upserted into the view store — work per batch is O(touched groups),
not O(all groups).

Delete handling: a DELETE event carries no payload, so its group is
unknown from the batch alone; the maintainer captures the affected
groups from the PRE-merge store state (semi-join on the batch keys)
and unions them with the groups named in the batch. Groups left empty
after the merge get tombstones in the view (so the view is exact, not
merely eventually-consistent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from databus_spark.store.snapshot import ParquetSnapshotStore
from databus_spark.streaming.applier import StreamingApplier


class ViewMaintainingApplier(StreamingApplier):
    """StreamingApplier that also maintains a grouped-aggregate view."""

    def __init__(
        self,
        store: ParquetSnapshotStore,
        view_store: ParquetSnapshotStore,
        group_col: str,
        agg_exprs: Sequence[Column],
        **kwargs,
    ) -> None:
        super().__init__(store, **kwargs)
        if tuple(view_store.key_cols) != ("key_str",):
            raise ValueError(
                "ViewMaintainingApplier requires view_store key_cols=('key_str',): "
                "view rows are keyed by the stringified group value only and carry "
                f"no 'source' column (got {tuple(view_store.key_cols)}); construct "
                "the view store with ParquetSnapshotStore(..., key_cols=('key_str',))"
            )
        self.view_store = view_store
        self.group_col = group_col
        self.agg_exprs = list(agg_exprs)
        self.groups_refreshed: list[int] = []

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if self.subscription is not None:
            batch = batch.where(self.subscription)
        batch = batch.localCheckpoint(eager=True)
        if batch.count() == 0:
            return

        # groups touched: named in the batch ∪ owned by the batch's keys pre-merge
        named = batch.select(self.group_col).where(F.col(self.group_col).isNotNull())
        pre = self.store.read()
        if pre is not None:
            keys = batch.select(*self.store.key_cols).distinct()
            owned = pre.join(keys, list(self.store.key_cols), "left_semi").select(
                self.group_col
            )
            named = named.unionByName(owned)
        touched = named.distinct().localCheckpoint(eager=True)

        super().apply_batch(batch, epoch_id)

        # recompute ONLY the touched groups from the post-merge snapshot
        post = self.store.read()
        fresh = (
            post.join(touched, self.group_col)
            .groupBy(self.group_col)
            .agg(*self.agg_exprs)
        )
        # groups that vanished -> tombstones in the view
        gone = touched.join(fresh.select(self.group_col), self.group_col, "left_anti")
        n_groups = touched.count()
        self.groups_refreshed.append(n_groups)

        epoch_scn = self.checkpoint.windowScn
        view_batch = fresh.select(
            F.col(self.group_col).cast("string").alias("key_str"),
            F.lit("UPSERT").alias("opcode"),
            F.lit(epoch_scn).alias("scn"),
            "*",
        )
        if gone.limit(1).count() > 0:
            gone_rows = gone.select(
                F.col(self.group_col).cast("string").alias("key_str"),
                F.lit("DELETE").alias("opcode"),
                F.lit(epoch_scn).alias("scn"),
                F.col(self.group_col),
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in view_batch.schema.fields
                    if f.name not in ("key_str", "opcode", "scn", self.group_col)
                ],
            )
            view_batch = view_batch.unionByName(gone_rows, allowMissingColumns=True)
        self.view_store.merge(view_batch)

    def view(self) -> DataFrame | None:
        out = self.view_store.read()
        if out is None:
            return None
        return out.drop("key_str", "opcode", "scn")
