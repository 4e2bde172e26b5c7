"""Incremental SCD Type-2 maintenance over the CDC change feed.

The batch twin (plans/catalog.py::scd2_dimension_history) rebuilds the
whole history from the full change log every time; at 100 TB the log is
unbounded, so the real pipeline must maintain the history *epoch by
epoch* touching only the keys that changed. This module is that path:

- ``history``  LakeTable keyed by ``(key, valid_from_lsn)`` — one row
  per dimension version. Closing a version is an LWW *update* of its
  row (same key, higher ``op_lsn``), so MOR append economics apply:
  an epoch writes O(changed versions), never rewrites closed history.
- ``current``  LakeTable keyed by ``key`` — the open version per key.
  It exists purely as the *index* for the open-row lookup: history is
  bucketed by (key, valid_from_lsn), so "the open row of key k" cannot
  be bucket-pruned there, while ``current.read_keys(batch keys)`` plans
  a scan over only the buckets the batch's keys hash into.

Epoch algebra (all one window spec, one shuffle on ``key``):
1. collapse no-op changes *within* the batch (lag() IS DISTINCT FROM);
2. look up open rows for the batch's keys (bucket-pruned point reads);
3. collapse the *boundary* no-op (first surviving change equal to the
   open row's attribute);
4. surviving changes become versions ``open.version_n + row_number``
   with LSN validity chained by lead(); the previously-open row is
   re-emitted closed (``valid_to_lsn = first surviving lsn``).

Invariant (pinned in tests/test_scd2.py): for ANY split of the change
log into LSN-ordered epochs, ``history.read()`` equals the from-scratch
batch build. Idempotent per epoch via the lake manifest; both COW and
MOR commit modes supported.

Reference analog: the latest-image merge of scripts/merge_support.py,
widened from "keep last row per key" to full Type-2 version history.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .table import BUCKET_COL, LakeTable, bucket_expr, resolve_lww

#: canonical change-feed columns: business key, monotone LSN, tracked
#: attribute, change timestamp. Callers select/alias into this shape.
CHANGE_COLS = ["key", "lsn", "attr", "ts"]


def _history_schema(key_t: T.DataType, attr_t: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("key", key_t),
            T.StructField("valid_from_lsn", T.LongType()),
            T.StructField("valid_to_lsn", T.LongType()),
            T.StructField("version_n", T.LongType()),
            T.StructField("attr", attr_t),
            T.StructField("effective_from", T.TimestampType()),
            T.StructField("is_current", T.BooleanType()),
            T.StructField("op_lsn", T.LongType()),
        ]
    )


def _current_schema(key_t: T.DataType, attr_t: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("key", key_t),
            T.StructField("lsn", T.LongType()),
            T.StructField("attr", attr_t),
            T.StructField("version_n", T.LongType()),
            T.StructField("valid_from_lsn", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )


@dataclass
class Scd2Result:
    epoch: str
    skipped: bool = False


class Scd2History:
    """A pair of LakeTables maintaining an SCD2 dimension incrementally."""

    def __init__(self, spark: SparkSession, history: LakeTable, current: LakeTable):
        self.spark = spark
        self.history = history
        self.current = current

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        key_type: T.DataType = T.LongType(),
        attr_type: T.DataType = T.StringType(),
        n_buckets: int = 16,
    ) -> "Scd2History":
        hist = LakeTable.create(
            spark,
            f"{root}/history",
            _history_schema(key_type, attr_type),
            key_cols=["key", "valid_from_lsn"],
            n_buckets=n_buckets,
            # a close-out re-emits the version row with op_lsn = the
            # closing change's LSN (> its valid_from_lsn), so LWW by
            # op_lsn always prefers the closed image over the open one
            order_cols=["op_lsn"],
        )
        cur = LakeTable.create(
            spark,
            f"{root}/current",
            _current_schema(key_type, attr_type),
            key_cols=["key"],
            n_buckets=n_buckets,
            order_cols=["lsn"],
        )
        return cls(spark, hist, cur)

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "Scd2History":
        return cls(spark, LakeTable(spark, f"{root}/history"), LakeTable(spark, f"{root}/current"))

    # ------------------------------------------------------------ apply
    def apply(self, changes: DataFrame, epoch: str, mode: str = "mor") -> Scd2Result:
        """Apply one LSN-ordered epoch of changes (columns CHANGE_COLS).

        Epochs must be applied in LSN order (the runner's contract, as
        for cdc/engine.py); re-delivery of an applied epoch is a no-op
        via the manifest of each table independently, so a crash
        between the two commits heals on replay.
        """
        epoch = str(epoch)
        if self.history.is_applied(epoch) and self.current.is_applied(epoch):
            return Scd2Result(epoch=epoch, skipped=True)

        w = Window.partitionBy("key").orderBy("lsn")
        batch = (
            changes.select(*CHANGE_COLS)
            .withColumn("_prev", F.lag("attr").over(w))
            .filter(~F.col("attr").eqNullSafe(F.col("_prev")))
            .drop("_prev")
        )
        open_rows = self.current.read_keys(batch.select("key").distinct()).select(
            "key",
            F.col("attr").alias("open_attr"),
            F.col("version_n").alias("open_version"),
            F.col("valid_from_lsn").alias("open_from"),
            F.col("ts").alias("open_ts"),
        )
        # the batch is epoch-sized; the open rows are |batch keys|-sized
        # — both tiny next to the table, so this join broadcasts (AQE);
        # the boundary no-op drop then re-ranks under the SAME window
        # spec (one sort, reused)
        surv = (
            batch.join(open_rows, "key", "left")
            .withColumn("_rn", F.row_number().over(w))
            .filter(~((F.col("_rn") == 1) & F.col("attr").eqNullSafe(F.col("open_attr"))))
            .select(
                "key",
                "lsn",
                "attr",
                "ts",
                "open_attr",
                "open_version",
                "open_from",
                "open_ts",
                F.row_number().over(w).alias("rn"),
                F.lead("lsn").over(w).alias("next_lsn"),
            )
        )
        surv = surv.localCheckpoint(eager=True)  # two consumers below; compute once

        base_v = F.coalesce(F.col("open_version"), F.lit(0))
        new_rows = surv.select(
            "key",
            F.col("lsn").alias("valid_from_lsn"),
            F.col("next_lsn").alias("valid_to_lsn"),
            (base_v + F.col("rn")).cast("long").alias("version_n"),
            "attr",
            F.col("ts").alias("effective_from"),
            F.col("next_lsn").isNull().alias("is_current"),
            F.coalesce("next_lsn", "lsn").alias("op_lsn"),
        )
        closeouts = surv.filter((F.col("rn") == 1) & F.col("open_from").isNotNull()).select(
            "key",
            F.col("open_from").alias("valid_from_lsn"),
            F.col("lsn").alias("valid_to_lsn"),
            F.col("open_version").alias("version_n"),
            F.col("open_attr").alias("attr"),
            F.col("open_ts").alias("effective_from"),
            F.lit(False).alias("is_current"),
            F.col("lsn").alias("op_lsn"),
        )
        hist_upserts = new_rows.unionByName(closeouts)
        cur_upserts = surv.filter(F.col("next_lsn").isNull()).select(
            "key",
            "lsn",
            "attr",
            (base_v + F.col("rn")).cast("long").alias("version_n"),
            F.col("lsn").alias("valid_from_lsn"),
            "ts",
        )
        _commit_upserts(self.history, hist_upserts, epoch, mode=mode)
        _commit_upserts(self.current, cur_upserts, epoch, mode=mode)
        return Scd2Result(epoch=epoch)

    # ------------------------------------------------------------- read
    def read(self) -> DataFrame:
        """The full SCD2 dimension (history rows; open versions carry
        ``is_current = true``), without the op_lsn bookkeeping column."""
        return self.history.read().drop("op_lsn")


def _commit_upserts(table: LakeTable, upserts: DataFrame, epoch: str, mode: str = "mor") -> None:
    """Generic keyed-upsert commit for any LakeTable: full-row images
    resolve LWW by the table's order_cols. COW rewrites the touched
    buckets' final state; MOR appends the upserts as delta files
    (O(batch) write, read-time resolution — the incremental-economics
    path). Unlike engine.apply_epoch this is schema-agnostic: no WAL
    ``op`` column, no tombstones — SCD2 never deletes history."""
    snap = table.current_snapshot()
    if snap.is_applied(epoch):
        return
    bexpr = bucket_expr(snap.key_cols, snap.n_buckets)
    up = upserts.withColumn(BUCKET_COL, bexpr)
    if mode == "mor":
        table.commit_append_delta(up, None, epoch, base_snap=snap)
        return
    touched = sorted(r[0] for r in upserts.select(bexpr.alias("b")).distinct().collect())
    if not touched:
        table.commit_merge(up, [], epoch, base_snap=snap)
        return
    base = table.read(snap=snap, buckets=touched).withColumn(BUCKET_COL, bexpr)
    merged = resolve_lww(base.unionByName(up), snap.key_cols, snap.order_cols)
    table.commit_merge(merged, touched, epoch, base_snap=snap)
