"""Incremental SCD Type-2 maintenance (cdc/scd2.py).

The pinned invariant: for ANY split of the change log into LSN-ordered
epochs, the incrementally maintained history equals the from-scratch
batch build (the scd2_dimension_history catalog query's logic). This is
the SCD2 analog of test_mor's replay-equivalence discipline.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fec_cn_support_etl_spark.cdc.scd2 import Scd2History

SF = "/root/testdata/sf0.001"


def _changes(spark):
    """events as a canonical change feed (key, lsn, attr, ts)."""
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            F.col("user_id").alias("key"),
            F.col("event_id").alias("lsn"),
            F.col("event_type").alias("attr"),
            F.col("ts"),
        )
    )


def _batch_build(ch):
    """From-scratch SCD2 over the full log — the catalog query's logic
    on canonical column names, used as ground truth."""
    w = Window.partitionBy("key").orderBy("lsn")
    surv = (
        ch.withColumn("prev", F.lag("attr").over(w))
        .filter(~F.col("attr").eqNullSafe(F.col("prev")))
        .drop("prev")
    )
    return surv.select(
        "key",
        F.col("lsn").alias("valid_from_lsn"),
        F.lead("lsn").over(w).alias("valid_to_lsn"),
        F.row_number().over(w).cast("long").alias("version_n"),
        "attr",
        F.col("ts").alias("effective_from"),
        F.lead("lsn").over(w).isNull().alias("is_current"),
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _lsn_splits(ch, n):
    """Split the log into n LSN-ordered epochs by lsn range."""
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo + n) // n
    return [
        ch.filter((F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step))
        for i in range(n)
    ]


@pytest.mark.parametrize("n_epochs,mode", [(1, "mor"), (4, "mor"), (4, "cow"), (7, "mor")])
def test_incremental_equals_batch(spark, tmp_path, n_epochs, mode):
    ch = _changes(spark)
    t = Scd2History.create(spark, str(tmp_path / f"scd2_{n_epochs}_{mode}"))
    for i, ep in enumerate(_lsn_splits(ch, n_epochs)):
        t.apply(ep, epoch=f"e{i}", mode=mode)
    assert _rows(t.read()) == _rows(_batch_build(ch))


def test_replay_is_idempotent(spark, tmp_path):
    ch = _changes(spark)
    t = Scd2History.create(spark, str(tmp_path / "scd2_replay"))
    epochs = _lsn_splits(ch, 3)
    for i, ep in enumerate(epochs):
        t.apply(ep, epoch=f"e{i}")
    # re-deliver every epoch (crash/retry) — manifest makes them no-ops
    for i, ep in enumerate(epochs):
        res = t.apply(ep, epoch=f"e{i}")
        assert res.skipped
    assert _rows(t.read()) == _rows(_batch_build(ch))


def test_boundary_noop_collapsed(spark, tmp_path):
    """A change whose attribute equals the open version's must NOT open
    a new version, even when it arrives in a later epoch — the boundary
    twin of the within-batch lag() collapse."""
    ts = datetime.datetime(2024, 1, 1)
    e1 = spark.createDataFrame([(1, 10, "a", ts), (1, 11, "b", ts)], "key long, lsn long, attr string, ts timestamp")
    e2 = spark.createDataFrame([(1, 12, "b", ts), (1, 13, "c", ts)], "key long, lsn long, attr string, ts timestamp")
    t = Scd2History.create(spark, str(tmp_path / "scd2_noop"))
    t.apply(e1, "e1")
    t.apply(e2, "e2")
    got = {(r["version_n"], r["attr"], r["valid_from_lsn"], r["valid_to_lsn"], r["is_current"]) for r in t.read().collect()}
    # lsn 12 ('b' again) must be invisible: version 2 stays open from
    # lsn 11 until 'c' at lsn 13
    assert got == {
        (1, "a", 10, 11, False),
        (2, "b", 11, 13, False),
        (3, "c", 13, None, True),
    }


def test_current_table_tracks_open_versions(spark, tmp_path):
    ch = _changes(spark)
    t = Scd2History.create(spark, str(tmp_path / "scd2_cur"))
    for i, ep in enumerate(_lsn_splits(ch, 3)):
        t.apply(ep, epoch=f"e{i}")
    cur = t.current.read().select("key", "version_n", "attr", "valid_from_lsn")
    open_hist = t.read().filter("is_current").select("key", "version_n", "attr", "valid_from_lsn")
    assert _rows(cur) == _rows(open_hist)
    # exactly one open version per key
    assert t.read().filter("is_current").groupBy("key").count().filter("count > 1").count() == 0
