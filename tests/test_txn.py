"""Coordinated multi-table publish (cdc/txn.py): the manifest is the
commit point — before it nothing is visible anywhere; after it every
member table's publish completes, across crashes, idempotently.  What
is NOT claimed (and therefore not tested): cross-table snapshot
isolation during the publish window (see the module docstring)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fec_cn_support_etl_spark.cdc.table import BUCKET_COL, CommitConflict, LakeTable, bucket_expr
from fec_cn_support_etl_spark.cdc.txn import (
    MultiTableTransaction,
    _publish_entry,
    _write_manifest,
    recover,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("lsn", T.LongType()),
    ]
)


def _mk_table(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["id"], n_buckets=2, order_cols=["lsn"])
    df = (
        spark.range(10)
        .select(F.col("id"), F.lit("base").alias("v"), F.col("id").alias("lsn"))
        .withColumn(BUCKET_COL, bucket_expr(["id"], 2))
    )
    t.commit_merge(df, [0, 1], epoch="seed")
    return t


def _epoch_df(spark, tag):
    return (
        spark.range(10)
        .select(F.col("id"), F.lit(tag).alias("v"), (F.col("id") + 100).alias("lsn"))
        .withColumn(BUCKET_COL, bucket_expr(["id"], 2))
    )


def test_commit_publishes_all_tables(spark, tmp_path):
    a = _mk_table(spark, str(tmp_path / "a"))
    b = _mk_table(spark, str(tmp_path / "b"))
    txn = MultiTableTransaction(spark, str(tmp_path / "txns"))
    txn.stage(a, _epoch_df(spark, "e1a"), [0, 1], epoch="e1")
    txn.stage(b, _epoch_df(spark, "e1b"), [0, 1], epoch="e1")
    # nothing visible before commit
    assert a.read().filter(F.col("v") == "e1a").count() == 0
    r = txn.commit()
    assert r["results"] == ["published", "published"]
    assert a.read().filter(F.col("v") == "e1a").count() == 10
    assert b.read().filter(F.col("v") == "e1b").count() == 10
    assert a.list_staged() == [] and b.list_staged() == []
    doc = json.load(open(tmp_path / "txns" / f"txn-{r['txn_id']}.json"))
    assert doc["state"] == "committed"
    # recover over a committed manifest is a no-op
    assert recover(spark, str(tmp_path / "txns"))[0]["action"] == "none"


def test_crash_mid_publish_rolls_forward(spark, tmp_path):
    a = _mk_table(spark, str(tmp_path / "a"))
    b = _mk_table(spark, str(tmp_path / "b"))
    txn = MultiTableTransaction(spark, str(tmp_path / "txns"), txn_id="crash1")
    txn.stage(a, _epoch_df(spark, "e1a"), [0, 1], epoch="e1")
    txn.stage(b, _epoch_df(spark, "e1b"), [0, 1], epoch="e1")
    # simulate commit() crashing after the manifest write + first publish
    _write_manifest(str(tmp_path / "txns"), "crash1", {"state": "pending", "tables": txn._entries})
    assert _publish_entry(spark, txn._entries[0]) == "published"
    assert a.read().filter(F.col("v") == "e1a").count() == 10
    assert b.read().filter(F.col("v") == "e1b").count() == 0  # the torn window

    rec = recover(spark, str(tmp_path / "txns"))
    assert rec == [{"txn_id": "crash1", "state": "committed", "action": ["already", "published"]}]
    assert b.read().filter(F.col("v") == "e1b").count() == 10
    # idempotent: a second recover touches nothing
    assert recover(spark, str(tmp_path / "txns"))[0]["action"] == "none"


def test_abort_leaves_no_trace(spark, tmp_path):
    a = _mk_table(spark, str(tmp_path / "a"))
    txn = MultiTableTransaction(spark, str(tmp_path / "txns"))
    txn.stage(a, _epoch_df(spark, "e1a"), [0, 1], epoch="e1")
    txn.abort()
    assert a.list_staged() == []
    assert a.read().filter(F.col("v") == "e1a").count() == 0
    with pytest.raises(RuntimeError):
        txn.commit()


def test_foreign_commit_fails_fast_before_visibility(spark, tmp_path):
    a = _mk_table(spark, str(tmp_path / "a"))
    b = _mk_table(spark, str(tmp_path / "b"))
    txn = MultiTableTransaction(spark, str(tmp_path / "txns"))
    txn.stage(a, _epoch_df(spark, "e1a"), [0, 1], epoch="e1")
    txn.stage(b, _epoch_df(spark, "e1b"), [0, 1], epoch="e1")
    # a foreign writer advances table b between stage and commit
    b.commit_merge(_epoch_df(spark, "foreign"), [0, 1], epoch="foreign")
    with pytest.raises(CommitConflict, match="re-stage"):
        txn.commit()
    # fail-fast means NOTHING became visible and no pending manifest exists
    assert a.read().filter(F.col("v") == "e1a").count() == 0
    assert not os.path.isdir(tmp_path / "txns") or not os.listdir(tmp_path / "txns")


def test_stage_rejects_duplicate_table_root(spark, tmp_path):
    """ADVICE r6: staging the same table twice records the same
    base_version twice, so the second publish would deterministically
    conflict AFTER the commit point; reject at stage time instead."""
    a = _mk_table(spark, str(tmp_path / "dup-a"))
    txn = MultiTableTransaction(spark, str(tmp_path / "dup-txns"))
    txn.stage(a, _epoch_df(spark, "e1a"), [0, 1], epoch="e1")
    with pytest.raises(ValueError, match="already staged"):
        txn.stage(a, _epoch_df(spark, "e2a"), [0, 1], epoch="e2")


def test_recover_skips_poisoned_manifest_and_continues(spark, tmp_path):
    """ADVICE r6: one pending manifest whose entry hits CommitConflict
    (staged snapshot discarded out-of-band) must not abort recovery of
    every later pending manifest; it is reported 'stuck' and left
    pending, the healthy manifest still rolls forward."""
    a = _mk_table(spark, str(tmp_path / "po-a"))
    b = _mk_table(spark, str(tmp_path / "po-b"))
    txn_dir = str(tmp_path / "po-txns")

    # poisoned txn (sorts first): entry points at a staged snapshot
    # that was discarded outside the transaction
    bad = MultiTableTransaction(spark, txn_dir, txn_id="000bad")
    bad.stage(a, _epoch_df(spark, "bad"), [0, 1], epoch="e9")
    a.discard_staged(bad._entries[0]["name"])
    _write_manifest(txn_dir, "000bad", {"state": "pending", "tables": bad._entries})

    # healthy txn (sorts second): manifest written but never published
    ok = MultiTableTransaction(spark, txn_dir, txn_id="111ok")
    ok.stage(b, _epoch_df(spark, "okv"), [0, 1], epoch="e9")
    _write_manifest(txn_dir, "111ok", {"state": "pending", "tables": ok._entries})

    report = {r["txn_id"]: r for r in recover(spark, txn_dir)}
    assert report["000bad"]["state"] == "stuck"
    assert "error" in report["000bad"]
    assert report["111ok"]["state"] == "committed"
    # the healthy table's epoch is visible; the stuck manifest stays
    # pending on disk for the operator
    assert b.read().filter(F.col("v") == "okv").count() == 10
    doc = json.load(open(os.path.join(txn_dir, "txn-000bad.json")))
    assert doc["state"] == "pending"
