"""Write-audit-publish: staged commits are invisible to main-table
readers, auditable via read_staged, atomically promotable, conflict-
checked against foreign commits, discardable, and vacuum-safe during
the audit window.  The reference ships files only after
validate_outputs.py passes (scripts/validate_outputs.py); WAP is that
discipline at the table layer (Iceberg's stage-commit/branch WAP)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fec_cn_support_etl_spark.cdc.table import (
    BUCKET_COL,
    CommitConflict,
    LakeTable,
    bucket_expr,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("lsn", T.LongType()),
    ]
)

NB = 4


def _mk(spark, root, n=100):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["id"], n_buckets=NB, order_cols=["lsn"])
    t.commit_merge(_df(spark, 0, n, tag="base"), list(range(NB)), epoch="0")
    return t


def _df(spark, lo, hi, tag):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id"),
            F.concat(F.lit(tag), F.lit("-"), F.col("id")).alias("v"),
            (F.col("id") + 1000).alias("lsn"),
        )
        .withColumn(BUCKET_COL, bucket_expr(["id"], NB))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("id", "v", "lsn").collect())


def test_stage_audit_publish_roundtrip(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    v0 = t.current_snapshot().version
    main_before = _rows(t.read())
    name = t.stage_merge(_df(spark, 0, 150, tag="new"), list(range(NB)), epoch="1")
    assert t.list_staged() == [name]
    # main readers see NOTHING until publish
    assert t.current_snapshot().version == v0
    assert _rows(t.read()) == main_before
    assert not t.is_applied("1")
    # the audit surface shows the post-publish state
    staged = _rows(t.read_staged(name))
    assert len(staged) == 150 and all(r[1].startswith("new-") for r in staged)
    # audit passes -> atomic promote: version+1, epoch applied, state live
    snap = t.publish_staged(name)
    assert snap.version == v0 + 1 and t.is_applied("1")
    assert _rows(t.read()) == staged
    assert t.list_staged() == []


def test_failed_audit_discard_and_vacuum_reclaims(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    # stage a batch that an audit would reject (nulls in v)
    bad = _df(spark, 0, 50, tag="bad").withColumn(
        "v", F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(F.col("v"))
    )
    name = t.stage_merge(bad, list(range(NB)), epoch="1")
    n_null = t.read_staged(name).filter(F.col("v").isNull()).count()
    assert n_null > 0  # the audit finding
    # vacuum DURING the audit window must not eat the staged data
    t.vacuum(keep_last=1)
    # COW semantics: new_bucket_data IS the staged buckets' full state
    assert t.read_staged(name).count() == 50
    t.discard_staged(name)
    assert t.list_staged() == []
    removed = t.vacuum(keep_last=1)
    assert removed >= 1  # the staged data dir became a reclaimable orphan
    # main table never saw any of it
    assert not t.is_applied("1") and t.read().filter(F.col("v").isNull()).count() == 0


def test_publish_conflicts_with_foreign_commit(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    name = t.stage_merge(_df(spark, 0, 60, tag="staged"), list(range(NB)), epoch="1")
    # a foreign writer lands first
    t.commit_merge(_df(spark, 100, 120, tag="foreign"), list(range(NB)), epoch="2")
    with pytest.raises(CommitConflict, match="re-stage"):
        t.publish_staged(name)
    # staged entry is kept for inspection, main state is the foreign one
    assert t.list_staged() == [name]
    assert t.is_applied("2") and not t.is_applied("1")


def test_duplicate_stage_name_loses(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "lake"))
    t.stage_merge(_df(spark, 0, 10, tag="a"), [0, 1], epoch="1", name="x")
    with pytest.raises(CommitConflict, match="already exists"):
        t.stage_merge(_df(spark, 0, 10, tag="b"), [0, 1], epoch="1b", name="x")
    assert t.list_staged() == ["x"]
    assert os.path.isdir(t._staged_dir)


def test_wap_cli_spark_free_roundtrip(spark, tmp_path, capsys):
    """The staged/publish-staged/discard-staged subcommands are pure
    snapshot-JSON operations — an operator can audit-gate a publish
    from anywhere that sees the storage, no SparkSession."""
    import json as _json

    from fec_cn_support_etl_spark.cdc import table_cli

    root = str(tmp_path / "lake")
    t = _mk(spark, root)
    t.stage_merge(_df(spark, 0, 20, tag="cli"), [0, 1], epoch="9", name="wap-9")

    table_cli.main(["staged", "--table", root])
    listed = _json.loads(capsys.readouterr().out)
    assert listed[0]["name"] == "wap-9" and listed[0]["epochs"] == ["9"]

    table_cli.main(["publish-staged", "--table", root, "--name", "wap-9"])
    out = _json.loads(capsys.readouterr().out)
    assert out["snapshot"] == t.current_snapshot().version and t.is_applied("9")

    t.stage_merge(_df(spark, 0, 5, tag="z"), [0], epoch="10", name="wap-10")
    table_cli.main(["discard-staged", "--table", root, "--name", "wap-10"])
    capsys.readouterr()
    assert t.list_staged() == []
