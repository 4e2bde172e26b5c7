"""Ingest-time expectations: drop / quarantine / fail semantics, NULL
predicates as violations, one-job counting, replay integration with
summary metrics, and quarantine replay-idempotence.  The reference's
pre-ship validation (scripts/verify_data.py) applied per batch at the
table's front door (DLT EXPECT semantics)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fec_cn_support_etl_spark.cdc.expectations import (
    VIOLATIONS_COL,
    Expectation,
    ExpectationFailed,
    apply_expectations,
)


def _batch(spark):
    # id 0..99; value NULL every 10th; lang bad every 7th
    return spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 != 0, F.col("id") * 2).alias("value"),
        F.when(F.col("id") % 7 == 0, F.lit("??")).otherwise(F.lit("en")).alias("lang"),
    )


def test_drop_and_null_predicate_semantics(spark):
    clean, m = apply_expectations(
        _batch(spark), [Expectation("value_present", "value IS NOT NULL", "drop")]
    )
    assert m["value_present"] == 10 and m["_rows_in"] == 100 and m["_rows_dropped"] == 10
    assert clean.count() == 90 and clean.filter(F.col("value").isNull()).count() == 0
    # a predicate evaluating to NULL is a violation, not a pass
    clean2, m2 = apply_expectations(
        _batch(spark), [Expectation("value_positive", "value > 0", "drop")]
    )
    got = {r[0] for r in clean2.select("id").collect()}
    # the 10 NULL-valued rows (id % 10 == 0, which includes id=0) fail
    # "value > 0" via the NULL-is-violation rule, not via comparison
    assert 0 not in got and m2["value_positive"] == 10


def test_quarantine_rows_tagged_and_idempotent(spark, tmp_path):
    qdir = str(tmp_path / "quarantine")
    rules = [
        Expectation("value_present", "value IS NOT NULL", "quarantine"),
        Expectation("lang_known", "lang <> '??'", "quarantine"),
    ]
    for _ in range(2):  # replayed epoch overwrites, never duplicates
        clean, m = apply_expectations(_batch(spark), rules, quarantine_dir=qdir, epoch="7")
        assert clean.count() == 100 - m["_rows_quarantined"]
    bad = spark.read.parquet(os.path.join(qdir, "epoch=7"))
    assert bad.count() == m["_rows_quarantined"]
    # multi-rule violators carry BOTH rule names (ids divisible by 70)
    both = bad.filter(F.array_contains(VIOLATIONS_COL, "value_present")
                      & F.array_contains(VIOLATIONS_COL, "lang_known"))
    assert {r[0] for r in both.select("id").collect()} == {0, 70}
    # rows_dropped counts each row once across rules
    assert m["_rows_dropped"] == m["_rows_quarantined"] == 10 + 15 - 2


def test_fail_action_aborts_before_write(spark):
    with pytest.raises(ExpectationFailed, match="value_present"):
        apply_expectations(
            _batch(spark), [Expectation("value_present", "value IS NOT NULL", "fail")]
        )


def test_replay_with_expectations_gates_table_and_reports(spark, tmp_path):
    from fec_cn_support_etl_spark.cdc import events as ev, runner

    wal = str(tmp_path / "wal")
    ev.write_wal(
        ev.gen_change_events(spark, 4000, n_repos=8, n_paths=20, epochs=2, seed=5, partitions=4),
        wal,
    )
    qdir = str(tmp_path / "quarantine")
    summary = runner.replay(
        spark,
        wal,
        str(tmp_path / "lake"),
        n_buckets=8,
        expectations=[
            # events fixture langs are real codes; quarantine a slice to
            # prove the plumbing end-to-end (deterministic predicate)
            Expectation("not_go", "lang <> 'go'", "quarantine"),
            Expectation("lsn_present", "lsn IS NOT NULL", "drop"),
        ],
        quarantine_dir=qdir,
        log=lambda *a: None,
    )
    assert summary["epochs_applied"] == 2
    per_epoch = summary["expectations"]
    assert set(per_epoch) == {"0", "1"}
    n_quar = sum(m["_rows_quarantined"] for m in per_epoch.values())
    assert n_quar > 0
    # the quarantined rows really exist and really are the violators
    bad = spark.read.parquet(qdir)
    assert bad.count() == n_quar and bad.filter(F.col("lang") != "go").count() == 0
    # and the table never ingested them
    from fec_cn_support_etl_spark.cdc.table import LakeTable

    t = LakeTable(spark, str(tmp_path / "lake"))
    assert t.read().filter(F.col("lang") == "go").count() == 0
    # events count in the summary reflects the gated batches
    assert summary["events"] == sum(m["_rows_in"] - m["_rows_dropped"] for m in per_epoch.values())


def test_bad_config_rejected(spark):
    with pytest.raises(ValueError, match="unknown action"):
        Expectation("x", "id > 0", "warn")
    with pytest.raises(ValueError, match="duplicate"):
        apply_expectations(_batch(spark), [Expectation("a", "id>0"), Expectation("a", "id<5")])
    with pytest.raises(ValueError, match="quarantine_dir"):
        apply_expectations(
            _batch(spark), [Expectation("value_present", "value IS NOT NULL", "quarantine")]
        )
