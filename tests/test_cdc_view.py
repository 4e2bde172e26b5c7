"""Incremental materialized-view maintenance (cdc/view.py): the view
advanced by change-feed deltas must EXACTLY equal a from-scratch
groupBy of the table's live state at every sync point — through
inserts, updates, deletes, MOR + COW commits, compaction, and
maintenance-only ranges.  SUM/COUNT retraction algebra over lsn (a
long) keeps the equality integer-exact.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from fec_cn_support_etl_spark.cdc import events as ev
from fec_cn_support_etl_spark.cdc import runner
from fec_cn_support_etl_spark.cdc.table import LakeTable
from fec_cn_support_etl_spark.cdc.view import IncrementalAggView, ViewStale

EPOCHS = 6


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("view-wal"))
    df = ev.gen_change_events(
        spark, 6000, n_repos=15, n_paths=50, epochs=EPOCHS, hot_fraction=0.3,
        delete_ratio=0.1, seed=21, partitions=4,
    )
    ev.write_wal(df, d)
    return d


def _recompute(t: LakeTable) -> pd.DataFrame:
    return (
        t.read()
        .groupBy("lang")
        .agg({"*": "count", "lsn": "sum"})
        .toPandas()
        .rename(columns={"count(1)": "n_rows", "sum(lsn)": "sum_lsn"})
        .sort_values("lang")
        .reset_index(drop=True)[["lang", "n_rows", "sum_lsn"]]
    )


def _view_pd(v: IncrementalAggView) -> pd.DataFrame:
    return (
        v.read().toPandas().sort_values("lang").reset_index(drop=True)[["lang", "n_rows", "sum_lsn"]]
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_view_tracks_table_through_incremental_epochs(spark, wal, tmp_path, mode):
    table_dir = str(tmp_path / f"lake-{mode}")
    # epochs 0-1, build the view
    runner.replay(spark, wal, table_dir, n_buckets=16, mode=mode, stop_after=2, log=lambda *_: None)
    t = LakeTable(spark, table_dir)
    v = IncrementalAggView(spark, t, str(tmp_path / f"view-{mode}"), ["lang"], ["lsn"])
    v.create()
    pd.testing.assert_frame_equal(_view_pd(v), _recompute(t), check_dtype=False)

    # epochs 2-3 -> delta refresh
    runner.replay(spark, wal, table_dir, n_buckets=16, mode=mode, stop_after=2, log=lambda *_: None)
    r = v.refresh()
    assert not r["noop"] and r["changed_groups"] > 0
    pd.testing.assert_frame_equal(_view_pd(v), _recompute(t), check_dtype=False)

    # epochs 4-5 (delete-heavy tail) -> second delta refresh
    runner.replay(spark, wal, table_dir, n_buckets=16, mode=mode, stop_after=2, log=lambda *_: None)
    v.refresh()
    pd.testing.assert_frame_equal(_view_pd(v), _recompute(t), check_dtype=False)

    # refresh at head is a pure no-op
    assert v.refresh()["noop"] is True


def test_view_survives_compaction_only_range(spark, wal, tmp_path):
    table_dir = str(tmp_path / "lake-c")
    runner.replay(spark, wal, table_dir, n_buckets=16, mode="mor", log=lambda *_: None)
    t = LakeTable(spark, table_dir)
    v = IncrementalAggView(spark, t, str(tmp_path / "view-c"), ["lang"], ["lsn"])
    v.create()
    before = v.synced_version()
    snap = t.compact(max_files=1)
    assert snap is not None and snap.version > before
    r = v.refresh()  # range holds only the compaction commit
    assert r["changed_groups"] == 0
    assert v.synced_version() == snap.version
    pd.testing.assert_frame_equal(_view_pd(v), _recompute(t), check_dtype=False)


def test_view_stale_after_vacuum_raises(spark, wal, tmp_path):
    table_dir = str(tmp_path / "lake-v")
    runner.replay(spark, wal, table_dir, n_buckets=16, stop_after=3, log=lambda *_: None)
    t = LakeTable(spark, table_dir)
    v = IncrementalAggView(spark, t, str(tmp_path / "view-v"), ["lang"], ["lsn"])
    v.create()
    runner.replay(spark, wal, table_dir, n_buckets=16, stop_after=3, log=lambda *_: None)
    t.vacuum(keep_last=1)  # trims the synced snapshot out of history
    with pytest.raises(ViewStale):
        v.refresh()
    v.create()  # documented recovery: one full rebuild
    pd.testing.assert_frame_equal(_view_pd(v), _recompute(t), check_dtype=False)


def test_view_artifact_dirs_bounded(spark, wal, tmp_path):
    table_dir = str(tmp_path / "lake-b")
    runner.replay(spark, wal, table_dir, n_buckets=16, stop_after=2, log=lambda *_: None)
    t = LakeTable(spark, table_dir)
    root = str(tmp_path / "view-b")
    v = IncrementalAggView(spark, t, root, ["lang"], ["lsn"])
    v.create()
    for _ in range(2):
        runner.replay(spark, wal, table_dir, n_buckets=16, stop_after=2, log=lambda *_: None)
        v.refresh()
    vdirs = [d for d in os.listdir(root) if d.startswith("v")]
    assert len(vdirs) <= 2
