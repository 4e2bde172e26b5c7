"""Streaming-mode CDC: foreachBatch micro-batches over the WAL dir must
produce the same final table state as the batch replay, and restarting
the stream must be a no-op (checkpoint + manifest)."""

from __future__ import annotations

import pytest

from fec_cn_support_etl_spark.cdc import events as ev
from fec_cn_support_etl_spark.cdc import runner
from fec_cn_support_etl_spark.cdc.table import LakeTable
from fec_cn_support_etl_spark.streaming.pipeline import stream_cdc_ingest

from test_cdc import state_digest, table_state


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("swal"))
    df = ev.gen_change_events(spark, 3000, n_repos=10, n_paths=30, epochs=3, delete_ratio=0.1, seed=13, partitions=3)
    ev.write_wal(df, d)
    return d


def test_stream_matches_batch_replay(spark, wal, tmp_path):
    batch_dir = str(tmp_path / "batch")
    runner.replay(spark, wal, batch_dir, n_buckets=8)

    stream_dir = str(tmp_path / "stream")
    table = LakeTable.create(
        spark, stream_dir, runner.TABLE_SCHEMA, key_cols=["repo", "path"], n_buckets=8
    )
    q = stream_cdc_ingest(spark, wal, table, str(tmp_path / "ckpt"))
    q.awaitTermination()

    assert state_digest(table_state(spark, stream_dir)) == state_digest(table_state(spark, batch_dir))


def test_stream_restart_is_noop(spark, wal, tmp_path):
    stream_dir = str(tmp_path / "stream")
    table = LakeTable.create(spark, stream_dir, runner.TABLE_SCHEMA, key_cols=["repo", "path"], n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    q = stream_cdc_ingest(spark, wal, table, ckpt)
    q.awaitTermination()
    v1 = LakeTable(spark, stream_dir).current_snapshot().version
    d1 = state_digest(table_state(spark, stream_dir))
    # restart with the same checkpoint: no new files -> no batches
    q2 = stream_cdc_ingest(spark, wal, table, ckpt)
    q2.awaitTermination()
    assert LakeTable(spark, stream_dir).current_snapshot().version == v1
    assert state_digest(table_state(spark, stream_dir)) == d1
