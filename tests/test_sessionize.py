"""Stateful streaming sessionization (applyInPandasWithState) vs the
batch window-chain twin."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from fec_cn_support_etl_spark.streaming.sessionize import sessionize_batch, sessionize_stream

SF = "/root/testdata/sf0.001"
GAP = "30 minutes"


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["total_value"] = out["total_value"].round(6)
    return out.sort_values(["user_id", "session_start"]).reset_index(drop=True)


def test_stream_sessions_match_batch_twin(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = canon(sessionize_batch(events, GAP).toPandas())
    streamed = canon(sessionize_stream(spark, f"{SF}/events.parquet", gap=GAP, sink_table="sess_t1").toPandas())

    assert len(batch) > len(streamed) > 0
    # streaming emits every session the batch twin finds EXCEPT sessions
    # still open at end-of-stream (held in state) and sessions closed
    # after the final watermark. Every streamed session must appear in
    # the batch result exactly.
    merged = streamed.merge(
        batch, on=["user_id", "session_start", "session_end", "n_events", "total_value"], how="left", indicator=True
    )
    assert (merged["_merge"] == "both").all(), merged[merged["_merge"] != "both"].head()
    # and streaming must have emitted the bulk of closable sessions: every
    # batch session that ended more than (gap + watermark) before the max
    # event time should be present
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = pd.Timestamp(max_ts) - pd.Timedelta("2 hours")
    closable = batch[pd.to_datetime(batch["session_end"]) < horizon]
    found = closable.merge(
        streamed, on=["user_id", "session_start", "session_end", "n_events", "total_value"], how="left", indicator=True
    )
    assert (found["_merge"] == "both").all()


def test_cross_batch_late_event_extends_session_start(spark, tmp_path):
    """maxFilesPerTrigger=1 forces one file per micro-batch: an in-gap
    event arriving in a LATER batch with ts before the open session's
    start must move session_start back (parity with the batch twin).
    Regression for the cur[0]=min(...) out-of-order fix."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "ev"
    d.mkdir()

    def wf(name, rows, mt):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([pd.Timestamp(r[2]) for r in rows], pa.timestamp("us")),
                "event_type": pa.array(["x"] * len(rows)),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
        p = str(d / name)
        pq.write_table(tbl, p)
        os.utime(p, (mt, mt))  # FileStreamSource picks oldest-first

    t0 = 1_700_000_000
    wf("f1.parquet", [(1, 1, "2024-01-01 10:00:00", 1.0), (2, 1, "2024-01-01 10:10:00", 1.0)], t0)
    # batch 2: late-but-in-gap 09:55 (must extend start) + 10:20 (extends end)
    wf("f2.parquet", [(3, 1, "2024-01-01 09:55:00", 1.0), (4, 1, "2024-01-01 10:20:00", 1.0)], t0 + 10)
    # batch 3: far-future event advances the watermark and closes the session
    wf("f3.parquet", [(5, 1, "2024-01-01 20:00:00", 1.0)], t0 + 20)

    streamed = canon(
        sessionize_stream(spark, str(d), gap=GAP, sink_table="sess_mb", max_files_per_trigger=1).toPandas()
    )
    assert len(streamed) == 1  # the 20:00 session stays open in state
    got = streamed.iloc[0]
    assert pd.Timestamp(got["session_start"]) == pd.Timestamp("2024-01-01 09:55:00")
    assert pd.Timestamp(got["session_end"]) == pd.Timestamp("2024-01-01 10:20:00")
    assert got["n_events"] == 4 and got["total_value"] == 4.0
    # and it is exactly what the batch twin computes over the same data
    batch = canon(sessionize_batch(spark.read.parquet(str(d)), GAP).toPandas())
    first = batch.iloc[0]
    assert (
        pd.Timestamp(first["session_start"]),
        pd.Timestamp(first["session_end"]),
        first["n_events"],
        first["total_value"],
    ) == (pd.Timestamp(got["session_start"]), pd.Timestamp(got["session_end"]), 4, 4.0)


def test_batch_sessions_respect_gap(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    sess = sessionize_batch(events, GAP).toPandas()
    by_user = sess[sess["user_id"] == sess["user_id"].iloc[0]].sort_values("session_start")
    prev_end = None
    for _, r in by_user.iterrows():
        if prev_end is not None:
            assert (pd.Timestamp(r["session_start"]) - prev_end) > pd.Timedelta(GAP)
        prev_end = pd.Timestamp(r["session_end"])
    assert (sess["n_events"] > 0).all()
