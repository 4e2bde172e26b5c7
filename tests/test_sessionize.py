"""Stateful streaming sessionization (applyInPandasWithState) vs the
batch window-chain twin."""

from __future__ import annotations

import pandas as pd
import pytest
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
