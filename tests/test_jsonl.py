"""JSONL source/sink: roundtrip fidelity, malformed-line handling,
file sizing, and no-inference-job reads."""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fec_cn_support_etl_spark.sources.jsonl import read_jsonl, write_jsonl

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_jsonl_roundtrip_fidelity(spark, tmp_path):
    """Unicode, embedded quotes/newlines-in-strings, nulls survive a
    write->read cycle bit-for-bit."""
    rows = [
        (1, 'plain ascii', "en"),
        (2, 'quote " backslash \\ tab\tend', "en"),
        (3, "unicode é中文 \U0001f600", "zh"),
        (4, None, None),
        (5, "newline \n inside", "en"),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = str(tmp_path / "docs")
    write_jsonl(df, out, compression=None)
    back = read_jsonl(spark, out, DOC_SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_jsonl_drops_malformed_lines_deterministically(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
        "{not json at all",
        json.dumps({"doc_id": 2, "text": "also ok", "lang": "de"}),
        '{"doc_id": "NOT_A_NUMBER", "text": "bad type", "lang": "en"}',
    ]
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    got = read_jsonl(spark, str(p), DOC_SCHEMA).collect()
    assert sorted(r.doc_id for r in got) == [1, 2]
    kept = read_jsonl(spark, str(p), DOC_SCHEMA, drop_malformed=False)
    assert kept.count() == 4  # permissive keeps rows; caller opted in


def test_jsonl_write_respects_file_bounds_and_codec(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text"), F.lit("en").alias("lang")
    ).coalesce(1)
    out = str(tmp_path / "sized")
    write_jsonl(df, out, max_records_per_file=100, compression="gzip")
    files = glob.glob(os.path.join(out, "*.json.gz"))
    assert len(files) == 10  # 1000 rows / 100 per file, rolled without repartition
    with gzip.open(files[0], "rt") as fh:
        rec = json.loads(fh.readline())
    assert set(rec) == {"doc_id", "text", "lang"}
    assert read_jsonl(spark, out, DOC_SCHEMA).count() == 1000


def test_jsonl_read_runs_no_inference_job(spark, tmp_path):
    """The imposed schema must reach the scan directly — reading JSONL
    at 100 TB cannot afford Spark's inference pre-pass (a full extra
    scan). We assert no job runs at plan time."""
    out = str(tmp_path / "docs")
    write_jsonl(
        spark.createDataFrame([(1, "t", "en")], DOC_SCHEMA), out, compression=None
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = read_jsonl(spark, out, DOC_SCHEMA)  # plan only — no action
    _ = df.schema
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before
