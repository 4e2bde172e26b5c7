"""Lineage / metrics emission: one row per applied epoch (+ the
per-bucket lineage embedded in each snapshot), appended to a parquet
metrics table so operators can query ingest health with the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.StringType()),
        T.StructField("skipped", T.BooleanType()),
        T.StructField("n_keys", T.LongType()),
        T.StructField("n_upserts", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("min_lsn", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("touched_buckets", T.LongType()),
        T.StructField("apply_sec", T.DoubleType()),
        T.StructField("snapshot", T.LongType()),
    ]
)


# per-partition (hash bucket) lineage: event LSN ranges + row counts,
# one row per (epoch, bucket) — the north rule's per-partition lineage.
# Lives under ``<metrics_dir>/_buckets``: the underscore prefix makes
# Hadoop's listing skip it, so reads of the epoch table at the root
# never mix in bucket rows.
BUCKET_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_keys", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("min_lsn", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("snapshot", T.LongType()),
    ]
)


def write_epoch_metrics(spark: SparkSession, metrics_dir: str, res, bucket_stats=None) -> None:
    row = [
        (
            res.epoch,
            res.skipped,
            res.n_keys,
            res.n_upserts,
            res.n_deletes,
            res.min_lsn,
            res.max_lsn,
            res.touched_buckets,
            res.apply_sec,
            res.snapshot,
        )
    ]
    spark.createDataFrame(row, METRICS_SCHEMA).coalesce(1).write.mode("append").parquet(metrics_dir)
    if bucket_stats:
        import os

        brows = [
            (
                res.epoch,
                int(r["__bucket"]),
                int(r["n_keys"]),
                int(r["n_deletes"] or 0),
                int(r["min_lsn"]) if r["min_lsn"] is not None else None,
                int(r["max_lsn"]) if r["max_lsn"] is not None else None,
                res.snapshot,
            )
            for r in bucket_stats
        ]
        spark.createDataFrame(brows, BUCKET_METRICS_SCHEMA).coalesce(1).write.mode("append").parquet(
            os.path.join(metrics_dir, "_buckets")
        )


def read_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    return spark.read.schema(METRICS_SCHEMA).parquet(metrics_dir)


def read_bucket_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    import os

    return spark.read.schema(BUCKET_METRICS_SCHEMA).parquet(os.path.join(metrics_dir, "_buckets"))
