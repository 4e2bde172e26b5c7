"""Loaders for the driver-generated synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.

Parquet + an imposed lazy plan means Catalyst gets column pruning and
predicate pushdown for free; loaders deliberately do NOT cache or
collect anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan UP to the session's default
    parallelism — only when the scan is under-partitioned.

    Why (round 7, guide §2.5 "input skew"): the driver fixtures are one
    parquet file with one row group per table, so every scan is ONE
    task and all pre-shuffle compute (shingle hashing, regex feature
    extraction, hyperplane dot products) serializes onto a single core
    — measured 15-20 s single-threaded for the sf1.0 shingle stage on a
    32-core host. A round-robin exchange of the (small) scan output
    unlocks the other cores for ~100x more downstream compute.

    Scale-adaptive by construction: when the input already has >=
    parallelism splits (any real table at cluster scale), this returns
    the plan UNCHANGED — no shuffle is added, so it cannot regress the
    100 TB case where re-shuffling raw text/vectors would be the bug.
    Deterministic: Spark's sort-before-repartition (SPARK-23207, on by
    default) makes the row->partition assignment reproducible, and no
    downstream result depends on partitioning (aggregates are exact-
    decimal/associative, windows totally ordered, set results hashed
    order-insensitively).
    """
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)
