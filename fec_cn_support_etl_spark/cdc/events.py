"""Deterministic, distributed synthetic WAL generator.

Every column is a pure function of the LSN (spark.range + JVM hash
expressions), so the generator is:
- deterministic across runs / cluster sizes (no rand(), no wall clock);
- embarrassingly parallel (no shuffle, no driver data);
- scalable to 10^10 rows by changing one argument.

Shape per BASELINE.json input_hint / FIXTURES.md §B2:
  (lsn long, op string I/U/D, repo string, path string, commit string,
   lang string, content string, epoch int [, size_bytes long from the
   schema-evolution epoch on])

Skew: repo 0 receives ``hot_fraction`` of all events (the zipf-ish hot
key demanded by the north rule); the rest spread uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "rust", "go", "markdown", "PYTHON", "Python ", "js"]


def gen_change_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 50,
    n_paths: int = 200,
    epochs: int = 8,
    hot_fraction: float = 0.3,
    delete_ratio: float = 0.05,
    evolve_from_epoch: int | None = None,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Change-event log as one lazy DataFrame, lsn = row id (dense)."""
    rng = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    lsn = F.col("id")

    # deterministic pseudo-random stream per row/slot
    def h(slot: int):
        return F.abs(F.xxhash64(F.lit(seed), F.lit(slot), lsn))

    hot_cut = int(hot_fraction * 10_000)
    repo_idx = F.when(h(0) % 10_000 < hot_cut, F.lit(0)).otherwise(h(1) % (n_repos - 1) + 1)
    path_idx = h(2) % n_paths
    op = F.when(h(3) % 10_000 < int(delete_ratio * 10_000), F.lit("D")).otherwise(
        F.when(h(4) % 3 == 0, F.lit("I")).otherwise(F.lit("U"))
    )
    epoch = (lsn * epochs / n_events).cast("int")
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (h(5) % len(LANGS) + 1).cast("int"))
    commit = F.lower(F.concat(F.lpad(F.hex(lsn), 16, "0"), F.lpad(F.hex(h(6)), 24, "0")))
    content = F.when(
        op == "D", F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            F.lit("// repo="), repo_idx.cast("string"),
            F.lit(" path="), path_idx.cast("string"),
            F.lit(" rev="), lsn.cast("string"), F.lit("\n"),
            F.repeat(F.concat(F.lit("line-"), (h(7) % 97).cast("string"), F.lit(";\n")), (h(8) % 20 + 3).cast("int")),
        )
    )
    df = rng.select(
        lsn.alias("lsn"),
        op.alias("op"),
        F.concat(F.lit("org/repo-"), repo_idx.cast("string")).alias("repo"),
        F.concat(
            F.lit("dir"), (path_idx % 10).cast("string"), F.lit("/file"), path_idx.cast("string"),
            F.element_at(F.array(F.lit(".py"), F.lit(".rs"), F.lit(".md")), (path_idx % 3 + 1).cast("int")),
        ).alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        epoch.alias("epoch"),
    )
    if evolve_from_epoch is not None:
        # schema evolution mid-stream: epochs >= evolve_from_epoch carry an
        # added column (the reference's synthesized-columns pattern,
        # scripts/merge_support.py:17-36, in reverse)
        df = df.withColumn(
            "size_bytes",
            F.when(F.col("epoch") >= evolve_from_epoch, F.length(F.coalesce(F.col("content"), F.lit(""))).cast("long")),
        )
    return df


def write_wal(df: DataFrame, wal_dir: str) -> None:
    """Materialize the WAL partitioned by epoch (one dir per epoch) —
    the tailing runner reads epoch dirs in order."""
    df.write.mode("overwrite").partitionBy("epoch").parquet(wal_dir)
