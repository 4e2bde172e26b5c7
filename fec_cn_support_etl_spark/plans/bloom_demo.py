"""Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter).

The 100-TB star-join gap the round-5 audit flagged: q9/q21-shape joins
scan the full fact side even when the dim side is selectively filtered,
because the dim is broadcast (broadcast hash join filters during the
probe, but the fact SCAN still reads every row group).  When the dim
side is too large to broadcast — routine at warehouse scale — Spark can
build a bloom filter over the filtered dim keys at runtime and push a
``might_contain`` predicate into the fact side BEFORE its shuffle, so
non-matching fact rows never cross the wire (and, with parquet
row-group bloom/min-max locality, often never leave the scan).

Spark only injects the filter when its thresholds say the fact side is
big enough to be worth it (``applicationSideScanSizeThreshold`` defaults
to 10GB), so at test scale the demo scopes the thresholds down with a
save/restore context manager instead of mutating the session — plans
elsewhere in the same session are untouched.  Results are identical
with or without the filter (it is pure pruning); the plan-quality gate
pins the ``might_contain`` lands on the fact side, and
scripts/bench_bloom.py records the shuffle-volume and wall-time delta
in BENCH.md.

Reference parity: the reference's enrichment merges
(scripts/merge_support.py:192-240, pandas key-joins against the
candidate universe) are broadcast-scale lookups; this demo covers the
scale regime past broadcast, where a single-process merge would not
run at all.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import dec, money

#: thresholds that let InjectRuntimeFilter fire at local test scale;
#: production clusters keep Spark's defaults (10GB application side).
#: autoBroadcastJoinThreshold=-1 pins the past-broadcast regime the
#: demo is about — Spark does NOT inject a bloom under a broadcast
#: join (the build side already filters the probe), and an explicit
#: shuffle_hash HINT also suppresses injection (measured; the
#: optimizer keys on the size-based strategy), so the regime must be
#: expressed through the threshold, exactly as a real oversized dim
#: would express it.
BLOOM_DEMO_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "64MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def scoped_confs(spark: SparkSession, confs: dict[str, str]):
    """Set confs for the duration of a block, restoring previous values
    (or unsetting) on exit — runtime-filter injection happens at
    optimization time, so the block must cover the ACTION, not just the
    DataFrame construction."""
    old: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


def promo_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The demo join: revenue per brand over PROMO-type parts (~1/6 of
    part).  No join hints — the size threshold/AQE picks the strategy
    (q3's discipline: a hard-coded hint would be wrong at some scale,
    and a hint also suppresses runtime-filter injection).  Run inside
    ``scoped_confs(spark, BLOOM_DEMO_CONFS)`` to get the shuffle join
    plus the runtime bloom on the lineitem side."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_type").startswith("PROMO")
    ).select("p_partkey", "p_brand")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(money(F.sum(rev)).alias("revenue"), F.count("*").alias("n_items"))
    )


def has_runtime_bloom(df: DataFrame) -> bool:
    """True when the optimized plan carries a bloom might_contain
    predicate (the injected runtime filter)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "might_contain" in plan or "bloom_filter" in plan
