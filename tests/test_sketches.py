"""approx_distinct_hll: prove the ±5% oracle bound has real margin.

The catalog query emits ``sketch_ok`` = both HLL estimates within ±5%
of exact; the DuckDB oracle asserts a literal TRUE. That is only
engine-stable if the actual estimator error sits well inside the bound
— pinned here at <2% for both the HLL++ path (rsd=0.02) and the
merged per-day Datasketches path (lgConfigK=14), on the largest local
fixture. Determinism (partitioning invariance) is pinned by re-running
under a different shuffle partitioning.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fec_cn_support_etl_spark.plans import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _estimates(spark):
    ev = catalog._t(spark, SF_DIR, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_merged")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("n_hllpp"),
    )
    return {
        r["event_type"]: (r["n_exact"], r["n_hllpp"], r["n_merged"])
        for r in exact.join(merged, "event_type").collect()
    }


def test_hll_error_well_inside_oracle_bound(spark):
    rows = _estimates(spark)
    assert rows
    for et, (n_exact, n_hllpp, n_merged) in rows.items():
        assert n_exact > 0
        assert abs(n_hllpp - n_exact) < 0.02 * n_exact, (et, n_exact, n_hllpp)
        assert abs(n_merged - n_exact) < 0.02 * n_exact, (et, n_exact, n_merged)


def test_hll_partitioning_invariant(spark):
    base = _estimates(spark)
    ev = catalog._t(spark, SF_DIR, "events").repartition(7, "event_id")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_merged")
    )
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("n_hllpp")
    )
    got = {
        r["event_type"]: (r["n_hllpp"], r["n_merged"])
        for r in approx.join(merged, "event_type").collect()
    }
    for et, (n_exact, n_hllpp, n_merged) in base.items():
        assert got[et] == (n_hllpp, n_merged), et
