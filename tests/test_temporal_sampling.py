"""as-of join, binned range join, deterministic sampling: unit +
reference-implementation cross-checks (pandas.merge_asof / brute-force
interval scan) on randomized-but-seeded inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fec_cn_support_etl_spark.operators.joins import asof_join, binned_range_join
from fec_cn_support_etl_spark.operators.sampling import mix_sources, stratified_sample


def _mk_events(n_left=400, n_right=150, n_keys=7, seed=11):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": rng.integers(0, 100_000, n_left).astype("datetime64[s]").astype("datetime64[us]"),
            "lid": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "ts": rng.integers(0, 100_000, n_right).astype("datetime64[s]").astype("datetime64[us]"),
            "price": np.round(rng.uniform(1, 100, n_right), 2),
        }
    )
    # unique (k, ts) on the right so tie-order is well-defined
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    return left, right


def test_asof_matches_pandas_merge_asof(spark):
    left, right = _mk_events()
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            key="k",
            ts="ts",
            payload=["price"],
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    ref = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(out["price"], ref["price"], check_names=False)


def test_asof_tolerance_and_exact_tie(spark):
    left = pd.DataFrame({"k": [1, 1, 1], "ts": pd.to_datetime(["2024-01-01 00:00:10", "2024-01-01 00:10:00", "2024-01-01 00:00:05"]), "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": [1, 1], "ts": pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:20"]), "price": [5.0, 20.0]})
    out = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right), key="k", ts="ts", payload=["price"], tolerance_sec=60)
        .toPandas()
        .set_index("lid")["price"]
    )
    assert out[2] == 5.0  # exact ts tie matches (>= semantics)
    assert out[0] == 5.0
    assert pd.isna(out[1])  # 00:10:00 is 580s after the last quote -> outside tolerance


def test_asof_carries_null_payload_without_skipping(spark):
    """A genuinely-NULL right payload must be carried, not skipped over
    to an older row (the struct-carry property)."""
    left = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01 00:01:00"]), "lid": [0]})
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:01", 5.0), (1, "2024-01-01 00:00:02", None)],
        "k int, ts_s string, price double",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "price")
    out = asof_join(spark.createDataFrame(left), right, key="k", ts="ts", payload=["price"]).toPandas()
    assert pd.isna(out["price"].iloc[0])  # newest row wins even though its payload is NULL
    assert str(out["matched_ts"].iloc[0]).startswith("2024-01-01 00:00:02")


def test_asof_payload_collision_raises(spark):
    left, right = _mk_events()
    left["price"] = 0.0
    with pytest.raises(ValueError, match="collide"):
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right), key="k", ts="ts", payload=["price"])


def _brute_range(probe: pd.DataFrame, ivl: pd.DataFrame):
    rows = []
    for _, e in ivl.iterrows():
        m = probe[(probe.k == e.k) & (probe.ts >= e.start) & (probe.ts <= e.end)]
        rows += [(e.iid, int(r.pid)) for r in m.itertuples()]
    return sorted(rows)


@pytest.mark.parametrize("bin_sec", [60, 600, 7])
def test_binned_range_join_matches_bruteforce(spark, bin_sec):
    """Bin width smaller/larger than the interval length (multi-bin
    explode vs single-bin) must not change the matched pair set."""
    rng = np.random.default_rng(3)
    probe = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "ts": rng.integers(0, 20_000, 300).astype("datetime64[s]").astype("datetime64[us]"),
            "pid": np.arange(300),
        }
    )
    starts = rng.integers(0, 20_000, 60)
    ivl = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 60),
            "start": starts.astype("datetime64[s]").astype("datetime64[us]"),
            "end": (starts + rng.integers(0, 900, 60)).astype("datetime64[s]").astype("datetime64[us]"),
            "iid": np.arange(60),
        }
    )
    out = binned_range_join(
        spark.createDataFrame(probe),
        spark.createDataFrame(ivl),
        key="k",
        ts="ts",
        start="start",
        end="end",
        bin_sec=bin_sec,
    ).toPandas()
    got = sorted(zip(out.iid, out.pid))
    assert got == _brute_range(probe, ivl)
    assert len(got) == len(set(got))  # exactly-once per (interval, probe) pair


def test_binned_range_join_boundary_inclusive(spark):
    probe = pd.DataFrame({"k": [1, 1, 1], "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 00:10:01"]), "pid": [0, 1, 2]})
    ivl = pd.DataFrame({"k": [1], "start": pd.to_datetime(["2024-01-01 00:00:00"]), "end": pd.to_datetime(["2024-01-01 00:10:00"]), "iid": [0]})
    out = binned_range_join(spark.createDataFrame(probe), spark.createDataFrame(ivl), "k", "ts", "start", "end", 600).toPandas()
    assert sorted(out.pid) == [0, 1]  # both endpoints in, first row past end out


def test_stratified_sample_deterministic_and_monotone(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    small = stratified_sample(ev, "event_type", {"view": 0.1}, id_cols=["event_id"])
    big = stratified_sample(ev, "event_type", {"view": 0.3}, id_cols=["event_id"])
    ids_small = {r.event_id for r in small.select("event_id").collect()}
    ids_big = {r.event_id for r in big.select("event_id").collect()}
    assert ids_small < ids_big  # raising the rate only ADDS rows
    # partitioning-independence: same keep set after a rebalance
    re = stratified_sample(ev.repartition(17), "event_type", {"view": 0.1}, id_cols=["event_id"])
    assert {r.event_id for r in re.select("event_id").collect()} == ids_small
    # rate lands near the target (md5 is uniform)
    n_views = ev.filter(F.col("event_type") == "view").count()
    assert abs(len(ids_small) / n_views - 0.1) < 0.03


def test_stratified_sample_default_fraction(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    kept = stratified_sample(ev, "event_type", {"error": 1.0}, id_cols=["event_id"], default_fraction=1.0)
    assert kept.count() == ev.count()  # default 1.0 keeps unlisted strata whole
    only = stratified_sample(ev, "event_type", {"error": 1.0}, id_cols=["event_id"])
    assert only.select("event_type").distinct().collect()[0][0] == "error"


def test_mix_sources_tags_and_rates(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "view")
    mixed = mix_sources([(a, 1.0), (b, 0.25)], id_cols=["event_id"])
    counts = {r.source_id: r["count"] for r in mixed.groupBy("source_id").count().collect()}
    assert counts[0] == a.count()
    assert abs(counts[1] / b.count() - 0.25) < 0.03
    # no Python in the plan: sampling is a scan-local codegen filter
    assert "EvalPython" not in mixed._jdf.queryExecution().executedPlan().toString()
