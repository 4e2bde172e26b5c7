"""Physical-plan assertions: the plans must be the ones we'd want at
100 TB — filters pushed to the parquet scan, columns pruned, dims
broadcast, aggregates partial+final inside whole-stage codegen."""

from __future__ import annotations

import pytest

from fec_cn_support_etl_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def plan(spark, name: str) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        catalog.QUERIES[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    p = plan(spark, "filter_project_pushdown")
    assert "PushedFilters:" in p
    assert "l_quantity" in p.split("PushedFilters:")[1].splitlines()[0]


def test_column_pruning(spark):
    p = plan(spark, "filter_project_pushdown")
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    # only the needed columns reach the scan — l_tax/l_returnflag must not
    assert "l_tax" not in read_schema and "l_returnflag" not in read_schema


def test_dims_are_broadcast(spark):
    p = plan(spark, "broadcast_enrich_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_semi_join_stays_semi(spark):
    p = plan(spark, "semi_join_exists")
    assert "LeftSemi" in p


def test_agg_is_partial_then_final(spark):
    p = plan(spark, "q1_pricing_summary")
    assert p.count("HashAggregate") >= 2  # partial + final
    assert "partial_sum" in p  # map-side combine before the exchange
    tree = p.split("(1) Scan")[0]
    assert tree.count("Exchange") == 1  # exactly one shuffle


def test_fec_final_single_fact_scan(spark):
    """The flagship reads lineitem exactly once (the reference's 6-scan
    pipeline collapsed)."""
    p = plan(spark, "fec_final_support_analog")
    assert p.count("lineitem.parquet") == 1


def test_lww_no_python_in_plan(spark):
    p = plan(spark, "top1_per_group_lww")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
