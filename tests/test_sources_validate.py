"""csv_union (combine_csv parity) + validate library checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fec_cn_support_etl_spark.plans import fec_pipeline as P
from fec_cn_support_etl_spark.plans import validate as V
from fec_cn_support_etl_spark.sources import fec as fec_src
from fec_cn_support_etl_spark.sources.csv_union import combine_csvs, office_type_report

from fec_fixture import YEAR, write_fixture


@pytest.fixture(scope="module")
def csv_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cycles")
    for cycle in ("16", "20"):
        for office in ("senate", "presidential"):
            d = root / cycle / office
            d.mkdir(parents=True)
            with open(d / f"{office}_final_support_table_{cycle}.csv", "w") as fh:
                fh.write("CAND_ID,TOTAL_SUPPORT\n")
                fh.write(f"X{cycle}{office[:1].upper()}1,100.0\n")
                fh.write(f"X{cycle}{office[:1].upper()}2,50.0\n")
                # duplicate row within the file -> removed by DISTINCT
                fh.write(f"X{cycle}{office[:1].upper()}2,50.0\n")
    return str(root)


def test_combine_csvs_lineage_and_distinct(spark, csv_tree):
    df = combine_csvs(spark, csv_tree)
    rows = df.collect()
    assert len(rows) == 8  # 2 cycles x 2 offices x 2 distinct rows
    assert {r["cycle"] for r in rows} == {"16", "20"}
    assert {r["office_type"] for r in rows} == {"senate", "presidential"}
    report = {r["office_type"]: r["count"] for r in office_type_report(df).collect()}
    assert report == {"senate": 4, "presidential": 4}


def test_validate_checks_pass_on_pipeline(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fecval")
    write_fixture(root)
    inp = P.FecInputs(
        cn=fec_src.read_fec_dir(spark, root / "cn", "cn"),
        cm=fec_src.read_fec_dir(spark, root / "cm", "cm"),
        ccl=fec_src.read_fec_dir(spark, root / "ccl", "ccl"),
        itcont=fec_src.read_fec_dir(spark, root / "itcont", "itcont"),
        itpas2=fec_src.read_fec_dir(spark, root / "itpas2", "itpas2"),
    )
    groups = P.run_all_offices(inp, YEAR)
    results = V.run_all_checks(groups["total"], ("S", "P"), YEAR)
    assert all(ok for ok, _ in results.values()), results
    ok, detail = V.check_office_additivity(
        groups["senate"]["candidates_all_with_flag"],
        groups["presidential"]["candidates_all_with_flag"],
        groups["total"]["candidates_all_with_flag"],
    )
    assert ok, detail


def test_validate_checks_catch_corruption(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fecbad")
    write_fixture(root)
    inp = P.FecInputs(
        cn=fec_src.read_fec_dir(spark, root / "cn", "cn"),
        cm=fec_src.read_fec_dir(spark, root / "cm", "cm"),
        ccl=fec_src.read_fec_dir(spark, root / "ccl", "ccl"),
        itcont=fec_src.read_fec_dir(spark, root / "itcont", "itcont"),
        itpas2=fec_src.read_fec_dir(spark, root / "itpas2", "itpas2"),
    )
    out = P.run_pipeline(inp, ("S", "P"), YEAR)
    corrupted = out["candidates_all_with_flag"].withColumn(
        "TOTAL_SUPPORT", F.col("TOTAL_SUPPORT") + 5.0
    )
    ok, bad = V.check_total_consistency(corrupted)
    assert not ok and bad > 0
