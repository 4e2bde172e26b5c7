"""csv_union (combine_csv parity) + validate library checks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fec_cn_support_etl_spark.plans import fec_pipeline as P
from fec_cn_support_etl_spark.plans import validate as V
from fec_cn_support_etl_spark.sources import fec as fec_src
from fec_cn_support_etl_spark.sources.csv_union import combine_csvs, office_type_report

from fec_fixture import EXPECTED, YEAR, write_fixture


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


def test_combine_by_type_partitioned_outputs(spark, tmp_path):
    """Office-partitioned union (reference combine_csv.py:85-132): one
    combined_{office}_ALL.csv per subdirectory, deduped, lineage'd,
    through the no-blank-line sink; missing subdir skipped."""
    from fec_cn_support_etl_spark.sources.csv_union import combine_by_type

    for office, n in (("senate", 2), ("presidential", 1)):
        d = tmp_path / "in" / office
        d.mkdir(parents=True)
        for i in range(n):
            with open(d / f"{office}_final_support_table_1{i} .csv".replace(" ", ""), "w") as fh:
                fh.write("CAND_ID,TOTAL_SUPPORT\nA1,100.0\nA2,50.0\nA2,50.0\n")
    written = combine_by_type(spark, str(tmp_path / "in"), str(tmp_path / "out"))
    assert set(written) == {"senate", "presidential"}  # total subdir absent -> skipped
    sen = spark.read.options(header=True).csv(written["senate"])
    rows = sen.collect()
    # 2 files x 2 distinct rows (in-file dup removed; cross-file rows
    # differ by source_file so both survive — reference parity)
    assert len(rows) == 4
    assert set(sen.columns) == {"CAND_ID", "TOTAL_SUPPORT", "source_file", "cycle", "office_type"}
    assert {r["office_type"] for r in rows} == {"senate"}
    with open(written["presidential"], "rb") as fh:
        assert not fh.read().endswith(b"\n")


def test_combine_csv_cli(spark, tmp_path):
    """The argparse entry point (reference combine_csv.py:135-153):
    single-file mode and --by-type mode both write combined CSVs."""
    from fec_cn_support_etl_spark.sources.csv_union import main

    for office, rows in (("senate", "A1,100.0\nA2,50.0"), ("total", "B1,7.5")):
        d = tmp_path / "in" / office
        d.mkdir(parents=True)
        with open(d / f"{office}_final_support_table_16.csv", "w") as fh:
            fh.write(f"CAND_ID,TOTAL_SUPPORT\n{rows}\n")

    out_single = str(tmp_path / "all.csv")
    res = main(
        ["--input-dir", str(tmp_path / "in"), "--output", out_single, "--recursive"],
        spark=spark,
    )
    assert res["mode"] == "single" and os.path.exists(out_single)
    assert res["by_office"] == {"senate": 2, "total": 1}

    res = main(
        ["--input-dir", str(tmp_path / "in"), "--output-dir", str(tmp_path / "out"), "--by-type"],
        spark=spark,
    )
    assert set(res["written"]) == {"senate", "total"}
    sen = spark.read.options(header=True).csv(res["written"]["senate"])
    assert sen.count() == 2 and "office_type" in sen.columns


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


def test_golden_envelope_pass_and_fail(spark, tmp_path_factory):
    """verify_data.py:40-180 envelope runner, fixture-parameterized:
    the pipeline result sits inside a sane envelope; a deliberately
    impossible envelope reports every violation."""
    root = tmp_path_factory.mktemp("fecenv")
    write_fixture(root)
    inp = P.FecInputs(
        cn=fec_src.read_fec_dir(spark, root / "cn", "cn"),
        cm=fec_src.read_fec_dir(spark, root / "cm", "cm"),
        ccl=fec_src.read_fec_dir(spark, root / "ccl", "ccl"),
        itcont=fec_src.read_fec_dir(spark, root / "itcont", "itcont"),
        itpas2=fec_src.read_fec_dir(spark, root / "itpas2", "itpas2"),
    )
    groups = P.run_all_offices(inp, YEAR)
    tot = groups["total"]["candidates_all_with_flag"]
    sen = groups["senate"]["candidates_all_with_flag"]
    pres = groups["presidential"]["candidates_all_with_flag"]
    s = V.stats_summary(tot)
    good = {
        "total_money": (s["total"] * 0.5, s["total"] * 2.0),
        "candidates": (1, s["candidates"] + 1),
        "indiv_pct": (0, 100),
        "superpac_pct": (0, 100),
        "pres_money_pct": (0, 100),
        "known": [(cid, 0.0, 1e12) for cid in list(EXPECTED["individual"])[:2]],
    }
    ok, problems = V.check_golden_envelope(tot, sen, pres, good)
    assert ok, problems
    bad = {
        "total_money": (s["total"] * 10, s["total"] * 20),
        "candidates": (s["candidates"] + 5, s["candidates"] + 9),
        "known": [("ZZNOPE0000", 1.0, 2.0)],
    }
    ok, problems = V.check_golden_envelope(tot, sen, pres, bad)
    assert not ok and len(problems) == 3, problems


def test_top_anomalies_and_expected_candidates(spark, tmp_path_factory):
    """verify_data.py tests 5 (:191-207) and 10 (:303-315): clean
    pipeline output passes; a $0-total row injected into the top-k and
    a missing expected CAND_ID are both caught."""
    from pyspark.sql import functions as F

    root = tmp_path_factory.mktemp("fecanom")
    write_fixture(root)
    inp = P.FecInputs(
        cn=fec_src.read_fec_dir(spark, root / "cn", "cn"),
        cm=fec_src.read_fec_dir(spark, root / "cm", "cm"),
        ccl=fec_src.read_fec_dir(spark, root / "ccl", "ccl"),
        itcont=fec_src.read_fec_dir(spark, root / "itcont", "itcont"),
        itpas2=fec_src.read_fec_dir(spark, root / "itpas2", "itpas2"),
    )
    groups = P.run_all_offices(inp, YEAR)
    final = groups["total"]["final_support_table"]

    ok, detail = V.check_top_anomalies(final, k=50)
    assert ok, detail
    assert detail["zero_total_in_top"] == 0

    # break it: one row with $0 total sneaks into the (small) top-k
    broken = final.limit(1).withColumn("TOTAL_SUPPORT", F.lit(0.0)).unionByName(final)
    ok, detail = V.check_top_anomalies(broken, k=broken.count())
    assert not ok and detail["zero_total_in_top"] == 1

    # expected-candidate membership: present ids pass, a fake id fails
    some_id = final.select("CAND_ID").first()["CAND_ID"]
    ok, detail = V.check_expected_candidates(final, [some_id], k=10)
    assert ok, detail  # present in data (top-k membership is informational)
    ok, detail = V.check_expected_candidates(final, [some_id, "ZZNOPE0000"], k=10)
    assert not ok and detail["missing"] == ["ZZNOPE0000"]


def test_intermediate_containment_catches_stray_id(spark, tmp_path_factory):
    """Check 9 (validate_outputs.py:390-408): a support intermediate
    with a CAND_ID absent from the funded final table is flagged."""
    root = tmp_path_factory.mktemp("feccontain")
    write_fixture(root)
    inp = P.FecInputs(
        cn=fec_src.read_fec_dir(spark, root / "cn", "cn"),
        cm=fec_src.read_fec_dir(spark, root / "cm", "cm"),
        ccl=fec_src.read_fec_dir(spark, root / "ccl", "ccl"),
        itcont=fec_src.read_fec_dir(spark, root / "itcont", "itcont"),
        itpas2=fec_src.read_fec_dir(spark, root / "itpas2", "itpas2"),
    )
    out = P.run_pipeline(inp, ("S", "P"), YEAR)
    ok, details = V.check_intermediate_containment(
        out["final_support_table"], {"indiv": out["individual_support"]}
    )
    assert ok and details == {"indiv": 0}
    stray = out["individual_support"].withColumn("CAND_ID", F.concat(F.lit("X"), F.col("CAND_ID")))
    ok, details = V.check_intermediate_containment(out["final_support_table"], {"indiv": stray})
    assert not ok and details["indiv"] > 0


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


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC source/sink parity: lineitem slice round-trips exactly and
    predicate pushdown reaches the ORC scan (PushedFilters) — format
    breadth beyond parquet/CSV/JSONL without any extra dependency."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(500)
    out = str(tmp_path / "li_orc")
    li.write.mode("overwrite").option("compression", "zstd").orc(out)
    back = spark.read.orc(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity").explain("formatted")
    p = buf.getvalue()
    assert "PushedFilters:" in p and "l_quantity" in p.split("PushedFilters:")[1].splitlines()[0]
