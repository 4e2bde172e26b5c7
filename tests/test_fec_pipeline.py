"""Reference-pipeline parity on the FEC-shaped fixture, plus the
reference's validation checks 1-10 (validate_outputs.py) as assertions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fec_cn_support_etl_spark.plans import fec_pipeline as P
from fec_cn_support_etl_spark.sources import fec as fec_src

from fec_fixture import EXPECTED, YEAR, write_fixture


@pytest.fixture(scope="module")
def inputs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fec")
    write_fixture(root)
    return P.FecInputs(
        cn=fec_src.read_fec_dir(spark, root / "cn", "cn"),
        cm=fec_src.read_fec_dir(spark, root / "cm", "cm"),
        ccl=fec_src.read_fec_dir(spark, root / "ccl", "ccl"),
        itcont=fec_src.read_fec_dir(spark, root / "itcont", "itcont"),
        itpas2=fec_src.read_fec_dir(spark, root / "itpas2", "itpas2"),
    )


@pytest.fixture(scope="module")
def outputs(inputs):
    return P.run_pipeline(inputs, ("S", "P"), YEAR)


def as_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def test_individual_support(outputs):
    got = as_map(outputs["individual_support"], "CAND_ID", "INDIVIDUAL_SUPPORT")
    assert got == pytest.approx(EXPECTED["individual"])


def test_superpac_support(outputs):
    got = as_map(outputs["superpac_ie_support"], "CAND_ID", "SUPERPAC_IE_SUPPORT")
    assert got == pytest.approx(EXPECTED["superpac"])


def test_pac_support_buckets(outputs):
    pac = outputs["pac_support_corp_nonconnected"]
    assert {r["CAND_ID"] for r in pac.collect()} == EXPECTED["pac_keys"]
    corp = {k: v for k, v in as_map(pac, "CAND_ID", "CORP_PAC_SUPPORT").items() if v > 0}
    nonconn = {k: v for k, v in as_map(pac, "CAND_ID", "NONCONNECTED_PAC_SUPPORT").items() if v > 0}
    assert corp == pytest.approx(EXPECTED["corp"])
    assert nonconn == pytest.approx(EXPECTED["nonconn"])


def test_spine_dedup_prefers_pcc(outputs):
    allf = outputs["candidates_all_with_flag"]
    dup = allf.filter(F.col("CAND_ID") == "S1EE00008").collect()
    assert len(dup) == 1
    assert dup[0]["CAND_NAME"] == EXPECTED["dup_winner_name"]


def test_final_invariants(outputs):
    """Reference validate_outputs.py checks 1-10 on the fixture run."""
    allf = outputs["candidates_all_with_flag"].toPandas()
    funded = outputs["final_support_table"].toPandas()
    nosup = outputs["candidates_no_support"].toPandas()

    # key uniqueness (:130-147)
    assert not allf.duplicated(["CAND_ID", "CAND_ELECTION_YR"]).any()
    # office purity (:156-188) + single year (:197-208)
    assert set(allf["CAND_OFFICE"]) <= {"S", "P"}
    assert set(allf["CAND_ELECTION_YR"]) == {YEAR}
    # universe = spine (:85-106 analog)
    assert set(allf["CAND_ID"]) == EXPECTED["spine_ids"]
    # TOTAL = sum of categories within $0.01 (:237-246)
    parts = allf[P.SUPPORT_COLS].sum(axis=1)
    assert (abs(allf["TOTAL_SUPPORT"] - parts) < 0.01).all()
    # HAS_MONEY == (TOTAL > 0) (:268-274)
    assert ((allf["TOTAL_SUPPORT"] > 0).astype(int) == allf["HAS_MONEY"]).all()
    # final + no_support = all, disjoint (:297-321)
    assert len(funded) + len(nosup) == len(allf)
    assert set(funded["CAND_ID"]).isdisjoint(set(nosup["CAND_ID"]))
    assert set(nosup["CAND_ID"]) == EXPECTED["zero_support_ids"]


def test_run_all_offices_partition(inputs):
    """senate + presidential = total, disjoint IDs, equal dollars
    (validate_outputs.py:324-387) — computed from ONE scan here."""
    groups = P.run_all_offices(inputs, YEAR)
    tot = groups["total"]["candidates_all_with_flag"].toPandas()
    sen = groups["senate"]["candidates_all_with_flag"].toPandas()
    pres = groups["presidential"]["candidates_all_with_flag"].toPandas()
    assert len(sen) + len(pres) == len(tot)
    assert set(sen["CAND_ID"]).isdisjoint(set(pres["CAND_ID"]))
    assert abs(sen["TOTAL_SUPPORT"].sum() + pres["TOTAL_SUPPORT"].sum() - tot["TOTAL_SUPPORT"].sum()) < 0.01
    assert set(sen["CAND_OFFICE"]) <= {"S"} and set(pres["CAND_OFFICE"]) <= {"P"}


def test_malformed_line_dropped(inputs):
    # the 30-field junk line must not survive the DROPMALFORMED scan
    assert inputs.itcont.filter(F.col("CMTE_ID") == "X").count() == 0


def test_merge_key_fallback_year_less_input(inputs, outputs):
    """J8 (reference merge_support.py:238-260): when a support input
    has no usable CAND_ELECTION_YR, the merge falls back to CAND_ID-
    only instead of silently joining nothing. On this fixture the spine
    has one row per CAND_ID, so the fallback must reproduce the normal
    composite-key result exactly — which the year-join would NOT (a
    null year matches no spine row -> zeros)."""
    indiv = P.individual_support(inputs, ("S", "P"), YEAR)
    pac = P.pac_support(inputs, ("S", "P"), YEAR)
    superpac = P.superpac_ie_support(inputs, ("S", "P"), YEAR)
    indiv_yearless = indiv.withColumn("CAND_ELECTION_YR", F.lit(None).cast("string"))
    final = P.merge_support(inputs.cn, indiv_yearless, pac, superpac, ("S", "P"), YEAR)

    cols = ["CAND_ID", *P.SUPPORT_COLS, "TOTAL_SUPPORT", "HAS_MONEY"]
    got = final.select(*cols).toPandas().sort_values("CAND_ID").reset_index(drop=True)
    want = (
        outputs["candidates_all_with_flag"].select(*cols).toPandas().sort_values("CAND_ID").reset_index(drop=True)
    )
    assert got.equals(want)
    # and the year-less input really did contribute (not all zeros —
    # the composite-key join would have produced 0.0 everywhere)
    assert got["INDIVIDUAL_SUPPORT"].sum() > 0
    assert got["INDIVIDUAL_SUPPORT"].sum() == pytest.approx(want["INDIVIDUAL_SUPPORT"].sum())


def test_merge_key_fallback_missing_year_column(inputs, outputs):
    """Same fallback when the column is absent entirely (the reference's
    'errors=ignore' drop path, merge_support.py:257-259)."""
    indiv = P.individual_support(inputs, ("S", "P"), YEAR).drop("CAND_ELECTION_YR")
    pac = P.pac_support(inputs, ("S", "P"), YEAR)
    superpac = P.superpac_ie_support(inputs, ("S", "P"), YEAR)
    final = P.merge_support(inputs.cn, indiv, pac, superpac, ("S", "P"), YEAR)
    got = as_map(final, "CAND_ID", "INDIVIDUAL_SUPPORT")
    want = as_map(outputs["candidates_all_with_flag"], "CAND_ID", "INDIVIDUAL_SUPPORT")
    assert got == pytest.approx(want)
    assert sum(got.values()) > 0


def test_sort_order(outputs):
    rows = outputs["final_support_table"].collect()
    # NULL state sorts last (pandas na_position='last' parity)
    keys = [((r["CAND_OFFICE_ST"] is None, r["CAND_OFFICE_ST"] or ""), -r["TOTAL_SUPPORT"]) for r in rows]
    assert keys == sorted(keys)
