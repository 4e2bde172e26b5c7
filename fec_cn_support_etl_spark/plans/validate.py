"""The reference's validation suite (scripts/validate_outputs.py checks
1-10 and scripts/verify_data.py statistical envelopes) as reusable
DataFrame checks. Each returns (ok, details) without collecting more
than aggregates — runnable against outputs of any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fec_pipeline import SUPPORT_COLS


def check_key_uniqueness(df: DataFrame, keys=("CAND_ID", "CAND_ELECTION_YR")) -> tuple[bool, int]:
    """validate_outputs.py:130-147."""
    dups = df.groupBy(*keys).count().filter(F.col("count") > 1).count()
    return dups == 0, dups


def check_office_purity(df: DataFrame, offices) -> tuple[bool, int]:
    """validate_outputs.py:156-188."""
    bad = df.filter(~F.col("CAND_OFFICE").isin(list(offices))).count()
    return bad == 0, bad


def check_single_year(df: DataFrame, year: str) -> tuple[bool, int]:
    """validate_outputs.py:197-208."""
    bad = df.filter(F.col("CAND_ELECTION_YR") != year).count()
    return bad == 0, bad


def check_total_consistency(df: DataFrame, tol: float = 0.01) -> tuple[bool, int]:
    """TOTAL_SUPPORT == sum(categories) within $0.01
    (validate_outputs.py:237-246)."""
    total = None
    for c in SUPPORT_COLS:
        total = F.coalesce(F.col(c), F.lit(0.0)) if total is None else total + F.coalesce(F.col(c), F.lit(0.0))
    bad = df.filter(F.abs(F.col("TOTAL_SUPPORT") - total) >= tol).count()
    return bad == 0, bad


def check_flag_consistency(df: DataFrame) -> tuple[bool, int]:
    """HAS_MONEY == (TOTAL_SUPPORT > 0) (validate_outputs.py:268-274)."""
    bad = df.filter(F.col("HAS_MONEY") != (F.col("TOTAL_SUPPORT") > 0).cast("int")).count()
    return bad == 0, bad


def check_partition_completeness(funded: DataFrame, no_support: DataFrame, all_flag: DataFrame) -> tuple[bool, dict]:
    """final + no_support = all, by rows and by key sets
    (validate_outputs.py:297-321)."""
    n_f, n_n, n_a = funded.count(), no_support.count(), all_flag.count()
    overlap = funded.select("CAND_ID").intersect(no_support.select("CAND_ID")).count()
    missing = (
        all_flag.select("CAND_ID")
        .exceptAll(funded.select("CAND_ID").unionByName(no_support.select("CAND_ID")))
        .count()
    )
    ok = (n_f + n_n == n_a) and overlap == 0 and missing == 0
    return ok, {"funded": n_f, "no_support": n_n, "all": n_a, "overlap": overlap, "missing": missing}


def check_office_additivity(senate: DataFrame, presidential: DataFrame, total: DataFrame, tol=0.01) -> tuple[bool, dict]:
    """senate + presidential = total: rows, disjoint IDs, dollars
    (validate_outputs.py:339-387)."""
    n_s, n_p, n_t = senate.count(), presidential.count(), total.count()
    inter = senate.select("CAND_ID").intersect(presidential.select("CAND_ID")).count()
    d_s = senate.agg(F.sum("TOTAL_SUPPORT")).collect()[0][0] or 0.0
    d_p = presidential.agg(F.sum("TOTAL_SUPPORT")).collect()[0][0] or 0.0
    d_t = total.agg(F.sum("TOTAL_SUPPORT")).collect()[0][0] or 0.0
    ok = (n_s + n_p == n_t) and inter == 0 and abs(d_s + d_p - d_t) < tol
    return ok, {"rows": (n_s, n_p, n_t), "id_overlap": inter, "dollars": (d_s, d_p, d_t)}


def check_distribution_shape(df: DataFrame, min_ratio: float = 1.5) -> tuple[bool, float]:
    """mean/median TOTAL_SUPPORT of funded candidates > 1.5 — right skew
    (verify_data.py:252-275)."""
    funded = df.filter(F.col("TOTAL_SUPPORT") > 0)
    row = funded.agg(
        F.avg("TOTAL_SUPPORT").alias("mean"),
        F.percentile_approx("TOTAL_SUPPORT", 0.5).alias("median"),
    ).collect()[0]
    if not row["median"]:
        return False, 0.0
    ratio = row["mean"] / row["median"]
    return ratio > min_ratio, ratio


def run_all_checks(outputs: dict[str, DataFrame], offices, year: str) -> dict[str, tuple]:
    """Mirror of validate_outputs.main over one office group's outputs."""
    allf = outputs["candidates_all_with_flag"]
    return {
        "key_uniqueness": check_key_uniqueness(allf),
        "office_purity": check_office_purity(allf, offices),
        "single_year": check_single_year(allf, year),
        "total_consistency": check_total_consistency(allf),
        "flag_consistency": check_flag_consistency(allf),
        "partition_completeness": check_partition_completeness(
            outputs["final_support_table"], outputs["candidates_no_support"], allf
        ),
    }
