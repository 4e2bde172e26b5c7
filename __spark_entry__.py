"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the reference's full pipeline as one
Catalyst plan, mapped onto the driver star schema); ``queries`` /
``oracle_sql`` expose the operator catalog from
fec_cn_support_etl_spark/plans/catalog.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fec_cn_support_etl_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's 4-script pipeline as ONE lazy plan."""
    return catalog.fec_final_support_analog(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLE)
