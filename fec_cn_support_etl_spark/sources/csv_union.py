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


def combine_by_type(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    mode: str = "distributed",
) -> dict[str, str]:
    """The office-partitioned union CLI (reference combine_csv.py:
    85-132): for each {senate, presidential, total} subdirectory, union
    its CSVs with lineage columns, DISTINCT, and write ONE
    ``combined_{office}_ALL.csv`` through the no-blank-line sink.
    Missing subdirectories are skipped (reference WARNs). Returns
    office -> written path."""
    import glob as _glob
    import os

    from .csv_sink import write_csv_no_blank_line

    written: dict[str, str] = {}
    for office in ("senate", "presidential", "total"):
        sub = os.path.join(input_dir, office)
        if not os.path.isdir(sub) or not _glob.glob(os.path.join(sub, "*.csv")):
            continue
        df = (
            combine_csvs(spark, sub, recursive=False, distinct=False)
            # parity with the reference output columns: original cols +
            # source_file + cycle + office_type (no source_path), and
            # office_type is the subdir name, not path-inferred
            .drop("source_path")
            .withColumn("office_type", F.lit(office))
            .distinct()
        )
        out = os.path.join(output_dir, f"combined_{office}_ALL.csv")
        written[office] = write_csv_no_blank_line(df, out, mode=mode)
    return written


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> dict:
    """CLI twin of the reference's argparse entry point
    (combine_csv.py:135-153): single-file mode unions every CSV under
    --input-dir into --output; --by-type writes one combined CSV per
    {senate, presidential, total} subdirectory into --output-dir.
    Run as ``python -m fec_cn_support_etl_spark.sources.csv_union``."""
    import argparse
    import json
    import os

    from ..session import get_spark
    from .csv_sink import write_csv_no_blank_line

    ap = argparse.ArgumentParser(
        description="Combine CSVs from final_output_files: all into one file, or separate by office type."
    )
    ap.add_argument("--input-dir", required=True, help="Folder containing the CSV files")
    ap.add_argument("--output", help="Output CSV path (single-file mode; default <input-dir>/final_support_table_ALL.csv)")
    ap.add_argument("--output-dir", help="Output directory (by-type mode; default <input-dir>)")
    ap.add_argument("--recursive", action="store_true", help="Recursively search subdirectories for CSVs")
    ap.add_argument("--by-type", action="store_true", help="Separate combined files for senate/presidential/total")
    ap.add_argument("--master", default=None, help="Spark master (default: env/local)")
    a = ap.parse_args(argv)

    own_session = spark is None
    spark = spark or get_spark(app_name="combine-csv", master=a.master)
    try:
        if a.by_type:
            written = combine_by_type(spark, a.input_dir, a.output_dir or a.input_dir)
            result = {"mode": "by_type", "written": written}
        else:
            out = a.output or os.path.join(a.input_dir, "final_support_table_ALL.csv")
            df = combine_csvs(spark, a.input_dir, recursive=a.recursive).drop("source_path")
            report = {r["office_type"]: r["count"] for r in office_type_report(df).collect()}
            write_csv_no_blank_line(df, out, mode="distributed")
            result = {"mode": "single", "written": out, "by_office": report}
        print(json.dumps(result))
        return result
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    main()
