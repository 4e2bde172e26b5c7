"""FEC bulk-file sources: headerless pipe-delimited scans with imposed
all-string schemas (the public FEC bulk-data layouts; parity with
reference scripts/config.py:102-124 and the read sites cited in
SURVEY.md §2.1).

Reference behaviors reproduced:
- ``find_input_file``: prefix-match *.txt/*.dat in a folder, else the
  largest file (reference scripts/individual_support.py:7-15).
- malformed rows dropped (``on_bad_lines='skip'`` ->
  mode=DROPMALFORMED), bad encodings tolerated.
- everything StringType on ingest (``dtype=str``); numeric coercion
  happens lazily downstream (functions.scalar.coerce_double).

At scale, one distributed CSV scan replaces the reference's 2M-row
chunk loop — chunking is Spark partitioning, for free.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Public FEC bulk-data column layouts (www.fec.gov/campaign-finance-data/)
FEC_SCHEMAS: dict[str, list[str]] = {
    "cm": [
        "CMTE_ID", "CMTE_NM", "TRES_NM", "CMTE_ST1", "CMTE_ST2", "CMTE_CITY", "CMTE_ST",
        "CMTE_ZIP", "CMTE_DSGN", "CMTE_TP", "CMTE_PTY_AFFILIATION", "CMTE_FILING_FREQ",
        "ORG_TP", "CONNECTED_ORG_NM", "CAND_ID",
    ],
    "cn": [
        "CAND_ID", "CAND_NAME", "CAND_PTY_AFFILIATION", "CAND_ELECTION_YR", "CAND_OFFICE_ST",
        "CAND_OFFICE", "CAND_OFFICE_DISTRICT", "CAND_ICI", "CAND_STATUS", "CAND_PCC",
        "CAND_ST1", "CAND_ST2", "CAND_CITY", "CAND_ST", "CAND_ZIP",
    ],
    "ccl": [
        "CAND_ID", "CAND_ELECTION_YR", "FEC_ELECTION_YR", "CMTE_ID", "CMTE_TP", "CMTE_DSGN",
        "LINKAGE_ID",
    ],
    "itcont": [
        "CMTE_ID", "AMNDT_IND", "RPT_TP", "TRANSACTION_PGI", "IMAGE_NUM", "TRANSACTION_TP",
        "ENTITY_TP", "NAME", "CITY", "STATE", "ZIP_CODE", "EMPLOYER", "OCCUPATION",
        "TRANSACTION_DT", "TRANSACTION_AMT", "OTHER_ID", "TRAN_ID", "FILE_NUM", "MEMO_CD",
        "MEMO_TEXT", "SUB_ID",
    ],
    "itpas2": [
        "CMTE_ID", "AMNDT_IND", "RPT_TP", "TRANSACTION_PGI", "IMAGE_NUM", "TRANSACTION_TP",
        "ENTITY_TP", "NAME", "CITY", "STATE", "ZIP_CODE", "EMPLOYER", "OCCUPATION",
        "TRANSACTION_DT", "TRANSACTION_AMT", "OTHER_ID", "CAND_ID", "TRAN_ID", "FILE_NUM",
        "MEMO_CD", "MEMO_TEXT", "SUB_ID",
    ],
}

VALID_OFFICES = ("S", "P")  # Senate + Presidential only, no House


def string_schema(table: str) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in FEC_SCHEMAS[table]])


def find_input_file(folder: str | Path, prefix: str) -> Path:
    """Prefix-match *.txt/*.dat in the folder; fall back to the largest
    file (reference scripts/individual_support.py:7-15)."""
    folder = Path(folder)
    cands = [
        p
        for p in folder.iterdir()
        if p.is_file() and p.suffix.lower() in (".txt", ".dat") and p.name.lower().startswith(prefix.lower())
    ]
    if cands:
        return sorted(cands)[0]
    files = [p for p in folder.iterdir() if p.is_file()]
    if not files:
        raise FileNotFoundError(f"no input files in {folder}")
    return max(files, key=lambda p: p.stat().st_size)


def read_fec(spark: SparkSession, path: str | Path, table: str) -> DataFrame:
    """Headerless pipe-delimited scan, all-string, malformed rows dropped.

    Implemented as text-scan -> field-count filter -> from_csv rather
    than spark.read.csv(mode=DROPMALFORMED): Spark's CSV reader only
    detects extra-field rows when no column pruning happens, so the
    same bad row would survive some queries and vanish from others.
    The text path gives pandas ``on_bad_lines='skip'`` semantics
    (reference scripts/individual_support.py:87-91) deterministically,
    and from_csv stays inside whole-stage codegen.
    """
    cols = FEC_SCHEMAS[table]
    schema = string_schema(table)
    from pyspark.sql import functions as F

    raw = spark.read.text(str(path))
    n_fields = F.size(F.split(F.col("value"), r"\|", -1))
    ok = raw.filter(n_fields <= len(cols))  # pandas drops too-many-fields rows; short rows null-fill
    parsed = ok.select(F.from_csv(F.col("value"), schema.simpleString(), {"sep": "|"}).alias("r")).select("r.*")
    # normalize pandas' NaN-for-missing vs from_csv's empty-string: FEC
    # empty fields are semantically empty strings; keep as parsed.
    return parsed


def read_fec_dir(spark: SparkSession, folder: str | Path, table: str, prefix: str | None = None) -> DataFrame:
    return read_fec(spark, find_input_file(folder, prefix or table), table)
