"""JSONL (newline-delimited JSON) source/sink — the de-facto
interchange format for LLM training corpora.

Scale rules baked in:
- reads take an IMPOSED schema (no inference job over 100 TB; Spark's
  JSON inference reads everything once before the real scan);
- malformed lines are dropped deterministically via PERMISSIVE +
  corrupt-record filtering (DROPMALFORMED interacts badly with column
  pruning, same pitfall as the CSV scan — see sources/fec.py);
- writes control file sizing (``maxRecordsPerFile``) and codec
  (zstd default: ~30% smaller than snappy on text at similar read
  cost) so downstream consumers see bounded, splittable files instead
  of one file per shuffle partition of arbitrary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    drop_malformed: bool = True,
) -> DataFrame:
    """Schema-imposed JSONL scan.

    ``drop_malformed=True`` goes through text + ``from_json``: a line
    that fails to parse yields a NULL struct and is filtered — the
    same deterministic bad-line discipline as the pipe-delimited scan
    (sources/fec.py), and immune to the Spark restriction that forbids
    queries referencing only the internal corrupt-record column (which
    the PERMISSIVE+filter formulation hits on count()-style plans).

    ``drop_malformed=False`` is the plain PERMISSIVE read: bad lines
    surface as all-NULL rows (caller keeps the row count)."""
    if not drop_malformed:
        df = spark.read.schema(
            T.StructType(schema.fields + [T.StructField(_CORRUPT, T.StringType())])
        ).option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", _CORRUPT).json(path)
        return df.drop(_CORRUPT)
    with_corrupt = T.StructType(schema.fields + [T.StructField(_CORRUPT, T.StringType())])
    parsed = (
        spark.read.text(path)
        .select(
            F.from_json(
                F.col("value"), with_corrupt, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
            ).alias("r")
        )
        .filter(F.col("r").isNotNull() & F.col(f"r.{_CORRUPT}").isNull())
    )
    return parsed.select(*[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields])


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    compression: str | None = "zstd",
    mode: str = "overwrite",
) -> None:
    """Bounded-file JSONL write. ``max_records_per_file`` caps file row
    counts WITHOUT a repartition (the writer rolls files), so write
    parallelism is untouched; ``compression=None`` emits plain text for
    interop with line-oriented tooling."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if compression:
        w = w.option("compression", compression)
    w.json(path)
