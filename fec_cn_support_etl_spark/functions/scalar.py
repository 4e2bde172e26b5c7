"""Scalar column helpers mirroring the reference's vectorized pandas idioms.

All JVM-side ``pyspark.sql.functions`` expressions — they stay inside
whole-stage codegen (no Python in the hot path).

Reference parity:
- ``extract_year``  <- regex 4-digit year normalization
  (reference scripts/individual_support.py:76, merge_support.py:38-47)
- ``coerce_double`` <- ``pd.to_numeric(..., errors="coerce")``
  (reference scripts/individual_support.py:109); Spark's cast of an
  invalid string yields NULL, which matches coerce-to-NaN.
- ``int_flag``      <- boolean->0/1 int casts
  (reference scripts/merge_support.py:155-156,277)
- ``money``/``dec`` — exact decimal arithmetic for aggregate parity
  checks: decimal sums are order-independent, so results hash-match a
  DuckDB oracle regardless of partitioning (float64 sums would not).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

YEAR_RE = r"(\d{4})"


def extract_year(col: Column | str) -> Column:
    """First 4-digit run in the string, as string ('' when absent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c.cast("string"), YEAR_RE, 1)


def coerce_double(col: Column | str) -> Column:
    """try_cast, not cast: Spark 4 runs ANSI mode by default, where a
    plain cast of junk THROWS; try_cast -> NULL matches pandas coerce."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def int_flag(cond: Column) -> Column:
    return cond.cast("int")


def dec(col: Column | str, scale: int = 4, precision: int = 18) -> Column:
    """Cast to an exact decimal so sums are associative/deterministic.

    precision 18 (not 38) so a two-operand product stays exact
    (<=38 digits) under both Spark's and DuckDB's decimal type rules —
    required for bit-identical aggregate parity with the oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money(col: Column | str) -> Column:
    """Round an exact decimal aggregate to cents and return double.

    The decimal->2dp->double pipeline gives bit-identical results in
    Spark and DuckDB, making order-insensitive value hashing stable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 2).cast("double")
