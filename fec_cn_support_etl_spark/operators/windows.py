"""Window-shaped operators.

The reference implements "top 1 row per key by preference order" twice
by sort + drop_duplicates(keep='first'):
- candidate-spine dedup scoring (__has_pcc, __is_status_C)
  (reference scripts/merge_support.py:150-180)
- committee->candidate map preferring principal linkage
  (reference scripts/individual_support.py:17-27)

In Spark this is one ``row_number() OVER (PARTITION BY keys ORDER BY
prefs) = 1`` — and it is exactly the last-writer-wins max-by-LSN dedup
the CDC north rule requires, so ``lww_latest`` is a thin alias.

Scale note: the window shuffles once on the partition keys. When the
downstream op (e.g. MERGE) also partitions by the same keys, do the
``salted_repartition`` FIRST and run this window within partitions so
the shuffle is reused (see cdc/engine.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cols: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def top1_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    keep_rank_col: bool = False,
) -> DataFrame:
    """One row per key group: first row under ``order`` (use F.desc(...)
    / tie-break columns to make the winner total-ordered and replayable).
    """
    w = Window.partitionBy(*keys).orderBy(*_cols(order))
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out if keep_rank_col else out.drop("__rn")


def topk_per_group(df: DataFrame, keys: Sequence[str], order: Sequence[Column | str], k: int) -> DataFrame:
    """Top-k rows per key group under ``order``.

    Skew note: the rank<=k filter compiles to WindowGroupLimit, which
    Spark (3.5+) pushes BELOW the exchange — each map task pre-prunes
    to its local top-k per key before shuffling, so a hot key ships at
    most k x num_map_partitions rows instead of all of them (the
    order-statistic analogue of partial aggregation; plan-asserted in
    test_plan_quality.py::test_topk_prunes_map_side). No manual
    salting needed."""
    w = Window.partitionBy(*keys).orderBy(*_cols(order))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def lww_latest(df: DataFrame, keys: Sequence[str], lsn_col: str = "lsn", tiebreak: Sequence[str] = ()) -> DataFrame:
    """Last-writer-wins image per key: max-by-(lsn, *tiebreak).

    Total order => bit-stable replay (SURVEY.md §7.4): ties beyond lsn
    are broken by the extra columns descending.
    """
    order = [F.desc(lsn_col), *[F.desc(c) for c in tiebreak]]
    return top1_per_group(df, keys, order)
