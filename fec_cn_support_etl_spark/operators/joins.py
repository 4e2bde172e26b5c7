"""Join operators.

Reference parity (SURVEY.md §2.3):
- J1/J2 dict-map lookups  -> broadcast left join (+ optional fill)
  (reference scripts/individual_support.py:17-27,99;
   scripts/pac_support_corp_union.py:59,105)
- J3-J5 ``isin(set)`` membership filters -> LEFT SEMI join
  (reference scripts/individual_support.py:81,105 etc.)
- U3 key-universe union -> union+distinct of key columns
  (reference scripts/pac_support_corp_union.py:135-137)

Scale notes: dimensions here (cm/cn/ccl; customer/nation) are orders of
magnitude smaller than facts, so we *hint* broadcast — the fact side
never shuffles. Semi joins let Catalyst push the existence check below
later aggregations and avoid materializing payload columns.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    key: str | Sequence[str],
    payload: Sequence[str] | None = None,
    fill: Mapping[str, object] | None = None,
    how: str = "left",
) -> DataFrame:
    """fact LEFT JOIN broadcast(dim) ON key, keeping ``payload`` columns.

    ``fill`` maps payload column -> default for misses (the reference's
    ``.map(d).fillna(default)``).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if payload is not None:
        dim = dim.select(*keys, *payload)
    out = fact.join(F.broadcast(dim), on=keys, how=how)
    if fill:
        out = out.na.fill(dict(fill))
    return out


def semi_filter(fact: DataFrame, keys_df: DataFrame, key: str | Sequence[str], negate: bool = False) -> DataFrame:
    """Keep fact rows whose key exists (semi) / doesn't (anti) in keys_df."""
    keys = [key] if isinstance(key, str) else list(key)
    how = "left_anti" if negate else "left_semi"
    return fact.join(keys_df.select(*keys).distinct(), on=keys, how=how)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> str:
    """Materialize ``df`` as a hash-bucketed (optionally sorted)
    managed table.

    Scale rationale: two tables bucketed identically on their join key
    equi-join WITHOUT an Exchange (and with sortBy, without a Sort) —
    at 100 TB this removes the dominant shuffle from every repeated
    fact-to-fact join or agg on the key. The one-time bucketed write
    pays for itself after the first reuse; tests assert the
    exchange-free plan (test_plan_quality.py::test_bucketed_join_avoids_shuffle).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *list(keys))
    if sort_cols:
        w = w.sortBy(*list(sort_cols))
    w.saveAsTable(table_name)
    return table_name


def key_universe(dfs: Sequence[DataFrame], key_cols: Sequence[str]) -> DataFrame:
    """Distinct union of key columns across frames (the row spine)."""
    out = dfs[0].select(*key_cols)
    for d in dfs[1:]:
        out = out.unionByName(d.select(*key_cols))
    return out.distinct()
