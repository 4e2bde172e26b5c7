"""Skew-aware partitioning: salted repartition with hot-key splitting.

The north rule (BASELINE.json) requires explicit skew handling for the
CDC upsert: change events are zipf-skewed by repo, so a plain
``repartition(hash(repo, path))`` sends the hot repo's events to a few
tasks. Strategy (plain DataFrame code, no Catalyst extension needed):

1. ``detect_hot_keys``: approximate key histogram via a sampled
   groupBy-count; keys above ``threshold`` fraction of rows are "hot".
2. ``salted_repartition``: hot keys get ``salt = pmod(hash(row-unique),
   n_salts)`` so their rows spread over n_salts partitions; cold keys
   get salt 0. Repartition on (keys..., salt).

Downstream per-key operators (LWW dedup) remain correct because the
*key* columns still agree — only physical placement changes; the final
per-key reduce (window over keys) happens after, or — for algebraic
aggs — per-salt partial + merge.

For joins Spark's AQE skew-join already splits oversized partitions;
this module is for the aggregation/MERGE path where AQE doesn't apply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def detect_hot_keys(
    df: DataFrame,
    keys: Sequence[str],
    threshold: float = 0.05,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Keys carrying more than ``threshold`` of (sampled) rows.

    Returns a small DataFrame of the key columns (collectible /
    broadcastable). LAZY, and every stage is fully parallel: the total
    is a 1-row scalar aggregate over the per-key counts, attached via
    a broadcast cross join. An unpartitioned window over the counts
    would be one shuffle cheaper but funnels ALL distinct keys through
    a single sort task — at the 10^10-event / 10^9-distinct-key regime
    this module exists for, that is the skew bottleneck reintroduced
    inside the skew kit. The price here is computing the map-side-
    combined groupBy twice (filter side + total side), each fully
    parallel; ``sample_fraction`` caps that CPU (a 0.1% sample still
    sees every >0.01%-hot key thousands of times).
    """
    s = df.select(*keys)
    if sample_fraction:
        s = s.sample(fraction=sample_fraction, seed=seed)
    counts = s.groupBy(*keys).count()
    total = counts.agg(F.sum("count").alias("__total"))
    cutoff = F.greatest(F.lit(1).cast("long"), F.floor(F.col("__total") * F.lit(threshold)))
    return counts.crossJoin(F.broadcast(total)).filter(F.col("count") >= cutoff).select(*keys)


def salted_repartition(
    df: DataFrame,
    keys: Sequence[str],
    n_partitions: int,
    hot_keys: DataFrame | None = None,
    n_salts: int = 16,
    unique_col: str | None = None,
) -> DataFrame:
    """Repartition by key hash, exploding hot keys across ``n_salts``.

    ``unique_col``: a per-row distinct column (e.g. lsn) used to derive
    a deterministic salt; falls back to a uniform random salt via
    ``rand(seed)`` would break replay-determinism, so a unique column is
    required when hot keys exist.
    """
    keys = list(keys)
    if hot_keys is None:
        return df.repartition(n_partitions, *keys)
    if unique_col is None:
        raise ValueError("salted_repartition needs unique_col for deterministic salting")
    hot = F.broadcast(hot_keys.select(*keys).withColumn("__is_hot", F.lit(1)))
    out = (
        df.join(hot, on=keys, how="left")
        .withColumn(
            SALT_COL,
            F.when(F.col("__is_hot").isNotNull(), F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("__is_hot")
    )
    return out.repartition(n_partitions, *keys, F.col(SALT_COL))
