"""Mergeable heavy-hitters summaries: distributed top-k item counts
with PROVEN error bounds, bounded state, and cross-epoch merge.

This completes the engine's mergeable-sketch trio — HLL for distinct
counts (plans/catalog.py::approx_distinct_hll), MRL/KLL quantile
sketches (operators/qsketch.py), and now item frequencies — the three
summaries a 100-TB pipeline persists per day/partition so that rolling
aggregates never rescan history.

Reference parity: the reference reports exact group counts at its data
scale (reference scripts/verify_data.py:47-90's category counts); at
web scale an exact (group, item) count table over an unbounded item
domain (e.g. corpus vocabulary) is itself too large to keep per epoch.
The classical answer is Misra-Gries / SpaceSaving.  The distributed
equivalent built here is stronger where it matters:

* items are hash-sharded (``pmod(xxhash64(item), n_shards)``), so each
  item's count funnels into exactly ONE shard and a kept item's count
  is EXACT (not a lower bound as in per-stream Misra-Gries) — Spark's
  partial aggregation already gives the map-side combine that
  SpaceSaving hand-rolls;
* each (group, shard) keeps only its top-``keep`` items plus one
  TAIL bound: the max count among the items it dropped.  A dropped
  item's true count is therefore provably <= that shard's
  ``tail_max`` — the summary's only approximation, and it is
  one-sided and quantified;
* summaries MERGE across epochs: the same item lands in the same
  shard every epoch, so merged counts are sums of per-epoch counts,
  exact for epochs where the item was kept, bounded by that epoch's
  ``tail_max`` where it was dropped.

Guarantees (used by the catalog oracle's membership check):

* completeness: an item with true count >= T is present in the merged
  summary whenever T > its shard's summed tail bound (if it were
  dropped in every epoch its true count could not reach T);
* bounds: for every reported item,
  ``cnt_lb <= true count <= cnt_lb + err_ub`` where ``err_ub`` is the
  summed tail bound of the epochs that dropped it (conservatively:
  of all epochs).

Everything is JVM-side DataFrame algebra — one partial-combined count
aggregation plus a WindowGroupLimit top-k per shard (map-side pruned,
see operators/windows.py::topk_per_group); no Python touches a row.
State per (group, epoch) is <= n_shards * (keep + 1) rows regardless
of item cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHARD_COL = "__hh_shard"


def hh_summary(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col: str,
    n_shards: int = 8,
    keep: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Build one epoch's bounded-size heavy-hitters summary.

    Returns ``(kept, tail)``:

    * ``kept``: (group_cols..., __hh_shard, item, cnt) — the top
      ``keep`` items per (group, shard) by exact count (count desc,
      item asc — a total order, so the truncation frontier is
      deterministic and partitioning/retry-invariant);
    * ``tail``: (group_cols..., __hh_shard, tail_max, tail_mass) — the
      max and total count mass of the DROPPED items per (group, shard);
      absent shards dropped nothing.

    Both frames are small enough to persist as the epoch's summary
    (<= n_shards*(keep+1) rows per group) and merge later with
    :func:`hh_merge`.
    """
    g = list(group_cols)
    shard = F.pmod(F.xxhash64(F.col(item_col)), F.lit(int(n_shards))).alias(SHARD_COL)
    cnt = (
        df.select(*g, shard, F.col(item_col).alias("item"))
        .groupBy(*g, SHARD_COL, "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*g, SHARD_COL).orderBy(F.desc("cnt"), F.asc("item"))
    ranked = cnt.withColumn("__rn", F.row_number().over(w))
    kept = ranked.filter(F.col("__rn") <= keep).drop("__rn")
    tail = (
        ranked.filter(F.col("__rn") > keep)
        .groupBy(*g, SHARD_COL)
        .agg(F.max("cnt").alias("tail_max"), F.sum("cnt").alias("tail_mass"))
    )
    return kept, tail


def hh_merge(
    parts: Sequence[tuple[DataFrame, DataFrame]],
    group_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """Merge per-epoch summaries into one: counts sum per (group, shard,
    item); tail bounds sum per (group, shard).  The merged ``tail_max``
    is the conservative per-item error bound: an item missing from some
    epochs' kept sets undercounts by at most the SUM of those epochs'
    tail maxima (<= the summed bound kept here).  Merging is associative
    and commutative — daily summaries roll up to monthly exactly like
    HLL unions do."""
    g = list(group_cols)
    kept = parts[0][0]
    tails = parts[0][1]
    for k_, t_ in parts[1:]:
        kept = kept.unionByName(k_, allowMissingColumns=True)
        tails = tails.unionByName(t_)
    # n_epochs_kept may be absent (fresh hh_summary output) or present
    # (re-merging already-merged summaries — merge is closed under its
    # own output, so daily summaries roll up to monthly associatively)
    if "n_epochs_kept" not in kept.columns:
        kept = kept.withColumn("n_epochs_kept", F.lit(1))
    merged_kept = kept.groupBy(*g, SHARD_COL, "item").agg(
        F.sum("cnt").alias("cnt"),
        F.sum(F.coalesce(F.col("n_epochs_kept"), F.lit(1))).alias("n_epochs_kept"),
    )
    merged_tail = tails.groupBy(*g, SHARD_COL).agg(
        F.sum("tail_max").alias("tail_max"), F.sum("tail_mass").alias("tail_mass")
    )
    return merged_kept, merged_tail


def heavy_hitters(
    kept: DataFrame,
    tail: DataFrame,
    group_cols: Sequence[str],
    threshold: int,
) -> DataFrame:
    """Decode GUARANTEED-candidate heavy hitters (true count possibly
    >= ``threshold``) from a (merged) summary: every item whose count
    lower bound plus its shard's error bound reaches the threshold.
    Output: (group_cols..., item, cnt_lb, err_ub) where
    ``cnt_lb <= true <= cnt_lb + err_ub``.  Superset-safe: contains
    every true heavy hitter whenever threshold > the shard's summed
    tail bound (see module docstring); never misses silently."""
    g = list(group_cols)
    out = (
        kept.join(tail.select(*g, SHARD_COL, "tail_max"), [*g, SHARD_COL], "left")
        .withColumn("err_ub", F.coalesce(F.col("tail_max"), F.lit(0)).cast("long"))
        .filter(F.col("cnt") + F.col("err_ub") >= threshold)
        .select(*g, "item", F.col("cnt").alias("cnt_lb"), "err_ub")
    )
    return out


def hh_truncate(
    kept: DataFrame,
    tail: DataFrame,
    group_cols: Sequence[str],
    keep: int,
) -> tuple[DataFrame, DataFrame]:
    """Re-truncate a MERGED summary back to ``keep`` items per (group,
    shard), folding the dropped items into the tail bound — the
    SpaceSaving merge step that keeps a ROLLING summary's state bounded
    forever (plain ``hh_merge`` keeps the union of per-epoch kept sets,
    which grows with epoch count).

    Soundness: a dropped item's merged cnt is a lower bound of its true
    count and its undercount is at most the pre-truncation ``tail_max``,
    so true <= cnt + tail_max <= new tail_max (= old + max dropped cnt).
    Completeness is preserved: an item whose true count exceeds the
    summed tail bound can never be dropped (at the moment of dropping,
    its true count is bounded by the new tail_max).  The price is that
    kept counts become LOWER bounds after an item is dropped and
    re-enters — exactly classic SpaceSaving semantics; the decode's
    [cnt_lb, cnt_lb + err_ub] interval already accounts for it."""
    g = list(group_cols)
    w = Window.partitionBy(*g, SHARD_COL).orderBy(F.desc("cnt"), F.asc("item"))
    ranked = kept.withColumn("__rn", F.row_number().over(w))
    new_kept = ranked.filter(F.col("__rn") <= keep).drop("__rn")
    dropped = (
        ranked.filter(F.col("__rn") > keep)
        .groupBy(*g, SHARD_COL)
        .agg(F.max("cnt").alias("__dmax"), F.sum("cnt").alias("__dmass"))
    )
    new_tail = (
        tail.join(dropped, [*g, SHARD_COL], "full_outer")
        .select(
            *g,
            SHARD_COL,
            (F.coalesce(F.col("tail_max"), F.lit(0)) + F.coalesce(F.col("__dmax"), F.lit(0)))
            .cast("long")
            .alias("tail_max"),
            (F.coalesce(F.col("tail_mass"), F.lit(0)) + F.coalesce(F.col("__dmass"), F.lit(0)))
            .cast("long")
            .alias("tail_mass"),
        )
    )
    return new_kept, new_tail
