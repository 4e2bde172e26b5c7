"""Deterministic sampling / corpus-mixing operators for training-data
pipelines.

A 100-TB curation run cannot use ``df.sample`` (seeded per-partition
RNG: the kept set changes with partitioning, retries, and scale), so
sampling here is a pure function of each row's identity: keep a row iff
the first 4 hex chars of md5(id) fall below the stratum's threshold.
Properties that matter at scale:

- reproducible across engines, partitionings, retries, and cluster
  sizes (the oracle literally re-evaluates the same expression);
- no shuffle: the filter is a scan-local expression, and md5 is
  JVM-side (whole-stage codegen, no Python);
- strata rates are exact in expectation (threshold/65536) and
  consistent: re-running with a higher fraction yields a superset
  (thresholds grow monotonically), which is what incremental corpus
  re-mixes need.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_bucket(id_cols: Sequence[str]):
    """First 16 bits of md5 over the '|'-joined id columns, as 0..65535."""
    joined = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    return F.conv(F.substring(F.md5(joined), 1, 4), 16, 10).cast("int")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_cols: Sequence[str],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each stratum at its own deterministic rate.

    ``fractions`` maps stratum value -> keep fraction in [0, 1]; strata
    not listed keep ``default_fraction`` (0.0 = drop, 1.0 = keep all).
    The keep decision is md5-bucket(id) < floor(fraction * 65536), so it
    depends only on row identity — never on Spark's partitioning.
    """
    bucket = _hash_bucket(id_cols)

    def thr(f: float):
        return F.lit(int(min(max(f, 0.0), 1.0) * 65536))

    cond = None
    for value, frac in fractions.items():
        branch = (F.col(strata_col) == F.lit(value)) & (bucket < thr(frac))
        cond = branch if cond is None else (cond | branch)
    listed = F.col(strata_col).isin(*fractions.keys())
    rest = (~listed) & (bucket < thr(default_fraction))
    cond = rest if cond is None else (cond | rest)
    return df.filter(cond)


def mix_sources(
    sources: Sequence[tuple[DataFrame, float]],
    id_cols: Sequence[str],
    source_col: str = "source_id",
) -> DataFrame:
    """Weighted union of corpora: each source is kept at its own
    deterministic rate and tagged with its index — the standard
    training-mix recipe (e.g. 100% curated + 10% crawl). Same
    hash-threshold core as :func:`stratified_sample`, so the mix is
    reproducible and monotone in the weights."""
    out = None
    bucket = _hash_bucket(id_cols)
    for i, (df, frac) in enumerate(sources):
        part = df.filter(bucket < F.lit(int(min(max(frac, 0.0), 1.0) * 65536))).withColumn(
            source_col, F.lit(i)
        )
        out = part if out is None else out.unionByName(part)
    return out
