"""Session cache hygiene for multi-consumer sketch intermediates.

The sketch pipelines (minhash / simhash / LSH verify) persist small
intermediates (shingles, signatures, candidate pairs) because several
plan branches consume them. A catalog query returns a LAZY DataFrame,
so the query function itself can never unpersist — the action hasn't
run yet. Left alone, every sweep over the catalog accumulates cache
blocks until the caller remembers ``spark.catalog.clearCache()``.

This registry makes the release automatic without nuking unrelated
user caches: intermediates persist through :func:`cache`, and the next
catalog-query construction calls :func:`release_all` (see
``plans.catalog._q``) — by then the previous query's result has been
consumed (the sequential build→collect pattern of the driver, bench,
and tests). Two consecutive full-catalog sweeps therefore hold at most
one query's cache blocks at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_REGISTRY: list[DataFrame] = []

# FIFO backstop for callers that never construct a catalog query (the
# operator API used directly in a long-lived session): registrations
# beyond this bound release the OLDEST entries at cache() time. A
# single query registers a handful of frames, so the bound never fires
# inside one query's multi-consumer lifetime; without it the strong
# references here would pin cache blocks forever (the ContextCleaner
# cannot reclaim what the registry still holds).
MAX_REGISTERED = 16


def cache(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist (MEMORY_AND_DISK by default) and register for the next
    :func:`release_all` sweep."""
    from pyspark.storagelevel import StorageLevel

    df = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    _REGISTRY.append(df)
    while len(_REGISTRY) > MAX_REGISTERED:
        old = _REGISTRY.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass
    return df


def release_all() -> None:
    """Unpersist every registered intermediate (non-blocking). Safe to
    call at any time; already-released frames are no-ops."""
    while _REGISTRY:
        df = _REGISTRY.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session torn down; nothing to release
