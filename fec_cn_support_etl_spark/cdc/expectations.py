"""Ingest-time data-quality expectations (the Delta Live Tables
`EXPECT ... ON VIOLATION` surface, and the generalization of the
reference's pre-ship validation gates — scripts/verify_data.py runs
envelope/shape/anomaly checks before outputs ship; these run the same
discipline PER BATCH at the table's front door).

An :class:`Expectation` is a named SQL boolean predicate over the batch
with one of three violation actions:

* ``drop``       — violating rows are removed from the batch (counted);
* ``quarantine`` — violating rows are removed AND written to a side
                   parquet under ``quarantine_dir/epoch=<e>``, tagged
                   with the failed rule names (``_violations``) for
                   replay-after-fix;
* ``fail``       — any violation aborts the epoch BEFORE anything is
                   written (the strict gate).

NULL predicate results count as violations (a rule that cannot be
evaluated on a row has not been satisfied by it) — DLT semantics.

Scale shape: rule flags are ONE projection (pure Column expressions,
whole-stage codegen); ALL violation counts — per rule plus the
rows-in / any-violation / any-quarantine rollups — ride ONE
partial-combined aggregate over the flags; the clean/violating splits
reuse the same flags.  Nothing is collected driver-side but that one
counts row.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FLAG_PREFIX = "_exp_viol_"
VIOLATIONS_COL = "_violations"


class ExpectationFailed(RuntimeError):
    """A ``fail``-action expectation was violated; the epoch was
    aborted before any write."""


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: str  # SQL boolean expression a GOOD row satisfies
    action: str = "drop"  # drop | quarantine | fail

    def __post_init__(self):
        if self.action not in ("drop", "quarantine", "fail"):
            raise ValueError(f"unknown action {self.action!r} for expectation {self.name!r}")


def _any_of(flags: list):
    cond = None
    for c in flags:
        cond = c if cond is None else (cond | c)
    return cond if cond is not None else F.lit(False)


def apply_expectations(
    batch: DataFrame,
    expectations: list[Expectation],
    quarantine_dir: str | None = None,
    epoch: str | None = None,
) -> tuple[DataFrame, dict]:
    """Enforce ``expectations`` on ``batch``.  Returns ``(clean_batch,
    metrics)``: per-rule violation counts plus ``_rows_in``,
    ``_rows_dropped`` (rows removed for ANY reason, quarantined
    included) and ``_rows_quarantined`` (rows written to the side
    table; a row counts once however many rules it failed).

    ONE counting job runs over the flagged batch; the returned clean
    frame is lazy (its filter re-evaluates the same codegen'd flags).
    ``fail`` rules raise :class:`ExpectationFailed` before anything is
    written.  Quarantine writes are per-epoch overwrites, so a replayed
    epoch re-quarantines identically instead of duplicating."""
    if not expectations:
        return batch, {}
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")

    flag = {e.name: _FLAG_PREFIX + e.name for e in expectations}
    flagged = batch.select(
        "*",
        *[
            (~F.coalesce(F.expr(e.predicate), F.lit(False))).alias(flag[e.name])
            for e in expectations
        ],
    )
    q_rules = [e for e in expectations if e.action == "quarantine"]
    any_viol = _any_of([F.col(c) for c in flag.values()])
    any_quar = _any_of([F.col(flag[e.name]) for e in q_rules])
    counts = flagged.agg(
        F.count("*").alias("_rows_in"),
        F.sum(any_viol.cast("long")).alias("_rows_dropped"),
        F.sum(any_quar.cast("long")).alias("_rows_quarantined"),
        *[F.sum(F.col(flag[e.name]).cast("long")).alias(e.name) for e in expectations],
    ).collect()[0]
    metrics = {e.name: int(counts[e.name] or 0) for e in expectations}
    metrics["_rows_in"] = int(counts["_rows_in"])
    metrics["_rows_dropped"] = int(counts["_rows_dropped"] or 0)
    metrics["_rows_quarantined"] = int(counts["_rows_quarantined"] or 0)

    failed = [e.name for e in expectations if e.action == "fail" and metrics[e.name] > 0]
    if failed:
        raise ExpectationFailed(
            f"epoch {epoch!r}: fail-action expectation(s) violated: "
            + ", ".join(f"{n} ({metrics[n]} rows)" for n in failed)
        )

    if q_rules and metrics["_rows_quarantined"]:
        if quarantine_dir is None:
            raise ValueError("quarantine-action expectations need quarantine_dir")
        bad = (
            flagged.filter(any_quar)
            .withColumn(
                VIOLATIONS_COL,
                F.array_compact(
                    F.array(
                        *[F.when(F.col(flag[e.name]), F.lit(e.name)) for e in q_rules]
                    )
                ),
            )
            .drop(*flag.values())
        )
        out = os.path.join(quarantine_dir, f"epoch={epoch}")
        bad.write.mode("overwrite").parquet(out)

    clean = flagged.filter(~any_viol).drop(*flag.values())
    return clean, metrics
