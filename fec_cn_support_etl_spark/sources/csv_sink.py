"""CSV sink with the reference's no-trailing-blank-line byte contract.

Reference parity: scripts/config.py:126-141 ``write_csv_no_blank_line``
(pandas to_csv, then strip ALL trailing newline bytes) — SURVEY S6.
The stripped tail matters because the reference sha256-compares final
CSVs; a trailing newline is a different file.

Two paths:
- ``mode="driver"``: toPandas().to_csv + strip — BYTE-IDENTICAL to the
  reference helper by construction (same pandas float repr, same line
  terminator). Right for the candidate-level outputs, which are
  dim-sized (the reference itself holds them in pandas).
- ``mode="distributed"``: ``df.coalesce(1).write.csv`` to a temp dir,
  the single part-file is moved to ``path`` and its trailing newlines
  are truncated IN PLACE (no rewrite, no collect). Right for fact-
  scale extracts. Same no-blank-line contract; float columns follow
  Java shortest-roundtrip formatting, which differs from pandas repr
  in scientific-notation thresholds — byte parity with the pandas
  golden is guaranteed for string/integer columns (test-pinned), and
  callers needing pandas-exact floats pre-format the column.

``write_pipeline_outputs`` reproduces the reference's 18-file layout:
{senate,presidential,total} x {superpac_ie_support, individual_support,
pac_support_corp_nonconnected, final_support_table,
candidates_no_support, candidates_all_with_flag}, named
``{prefix}_{name}_{suffix}.csv`` (scripts/merge_support.py:105-107,
311-313).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def _strip_trailing_newlines(path: str) -> None:
    """Truncate trailing CR/LF bytes in place (reference
    scripts/config.py:133-141, minus the full-file rewrite)."""
    with open(path, "rb+") as fh:
        fh.seek(0, os.SEEK_END)
        size = fh.tell()
        # Walk backwards in chunks until a non-newline byte appears, so
        # ALL trailing CR/LF bytes go (the reference strips the full
        # tail, however long — byte parity is the contract).
        while size > 0:
            tail = min(size, 64)
            fh.seek(size - tail)
            chunk = fh.read(tail)
            stripped = chunk.rstrip(b"\r\n")
            size -= len(chunk) - len(stripped)
            if stripped:  # found a non-newline byte in this chunk
                break
        fh.truncate(size)


def write_csv_no_blank_line(
    df: DataFrame,
    path: str,
    mode: str = "driver",
    header: bool = True,
) -> str:
    """Write ``df`` to a single CSV at ``path`` with no trailing blank
    line. Returns ``path``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if mode == "driver":
        df.toPandas().to_csv(path, index=False, header=header)
        _strip_trailing_newlines(path)
        return path
    if mode != "distributed":
        raise ValueError(f"mode must be driver|distributed, got {mode!r}")
    tmp = tempfile.mkdtemp(prefix="csv-sink-", dir=os.path.dirname(os.path.abspath(path)) or ".")
    try:
        # coalesce(1): single output file without shuffling the plan's
        # upstream parallelism (upstream stages still run wide)
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("header", str(header).lower())
            # pandas writes empty strings unquoted (same as null) — match it
            .option("emptyValue", "")
            .csv(tmp)
        )
        parts = glob.glob(os.path.join(tmp, "part-*"))
        if len(parts) != 1:  # pragma: no cover - coalesce(1) guarantees 1
            raise RuntimeError(f"expected one part file, got {parts}")
        shutil.move(parts[0], path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    _strip_trailing_newlines(path)
    return path


def write_pipeline_outputs(
    groups: dict[str, dict[str, DataFrame]],
    out_dir: str,
    suffix: str,
    mode: str = "driver",
) -> list[str]:
    """The reference's full output layout from ``run_all_offices``
    results: 3 office groups x 6 tables = 18 CSVs, each through the
    no-blank-line sink. Returns the written paths."""
    written = []
    for prefix, outputs in groups.items():
        for name, df in outputs.items():
            p = os.path.join(out_dir, prefix, f"{prefix}_{name}_{suffix}.csv")
            written.append(write_csv_no_blank_line(df, p, mode=mode))
    return written
