"""Replicates the driver's correctness gate: run every catalog query on
Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and an order-insensitive value hash.

Stricter than the driver: we compare the full sorted cell matrix, so
any value-hash scheme the driver uses will also match.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from fec_cn_support_etl_spark.plans import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

ORACLE_KEYS = sorted(catalog.ORACLE.keys())


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _canon(df_pd):
    cols = sorted(df_pd.columns)
    df = df_pd[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(tuple(_canon_val(v) for v in tup))
    return cols, sorted(rows, key=repr)


def _canon_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import numpy as np

        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
    except ImportError:
        pass
    return v


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, name):
    sdf = catalog.QUERIES[name](spark, SF_DIR)
    spark_pd = sdf.toPandas()
    duck_pd = _duck(catalog.ORACLE[name])

    assert len(spark_pd) == len(duck_pd), f"{name}: row count {len(spark_pd)} vs oracle {len(duck_pd)}"
    s_cols, s_rows = _canon(spark_pd)
    d_cols, d_rows = _canon(duck_pd)
    assert s_cols == d_cols, f"{name}: columns {s_cols} vs {d_cols}"
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"


# Conscious rows-only allowlist: queries whose SEMANTICS preclude an
# exact SQL oracle. minhash_neardup_pairs_scale is the r=6-band
# estimate-grade geometry — its output is a strict SUBSET of the exact
# pair set (precision 1.0, recall ~0.96 disclosed); subset/recall/
# candidate-volume semantics are pinned by tests/test_sketch_scale.py.
_ROWS_ONLY_ALLOWED = {"minhash_neardup_pairs_scale"}

_ROWS_ONLY = sorted(set(catalog.QUERIES) - set(catalog.ORACLE) - _ROWS_ONLY_ALLOWED)


def test_every_query_is_oracle_backed():
    """Pins the gate's strength: the rows-only (no-oracle) query set is
    EMPTY — every catalog query gets the full rows+schema+hash compare.
    If a future query legitimately can't have an ANSI-SQL oracle, this
    must fail and be consciously replaced with a rows-only runner test
    for that query (previously an empty parametrize here reported the
    suite's unexplained '1 skipped')."""
    assert _ROWS_ONLY == [], f"queries without oracle coverage: {_ROWS_ONLY}"
