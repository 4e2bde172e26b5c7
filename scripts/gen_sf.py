"""Deterministic sf-upscaler for LOCAL MEASUREMENT ONLY.

The driver's round-end bench may run at a larger, driver-generated scale
factor (BENCH_r06 recorded sf=1.0) while /root/testdata ships only
sf{0.001,0.01,0.1}.  This script synthesizes an sf1.0-shaped dataset so
optimizations can be measured at seconds-scale locally:

- relational tables (lineitem/orders/customer/part/supplier/events): 10
  disjoint key-shifted copies of sf0.1 — join fan-outs and group
  cardinalities scale linearly, shards never cross-join;
- documents: regenerated from the sf0.1 corpus's own vocabulary and
  empirical length/lang/source distributions (seeded RNG), so the corpus
  keeps the global self-similarity that makes LSH collision volume the
  dominant cost at scale;
- embeddings: 10 copies with a small deterministic per-copy perturbation
  (keeps cosine structure, avoids exact-duplicate degeneracy);
- region/nation: unchanged (fixed dimensions).

Never used by bench.py / tests / the oracle — measurement harness only.

Usage: python scripts/gen_sf.py [out_dir=/root/sfgen/sf1.0] [factor=10]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _read(name: str) -> pa.Table:
    return pq.read_table(f"{SRC}/{name}.parquet")


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{out_dir}/{name}.parquet", compression="zstd")
    print(f"  {name}: {table.num_rows} rows", flush=True)


def _shift(table: pa.Table, col: str, offset: int) -> pa.Table:
    idx = table.schema.get_field_index(col)
    shifted = pc.add(table.column(col), pa.scalar(offset, table.schema.field(col).type))
    return table.set_column(idx, table.schema.field(col), shifted)


def replicate(name: str, factor: int, key_cols: dict[str, int]) -> pa.Table:
    """factor disjoint copies; key col i shifted by copy * span_i."""
    base = _read(name)
    parts = []
    for c in range(factor):
        t = base
        for col, span in key_cols.items():
            if c:
                t = _shift(t, col, c * span)
        parts.append(t)
    return pa.concat_tables(parts)


def gen_documents(factor: int, seed: int = 42) -> pa.Table:
    base = _read("documents").to_pandas()
    words = sorted({w for t in base.text for w in t.split(" ")})
    lengths = base.text.str.split(" ").str.len().to_numpy()
    langs = base.lang.to_numpy()
    sources = base.source.to_numpy()
    n = len(base) * factor
    rng = np.random.default_rng(seed)
    lens = rng.choice(lengths, size=n)
    lang_pick = rng.choice(langs, size=n)
    src_pick = rng.choice(sources, size=n)
    wl = np.array(words)
    texts = []
    for i in range(n):
        texts.append(" ".join(wl[rng.integers(0, len(wl), size=lens[i])]))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang_pick, pa.string()),
            "source": pa.array(src_pick, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(factor: int, seed: int = 43) -> pa.Table:
    base = _read("embeddings")
    dim = len(base.column("embedding")[0])
    vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    labels = base.column("label").to_numpy()
    rng = np.random.default_rng(seed)
    parts = []
    n0 = base.num_rows
    for c in range(factor):
        v = vecs if c == 0 else vecs + rng.normal(0, 0.05, size=vecs.shape).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(range(c * n0, (c + 1) * n0), pa.int64()),
                    "embedding": pa.array(list(v), pa.list_(pa.float32())),
                    "label": pa.array(labels, pa.int32()),
                }
            )
        )
    return pa.concat_tables(parts)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sfgen/sf1.0"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    print(f"generating {out_dir} (factor {factor}) from {SRC}", flush=True)
    for name in ("region", "nation"):
        _write(out_dir, name, _read(name))
    _write(out_dir, "customer", replicate("customer", factor, {"c_custkey": 15000}))
    _write(out_dir, "supplier", replicate("supplier", factor, {"s_suppkey": 1000}))
    _write(out_dir, "part", replicate("part", factor, {"p_partkey": 20000}))
    _write(out_dir, "orders", replicate("orders", factor, {"o_orderkey": 150000, "o_custkey": 15000}))
    _write(out_dir, "lineitem", replicate("lineitem", factor, {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000}))
    _write(out_dir, "events", replicate("events", factor, {"event_id": 100000, "user_id": 1500}))
    _write(out_dir, "documents", gen_documents(factor))
    _write(out_dir, "embeddings", gen_embeddings(factor))
    open(f"{out_dir}/_DONE", "w").close()
    print("done", flush=True)


if __name__ == "__main__":
    main()
