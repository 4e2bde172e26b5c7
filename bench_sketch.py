"""Sketch-family scale evidence: MinHash+LSH near-dup dedup throughput
on a generated corpus, at two parallelism levels.

The /root/testdata documents fixture is 500 rows at every sf, so this
is the measured (not argued-from-plan-shape) evidence that the bucketed
sketch path scales: the IDENTICAL end-to-end job — char-5 shingles ->
48-hash MinHash signatures -> 16-band LSH candidates -> signature
prune -> exact Jaccard >= 4/5 verify (the same pipeline as the
minhash_neardup_pairs catalog query) — runs over the IDENTICAL
materialized corpus parquet at local[N] and local[4N], in separate
processes, reporting docs/sec at both plus strong-scaling efficiency
  eff = (thr_4N / thr_N) / 4.

Ground truth is planted (corpus.py), so each run also asserts recall
of the planted pairs — a throughput number for a job that silently
found nothing would be meaningless.

Usage: python bench_sketch.py [--docs 50000] [--low 2] [--high 8]
Prints one machine-readable JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))

_RUN_CODE = """
import json, sys, time
sys.path.insert(0, {repo!r})
from fec_cn_support_etl_spark.session import get_spark
from fec_cn_support_etl_spark.corpus import planted_pairs
from fec_cn_support_etl_spark.operators.dedup import (
    char_shingles, minhash_signatures, minhash_lsh_pairs, signature_verify, jaccard_verify,
)

spark = get_spark(master="local[{cores}]", shuffle_partitions={shuffle})
corpus = spark.read.parquet({corpus!r})
n_docs = corpus.count()

# warmup: codegen/JIT on a small slice (same operators, throwaway result)
warm = corpus.limit(500)
jaccard_verify(
    signature_verify(
        minhash_lsh_pairs(minhash_signatures(char_shingles(warm, "doc_id", "text", 5), 48), 16),
        minhash_signatures(char_shingles(warm, "doc_id", "text", 5), 48), 0.45,
    ).select("id_a", "id_b"),
    char_shingles(warm, "doc_id", "text", 5), threshold_frac=(4, 5),
).count()
spark.catalog.clearCache()

t0 = time.time()
sh = char_shingles(corpus, "doc_id", "text", k=5)
sig = minhash_signatures(sh, 48).persist()
cand = minhash_lsh_pairs(sig, bands={bands})
pruned = signature_verify(cand, sig, threshold=0.45).select("id_a", "id_b")
pairs = jaccard_verify(pruned, sh, threshold_frac=(4, 5)).persist()
n_pairs = pairs.count()
wall = time.time() - t0

# ground truth = planted pairs whose EXACT Jaccard clears the same
# 4/5 threshold (the 3% mutation's binomial tail pushes ~0.1% of
# planted pairs below 0.8 — those are correctly absent from the output)
eligible = jaccard_verify(planted_pairs(corpus), sh, threshold_frac=(4, 5)).select("id_a", "id_b").persist()
n_eligible = eligible.count()
recalled = pairs.join(eligible, ["id_a", "id_b"], "left_semi").count()
print(json.dumps({{
    "docs": n_docs, "wall_sec": round(wall, 2),
    "docs_per_sec": round(n_docs / wall, 1),
    "pairs_found": n_pairs, "planted": n_eligible, "recalled": recalled,
}}))
spark.stop()
"""


def run_trial(corpus_dir: str, cores: int, docs: int, bands: int = 16) -> dict:
    # Partition count must track DATA VOLUME, not core count: at 500k
    # docs the shingle relation is ~100M rows, and shuffle_partitions=2
    # (cores) puts ~50M rows in one partition — executor OOM. Few cores
    # simply work through more (right-sized) partitions sequentially;
    # this is exactly the sizing rule a 100 TB job follows.
    shuffle = max(cores, docs // 10_000)
    code = _RUN_CODE.format(repo=REPO, cores=cores, corpus=corpus_dir, shuffle=shuffle, bands=bands)
    out = subprocess.run(
        [sys.executable, "-c", code],
        check=False, cwd=REPO, capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"trial at local[{cores}] failed (rc={out.returncode})")
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main():
    from bench_scaling import wait_for_quiet_host

    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=int(os.environ.get("SPARK_GRAFT_SKETCH_DOCS", "50000")))
    p.add_argument("--low", type=int, default=2)
    p.add_argument("--high", type=int, default=8)
    p.add_argument("--trials", type=int, default=2)
    p.add_argument("--bands", type=int, default=16, choices=(8, 16), help=(
        "LSH geometry over the 48-hash signatures: 16 bands (r=3, "
        "guarantee-grade: miss ~1e-6/pair at j=0.83) or 8 bands (r=6, "
        "SCALE-grade: ~70x fewer background candidates, disclosed "
        "estimate-grade recall ~0.96 at j=0.83)"))
    a = p.parse_args()

    work = tempfile.mkdtemp(prefix="sketch-scaling-")
    try:
        corpus_dir = os.path.join(work, "corpus")
        gen = f"""
import sys; sys.path.insert(0, {REPO!r})
from fec_cn_support_etl_spark.session import get_spark
from fec_cn_support_etl_spark.corpus import gen_documents
spark = get_spark()
gen_documents(spark, {a.docs}).write.mode("overwrite").parquet({corpus_dir!r})
spark.stop()
"""
        subprocess.run([sys.executable, "-c", gen], check=True, cwd=REPO)

        lows, highs = [], []
        for _ in range(a.trials):  # interleave trials (time-varying CPU steal)
            wait_for_quiet_host()
            lows.append(run_trial(corpus_dir, a.low, a.docs, a.bands))
            wait_for_quiet_host()
            highs.append(run_trial(corpus_dir, a.high, a.docs, a.bands))
        r_low = max(lows, key=lambda r: r["docs_per_sec"])
        r_high = max(highs, key=lambda r: r["docs_per_sec"])
        # throughput is meaningless if the job missed pairs: the r=3
        # geometry guarantees capture (exact recall asserted); r=6 is
        # the disclosed estimate-grade mode (recall floor 0.9 asserted,
        # actual recall reported per trial)
        for r in lows + highs:
            if a.bands == 16:
                assert r["recalled"] == r["planted"], r
            else:
                assert r["planted"] and r["recalled"] / r["planted"] >= 0.9, r
        ratio = a.high / a.low
        print(json.dumps({
            "docs": a.docs,
            "bands": a.bands,
            "pairs_found": r_low["pairs_found"],
            "planted_recall": round(min(r["recalled"] / r["planted"] for r in lows + highs), 4),
            f"throughput_local[{a.low}]": r_low["docs_per_sec"],
            f"throughput_local[{a.high}]": r_high["docs_per_sec"],
            f"all_throughputs_local[{a.low}]": [r["docs_per_sec"] for r in lows],
            f"all_throughputs_local[{a.high}]": [r["docs_per_sec"] for r in highs],
            f"wall_local[{a.low}]": r_low["wall_sec"],
            f"wall_local[{a.high}]": r_high["wall_sec"],
            "core_ratio": ratio,
            "scaling_efficiency": round((r_high["docs_per_sec"] / r_low["docs_per_sec"]) / ratio, 3),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
