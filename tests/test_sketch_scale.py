"""Pins the semantics of the SCALE-GRADE sketch geometries (VERDICT r4
weak #2 / next-round #2):

- ``minhash_neardup_pairs_scale`` (8 bands x 6 hashes) is the one
  catalog query deliberately NOT oracle-backed — these tests are the
  conscious replacement the parity suite's allowlist points at:
  its output is a strict SUBSET of the exact >= 0.8 Jaccard pair set
  (precision 1.0 — survivors still pass the exact integer-threshold
  verify), with disclosed estimate-grade recall (~0.91 at the j=0.8
  floor, ~0.96+ on the fixture's actual pair population).
- The r=6 geometry must actually deliver the candidate-volume collapse
  that motivates it (~70x analytic at j_bg=0.3; >= 5x asserted
  conservatively, 218x measured at sf0.1).
- ``simhash_candidates_probe`` (6 wide chunks + single-bit multi-probe)
  must capture EVERY pair with Hamming <= 11 — the certainty guarantee
  the oracle-exact simhash catalog query leans on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fec_cn_support_etl_spark.operators.dedup import (
    char_shingles,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_candidates_probe,
)
from fec_cn_support_etl_spark.plans import catalog
from fec_cn_support_etl_spark.sources.tpch import load_table


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def test_scale_mode_subset_with_high_recall(spark, sf_dir):
    exact = catalog.QUERIES["minhash_neardup_pairs"](spark, sf_dir)
    scale_df = catalog.QUERIES["minhash_neardup_pairs_scale"](spark, sf_dir)
    exact_pairs = _pairs(exact)
    scale_rows = scale_df.collect()
    scale_pairs = {(r["id_a"], r["id_b"]) for r in scale_rows}
    # precision 1.0: subset of the exact pair set, every emitted jaccard
    # clears the same 4/5 threshold (the verify stage is identical)
    assert scale_pairs <= exact_pairs
    assert all(r["jaccard"] >= 0.8 for r in scale_rows)
    # estimate-grade recall, disclosed: >= 0.85 asserted (analytic floor
    # 0.91 at j=0.8; measured 1.0 on the sf0.001-0.1 fixtures because
    # the planted pairs sit at j >= 0.83 where the miss rate is ~4%/pair
    # and the fixed hash family happened to capture all of them)
    assert exact_pairs, "fixture has no true pairs — recall undefined"
    recall = len(scale_pairs) / len(exact_pairs)
    assert recall >= 0.85, f"scale-mode recall {recall:.3f} below disclosed floor"


def test_scale_geometry_cuts_candidate_volume(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    sh = char_shingles(d, "doc_id", "text", k=5).persist()
    try:
        sig = minhash_signatures(sh, 48).persist()
        n_guarantee = minhash_lsh_pairs(sig, bands=16).count()
        n_scale = minhash_lsh_pairs(sig, bands=8).count()
        sig.unpersist()
    finally:
        sh.unpersist()
    # the whole point of r=6: background band collisions collapse
    # (measured: 1.79M -> 8.2k at sf0.1, 218x; assert conservatively)
    assert n_scale * 5 <= n_guarantee, (n_scale, n_guarantee)


def test_probe_candidates_capture_hamming_le_11(spark):
    # base simhash plus one doc per flipped-bit-count 1..13, flipping
    # spread-out bit positions (worst case for chunk locality: bits
    # land in as many different chunks as possible)
    base = 0x0123_4567_89AB_CDEF
    docs = [(0, base)]
    flip_positions = [0, 11, 22, 33, 44, 55, 5, 16, 27, 38, 49, 60, 7]
    for d, k in enumerate(range(1, 14), start=1):
        v = base
        for p in flip_positions[:k]:
            v ^= 1 << p
        docs.append((d, v))
    sims = spark.createDataFrame(docs, "id long, simhash long")
    got = _pairs(simhash_candidates_probe(sims, super_chunks=6))
    for d, k in enumerate(range(1, 14), start=1):
        if k <= 11:  # certainty region: 6 chunks, <= 1 error in some chunk
            assert (0, d) in got, f"hamming-{k} pair missed — guarantee broken"
    # sanity: the prefilter arg threads through
    filtered = simhash_candidates_probe(sims, super_chunks=6, max_hamming=4)
    assert all(
        r["id_b"] <= 4 or r["id_a"] != 0
        for r in filtered.select("id_a", "id_b").collect()
    )


def test_probe_candidates_match_narrow_chunk_pairs(spark, sf_dir):
    """On real fixture data the probe geometry and the legacy 11-narrow-
    chunk split must agree on every pair within the shared certainty
    region (Hamming <= 10)."""
    from fec_cn_support_etl_spark.operators.dedup import (
        simhash_candidates,
        simhash_from_hashes,
    )

    d = load_table(spark, sf_dir, "documents")
    sh = char_shingles(d, "doc_id", "text", k=5)
    sims = simhash_from_hashes(sh.withColumnRenamed("sh", "th")).persist()
    try:
        old = _pairs(simhash_candidates(sims, chunks=11, max_hamming=10))
        new = _pairs(simhash_candidates_probe(sims, super_chunks=6, max_hamming=10))
    finally:
        sims.unpersist()
    assert old == new
