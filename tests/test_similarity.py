"""ANN operators vs a numpy brute-force oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fec_cn_support_etl_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _np_topk(ids, mat, qidx, k=10):
    q = mat[qidx]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:k]
    return [int(ids[i]) for i in order]


def test_brute_force_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    queries = emb.filter(F.col("vec_id") < 3)
    res = S.brute_force_topk(emb, queries, "vec_id", "embedding", "vec_id", "embedding", k=10)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["cosine"], r["id"]))
    for q in (0, 1, 2):
        mine = [i for _, i in sorted(got[q], key=lambda t: (-t[0], t[1]))]
        assert mine == _np_topk(ids, mat, q, 10)


def test_lsh_bucketed_recall(spark, emb, emb_np):
    """LSH with few bits must at least find each query itself and keep
    sane output shape; recall vs brute force reported, floor asserted."""
    ids, mat = emb_np
    queries = emb.filter(F.col("vec_id") < 10)
    res = S.lsh_bucketed_topk(emb, queries, "vec_id", "embedding", "vec_id", "embedding", dim=64, k=10, bits=2)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], set()).add(r["id"])
    recalls = []
    for q in range(10):
        truth = set(_np_topk(ids, mat, q, 10))
        found = got.get(q, set())
        assert q in found  # the query always collides with itself
        recalls.append(len(found & truth) / 10)
    assert sum(recalls) / len(recalls) >= 0.2  # 2-bit buckets ~ 1/4 of corpus probed


def test_embedding_neardup_finds_duplicated_vectors(spark, emb):
    dup = emb.filter(F.col("vec_id") < 3).withColumn("vec_id", F.col("vec_id") + 100000)
    with_dups = emb.unionByName(dup)
    pairs = S.embedding_neardup_pairs(with_dups, "vec_id", "embedding", threshold=0.999, bits=4, dim=64)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for q in (0, 1, 2):
        assert (q, q + 100000) in got
