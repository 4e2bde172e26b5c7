"""Spherical k-means: the invariants that hold regardless of float
summation order (raw centroid bits are order-sensitive, so tests pin
set/monotone properties, mirroring the catalog query's quantized
assignment discipline)."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from fec_cn_support_etl_spark.operators.clustering import kmeans_assign, kmeans_lloyd
from fec_cn_support_etl_spark.plans import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")
K = 8


def _emb(spark):
    return catalog._t(spark, SF_DIR, "embeddings")


def test_assign_covers_every_vector_once(spark):
    emb = _emb(spark)
    cent = emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("cv")
    )
    a = kmeans_assign(emb, cent, "vec_id", "embedding")
    n = emb.count()
    assert a.count() == n
    assert a.select("id").distinct().count() == n
    cids = {r["cluster_id"] for r in a.select("cluster_id").distinct().collect()}
    assert cids <= set(range(K))
    # a seed vector is its own nearest centroid (cosine 1 with itself)
    own = {r["id"]: r["cluster_id"] for r in a.filter(F.col("id") < K).collect()}
    assert own == {i: i for i in range(K)}


def test_assign_deterministic_under_repartition(spark):
    emb = _emb(spark)
    cent = emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("cv")
    )
    a = sorted(tuple(r) for r in kmeans_assign(emb, cent, "vec_id", "embedding").select("id", "cluster_id").collect())
    b = sorted(
        tuple(r)
        for r in kmeans_assign(emb.repartition(13), cent, "vec_id", "embedding")
        .select("id", "cluster_id")
        .collect()
    )
    assert a == b


def _objective(assigned):
    # mean cosine to the assigned centroid — Lloyd must not decrease it
    return assigned.agg(F.avg("cosine")).first()[0]


def test_lloyd_objective_monotone_and_converges(spark):
    emb = _emb(spark)
    a1, c1 = kmeans_lloyd(emb, "vec_id", "embedding", k=K, iters=1)
    a4, c4 = kmeans_lloyd(emb, "vec_id", "embedding", k=K, iters=4)
    o1, o4 = _objective(a1), _objective(a4)
    assert o4 >= o1 - 1e-9, (o1, o4)
    # centroids are unit-norm (spherical) and at most k survive
    rows = c4.collect()
    assert 0 < len(rows) <= K
    for r in rows:
        norm = math.sqrt(sum(x * x for x in r["cv"]))
        assert abs(norm - 1.0) < 1e-9
    # the returned pair is mutually consistent: re-assigning against the
    # returned centroids reproduces the returned assignment exactly
    again = kmeans_assign(emb, c4, "vec_id", "embedding", centroid_vec_col="cv")
    assert sorted(tuple(r) for r in again.select("id", "cluster_id").collect()) == sorted(
        tuple(r) for r in a4.select("id", "cluster_id").collect()
    )
