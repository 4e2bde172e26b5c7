"""Embedding clustering: spherical k-means as DataFrame compositions.

A corpus-diversity / curation primitive (cluster-then-sample, per-
cluster quality audits, dedup-by-centroid): assign every embedding to
its nearest centroid by cosine, optionally iterate Lloyd's update.
The reference has no vector layer; this extends its lookup-table
enrichment discipline (reference scripts/individual_support.py:17-27's
broadcast dict maps) to dense vectors.

Scale shape (the same one the ANN family uses, operators/similarity.py):

* centroids are TINY (k x dim) and always broadcast — the corpus NEVER
  shuffles for assignment; scoring is one JVM-side fold per (vector,
  centroid) pair inside whole-stage codegen;
* the argmax is ``topk_per_group(k=1)`` => WindowGroupLimit, map-side
  pruned (operators/windows.py);
* Lloyd's update re-estimates centroids with ONE partial-combined
  aggregation: posexplode to (cluster, dim_pos, component), partial
  sums collapse each map partition to <= k*dim rows before the
  exchange, so the shuffle is O(k * dim * partitions) regardless of
  corpus size;
* per-iteration centroids are collected driver-side (k x dim doubles,
  bounded) to break lineage and re-broadcast — the standard iterative-
  algorithm pattern on Spark.

Determinism: assignment ranks by the 1e-6-quantized cosine with a
centroid-id tiebreak (same discipline as the ANN catalog queries), so
cluster membership is stable under engine/order-of-summation noise.
Lloyd means ARE order-of-summation sensitive in the last float bits —
tests pin set-level invariants (coverage, monotone objective,
convergence), not raw centroid bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_col
from .windows import topk_per_group


def kmeans_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_id_col: str = "cluster_id",
    centroid_vec_col: str = "cv",
    rank_scale: float | None = 1e6,
) -> DataFrame:
    """Nearest-centroid assignment by cosine: (id, cluster_id, cosine),
    one row per input vector.  Ties (at ``rank_scale`` quantization)
    break toward the smaller centroid id — a total order, so the
    assignment is deterministic and engine-portable."""
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("cluster_id"), F.col(centroid_vec_col).alias("cv")
        )
    )
    scored = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(c)
        .select("id", "cluster_id", cosine_col(F.col("v"), F.col("cv")).alias("cosine"))
    )
    if rank_scale is None:
        order = [F.desc("cosine"), F.asc("cluster_id")]
    else:
        order = [F.desc(F.floor(F.col("cosine") * F.lit(float(rank_scale)))), F.asc("cluster_id")]
    return topk_per_group(scored, ["id"], order, 1)


def _mean_centroids(assigned: DataFrame, vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Lloyd update: per-cluster elementwise mean, L2-normalized
    (spherical k-means — cosine against a unit centroid is monotone in
    the dot product against the mean)."""
    joined = assigned.select("id", "cluster_id").join(
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "id"
    )
    comp = joined.select(
        "cluster_id", F.posexplode(F.col("v").cast("array<double>")).alias("pos", "x")
    )
    means = (
        comp.groupBy("cluster_id", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cluster_id", F.expr("transform(pm, e -> e.m)").alias("cv"))
    )
    norm = F.sqrt(F.aggregate("cv", F.lit(0.0), lambda acc, x: acc + x * x))
    return means.select("cluster_id", F.transform("cv", lambda x: x / norm).alias("cv"))


def kmeans_lloyd(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Spherical k-means: deterministic seeding (the k lowest-id vectors
    — reproducible across runs and engines, unlike random init), then
    ``iters`` Lloyd rounds of broadcast-assign + one-aggregation update.
    Returns ``(assignment, centroids)`` — assignment as in
    :func:`kmeans_assign`, centroids (cluster_id, cv: array<double>).
    The pair is MUTUALLY CONSISTENT: the returned assignment is
    computed against the returned (final) centroids, so
    ``assignment.cosine`` is the similarity to the centroid the row is
    labeled with (a trailing half-step re-assign after the last Lloyd
    update — without it the assignment would lag the centroids by one
    update and argmax would not hold w.r.t. the returned centroids).

    Each round collects k x dim doubles to the driver (bounded — the
    documented iterative-algorithm lineage break); the corpus itself
    never shuffles and never leaves the JVM."""
    spark = vectors.sparkSession
    seed = (
        vectors.orderBy(F.asc(id_col))
        .limit(k)
        .select(F.col(id_col).alias("cluster_id"), F.col(vec_col).cast("array<double>").alias("cv"))
    )
    cent_rows = seed.collect()
    for _ in range(max(1, iters)):
        cent = spark.createDataFrame(cent_rows, "cluster_id: long, cv: array<double>")
        assigned = kmeans_assign(vectors, cent, id_col, vec_col)
        cent_rows = _mean_centroids(assigned, vectors, id_col, vec_col).collect()
    centroids = spark.createDataFrame(cent_rows, "cluster_id: long, cv: array<double>")
    return kmeans_assign(vectors, centroids, id_col, vec_col), centroids
