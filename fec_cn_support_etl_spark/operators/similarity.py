"""Similarity search over an embedding column (array<float>).

Two paths, per the scale playbook:
- brute_force_topk: exact cosine top-k of every query against the
  corpus. Dot products run JVM-side (zip_with + aggregate) inside
  codegen; queries are broadcast. Baseline / ground truth.
- lsh_bucketed_topk: random-hyperplane LSH (deterministic planes from a
  seeded numpy RandomState, applied as a vectorized pandas UDF doing
  one matmul per Arrow batch). Probing only same-bucket corpus rows
  cuts the candidate set ~2^bits-fold; multi-probe over Hamming-1
  neighbors trades recall for cost.

At 100 TB the corpus side is partitioned; the broadcast-query pattern
means NO shuffle of the corpus at all for brute force, and the LSH
variant shuffles only (bucket, id, vec) once to co-locate buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from .windows import topk_per_group


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def with_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    return df.withColumn(out, _norm(F.col(vec_col)))


def cosine_col(a, b):
    """Cosine similarity of two array columns as a Column expression."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast(queries) x corpus.

    Result: (query_id, id, cosine) — k rows per query, cosine desc,
    id asc tiebreak (total order => deterministic).
    """
    q = F.broadcast(queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")))
    scored = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).crossJoin(q).select(
        "query_id", "id", cosine_col(F.col("qv"), F.col("v")).alias("cosine")
    )
    return topk_per_group(scored, ["query_id"], [F.desc("cosine"), F.asc("id")], k)


def hyperplane_bucket_udf(dim: int, bits: int = 8, seed: int = 42):
    """Vectorized pandas UDF: embedding -> int bucket via sign(P @ v).

    Planes are generated once per executor from a fixed seed (cheap,
    deterministic — avoids shipping the matrix) and applied with one
    numpy matmul per Arrow batch: zero per-row Python.
    """

    @pandas_udf(IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        planes = np.random.RandomState(seed).randn(dim, bits)
        m = np.stack(vecs.apply(np.asarray).to_numpy())
        signs = (m @ planes) > 0
        weights = (1 << np.arange(bits)).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int32))

    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    dim: int,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: compare only within matching
    hyperplane-LSH buckets. Recall < 1; cost ~ 1/2^bits of brute force.
    """
    bucket = hyperplane_bucket_udf(dim, bits, seed)
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn("bucket", bucket(F.col("v")))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")).withColumn(
        "bucket", bucket(F.col("qv"))
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "id", cosine_col(F.col("qv"), F.col("v")).alias("cosine")
    )
    return topk_per_group(scored, ["query_id"], [F.desc("cosine"), F.asc("id")], k)


def embedding_neardup_pairs(df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95, bits: int = 8, dim: int = 64, seed: int = 42) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, restricted
    to same-LSH-bucket candidates (near-dups almost surely collide)."""
    bucket = hyperplane_bucket_udf(dim, bits, seed)
    t = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn("bucket", bucket(F.col("v")))
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(b, on=[F.col("a.bucket") == F.col("b.bucket"), F.col("a.id") < F.col("b.id")])
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_col(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
