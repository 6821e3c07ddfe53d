"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline; sign-LSH bucketing as the
scale path (prune to one bucket before scoring). Dot products run in
native `aggregate`/`zip_with` column algebra — JVM-side, no Python.

Scale notes (10^9+ vectors):
- brute force is one narrow map + TakeOrdered: no shuffle of the vector
  table, the query vector broadcasts as a literal plan constant.
- sign-LSH: bucket id is 8 sign bits of fixed dims → 256 buckets;
  repartition/bucket the table by `bucket` at rest and the probe prunes
  to ~1/256 of the data (partition pruning on a stored table). An IVF
  variant swaps the bucket function for a trained-centroid argmin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-12


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def with_cosine(df: DataFrame, query: list[float],
                vec_col: str = "embedding") -> DataFrame:
    """cos(v, q) as a column, rounded to 6dp (stable across engines)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    cos = _dot(F.col(vec_col), q) / (
        (_norm(F.col(vec_col)) * _norm(q)) + F.lit(_EPS)
    )
    return df.withColumn("cos_sim", F.round(cos, 6))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force top-k (ANN baseline). orderBy+limit compiles to
    TakeOrdered — per-partition heaps, no global sort materializes."""
    return (
        with_cosine(df, query, vec_col)
        .select(id_col, "cos_sim")
        .orderBy(F.desc("cos_sim"), F.col(id_col))  # deterministic ties
        .limit(k)
    )


def sign_bucket(vec_col: str = "embedding", n_bits: int = 8):
    """Sign-LSH bucket id: bit d = (v[d] >= 0), d in [0, n_bits)."""
    bucket = F.lit(0)
    for d in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), d + 1) >= 0, F.lit(1 << d)
        ).otherwise(F.lit(0))
    return bucket


def embedding_neardup_pairs(df: DataFrame, threshold: float = 0.9,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            n_bits: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked.

    Candidate pairs come from a self-join on the sign-LSH bucket (the
    blocking key — at 10^9 vectors the join shuffles bucket-sized groups,
    never all-pairs), then exact cosine filters to ≥ threshold. Sign-LSH
    preserves high-cosine neighbors with high probability; for recall
    beyond one bucket, union several rotated bucket functions."""
    bucketed = df.withColumn("bucket", sign_bucket(vec_col, n_bits))
    a = bucketed.select(F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("va"), "bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("vb"), "bucket")
    cos = _dot(F.col("va"), F.col("vb")) / (
        (_norm(F.col("va")) * _norm(F.col("vb"))) + F.lit(_EPS))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def lsh_bucket_topk(df: DataFrame, query: list[float], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_bits: int = 8) -> DataFrame:
    """Approximate top-k: score only the query's sign-LSH bucket.
    On a stored table bucketed by this id the filter becomes partition
    pruning; here it is a pushed-down scan filter."""
    qb = 0
    for d in range(n_bits):
        qb |= (1 << d) if query[d] >= 0 else 0
    return (
        df.withColumn("bucket", sign_bucket(vec_col, n_bits))
        .filter(F.col("bucket") == qb)
        .transform(lambda d: with_cosine(d, query, vec_col))
        .select(id_col, "bucket", "cos_sim")
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )
