"""Embedding similarity search (training-data pipeline op).

* :func:`cosine_topk_bruteforce` — exact top-k over an ``array<float>``
  column, dot products computed JVM-side with ``F.zip_with`` +
  ``F.aggregate`` (sequential left fold — deterministic order, matching a
  sequential oracle), broadcast small query side, window rank.

* :func:`lsh_bucketed_ann` — the scale path: random-hyperplane signatures
  from md5-derived deterministic sign planes; candidates meet on the
  signature prefix (one equi-join), exact re-rank inside buckets only.
  At 10^12 rows this turns O(n*q) into O(q * bucket_size).

* :func:`embedding_near_dup` — near-duplicate pairs by cosine >= threshold
  inside LSH buckets (the embedding flavor of operators/dedup.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors for each query vector: broadcast queries x
    corpus, JVM-side fold dot product, deterministic tie-break on
    (cosine desc, neighbor_id asc). cosine rounded to absorb engine-order
    FP noise when compared against an oracle."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    # cast to double before the fold so accumulation is float64
    qa = F.transform(F.col("_qv"), lambda v: v.cast("double"))
    ca = F.transform(F.col("_cv"), lambda v: v.cast("double"))
    cos = _dot(qa, ca) / (_norm(qa) * _norm(ca))
    joined = joined.withColumn("cosine", F.round(cos, round_digits))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_signature(
    df: DataFrame, dim: int, n_planes: int = 16, vec_col: str = "embedding",
    seed: int = 42, out: str = "lsh_sig",
) -> DataFrame:
    """Random-hyperplane LSH signature (int between 0 and 2^n_planes).

    Planes are deterministic +-1 vectors derived from a seeded numpy RNG
    and pushed into the plan as literals; the per-row signature is a pure
    JVM fold (no UDF)."""
    rng = np.random.default_rng(seed)
    planes = rng.choice([-1.0, 1.0], size=(n_planes, dim))
    sig = F.lit(0).cast("bigint")
    arr = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(float(c)) for c in planes[p]])
        dot = _dot(arr, coeffs)
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn(out, sig)


def lsh_bucketed_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN: exact re-rank restricted to the query's LSH bucket. Recall
    depends on n_planes; multiple probe tables can be unioned for higher
    recall (left to the caller)."""
    c = hyperplane_signature(corpus, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "lsh_sig"
    )
    q = hyperplane_signature(queries, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "lsh_sig"
    )
    joined = c.join(F.broadcast(q), "lsh_sig").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    qa = F.transform(F.col("_qv"), lambda v: v.cast("double"))
    ca = F.transform(F.col("_cv"), lambda v: v.cast("double"))
    cos = _dot(qa, ca) / (_norm(qa) * _norm(ca))
    joined = joined.withColumn("cosine", F.round(cos, 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup(
    corpus: DataFrame, threshold: float = 0.95, dim: int = 64,
    n_planes: int = 12, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate (a, b) pairs with cosine >= threshold, candidates
    restricted to same LSH bucket (self-join on signature)."""
    sig = hyperplane_signature(corpus, dim, n_planes, vec_col)
    a = sig.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_av"), "lsh_sig")
    b = sig.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_bv"), "lsh_sig")
    pairs = a.join(b, "lsh_sig").filter(F.col("a") < F.col("b"))
    aa = F.transform(F.col("_av"), lambda v: v.cast("double"))
    ba = F.transform(F.col("_bv"), lambda v: v.cast("double"))
    cos = _dot(aa, ba) / (_norm(aa) * _norm(ba))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
