"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force baseline: broadcast the (small) query
  set, cosine via native ``zip_with``/``aggregate`` arithmetic (JVM
  codegen, no Python), per-query top-k via window.  Exact; cost O(n·q).
* :func:`lsh_ann_topk` — the scale path: random-hyperplane signatures
  bucket the corpus; each query probes only its bucket (equi-join instead
  of a cross join), then exact cosine re-ranks within the bucket.
  Approximate; recall tunable via ``planes`` (fewer planes = bigger
  buckets = higher recall, more compute).

Both shapes survive 100×: brute force scales with a broadcast (queries are
small by construction); ANN turns the cross join into a hash-partitioned
equi-join on the signature.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    """Native dot product: fold left in element order (deterministic float
    summation — matches a sequential loop bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query (queries broadcast).  Ties broken by
    neighbor id for full determinism."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    scored = corpus.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_expr(F.col(vec_col), F.col("_qv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(planes: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((planes, dim))


def hyperplane_signature(
    df: DataFrame, vec_col: str = "embedding", planes: int = 16,
    seed: int = 42, dim: int = 64,
) -> DataFrame:
    """Adds ``sig long``: random-hyperplane sign bits packed into an int.
    The planes are literal arrays, so the signature is pure native
    arithmetic (codegen) — no UDF, no shuffle."""
    H = _hyperplanes(planes, dim, seed)
    sig = F.lit(0).cast("long")
    for j in range(planes):
        plane = F.array(*[F.lit(float(v)) for v in H[j]])
        bit = (dot_expr(F.col(vec_col), plane) > 0).cast("long")
        sig = sig + bit * F.lit(2**j).cast("long")
    return df.withColumn("sig", sig)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by hyperplane signature,
    equi-join on the bucket, exact cosine re-rank inside."""
    c = hyperplane_signature(corpus, vec_col, planes, seed, dim)
    q = hyperplane_signature(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        "_qv", planes, seed, dim,
    )
    scored = c.join(F.broadcast(q), "sig").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_expr(F.col(vec_col), F.col("_qv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
