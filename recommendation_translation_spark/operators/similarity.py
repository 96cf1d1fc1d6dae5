"""Similarity search over an embedding column (extension surface;
SURVEY.md §7 step 7).

Two tiers, per the standard ANN playbook:

- **brute-force cosine top-k** — the exactness baseline.  The query set
  is broadcast (it is small by construction); the candidate side streams
  through a single codegen'd stage computing the dot product with
  ``zip_with`` + ``aggregate`` array expressions (no Python in the
  loop).  Cost is |Q|·|C| — correct at any scale where |Q| is bounded.
- **random-hyperplane LSH buckets** — the scale path.  Sign bits of
  ``h`` deterministic pseudo-random hyperplanes (seeded via the md5
  cross-engine hash, so the DuckDB oracle reproduces them exactly)
  bucket the vectors; top-k runs within matching buckets only.  Recall
  is tunable with ``n_bits``/multi-probe; the plan replaces the cross
  join with an equi-join on the bucket key.

Embeddings are float32 on disk; both engines cast to double before the
fold, and both fold left-to-right, so dot products match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import cross_engine_hash

__all__ = [
    "dot",
    "l2_norm",
    "cosine_topk",
    "hyperplane_bits",
    "ann_lsh_topk",
    "centroids_by_label",
]


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-to-right fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    ``queries`` is (query_id, query_vec) — broadcast; ``emb`` is the
    candidate corpus.  Self-matches (same id) are excluded.  Ties on
    (rounded) cosine break by candidate id so results are deterministic
    and engine-independent.
    """
    cand = emb.select(
        F.col(id_col).alias("cand_id"), _as_double(vec_col).alias("cvec")
    ).withColumn("cnorm", l2_norm(F.col("cvec")))
    q = queries.select(
        F.col("query_id"), F.col("query_vec").cast("array<double>").alias("qvec")
    ).withColumn("qnorm", l2_norm(F.col("qvec")))
    scored = (
        cand.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), 8),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rk").alias("rk"))
    )


def hyperplane_weight(i: int, j: int, seed: str = "hp") -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    Derived from ``md5("<seed>:<i>:<j>")`` exactly like the in-plan
    cross-engine hash; computed driver-side so the weights are plan
    literals (and inlined identically into the DuckDB oracle SQL)."""
    import hashlib

    h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def hyperplane_bits(vec: Column, n_bits: int, dim: int, seed: str = "hp") -> Column:
    """LSH bucket id: sign bits of ``n_bits`` deterministic hyperplanes,
    as one long.  Weights are literals → the projections run inside a
    single codegen'd stage."""
    bucket = F.lit(0).cast("long")
    for i in range(n_bits):
        proj = F.lit(0.0)
        for j in range(dim):
            proj = proj + vec[j] * F.lit(hyperplane_weight(i, j, seed))
        bucket = bucket + F.when(proj > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: cosine ranking restricted to candidates in the
    query's hyperplane bucket.  Same output shape as ``cosine_topk``."""
    cand = emb.select(
        F.col(id_col).alias("cand_id"), _as_double(vec_col).alias("cvec")
    )
    cand = cand.withColumn("bucket", hyperplane_bits(F.col("cvec"), n_bits, dim)) \
               .withColumn("cnorm", l2_norm(F.col("cvec")))
    q = queries.select(
        F.col("query_id"), F.col("query_vec").cast("array<double>").alias("qvec")
    )
    q = q.withColumn("bucket", hyperplane_bits(F.col("qvec"), n_bits, dim)) \
         .withColumn("qnorm", l2_norm(F.col("qvec")))
    scored = (
        cand.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), 8),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rk").alias("rk"))
    )


def centroids_by_label(emb: DataFrame, label_col: str = "label",
                       vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Per-label centroid, long form: (label, pos, centroid) — the
    elementwise mean via posexplode + groupBy, one shuffle."""
    exploded = emb.select(
        F.col(label_col), F.posexplode(_as_double(vec_col)).alias("pos", "v")
    )
    return (
        exploded.groupBy(label_col, "pos")
        .agg(F.round(F.avg("v"), 8).alias("centroid"))
    )
