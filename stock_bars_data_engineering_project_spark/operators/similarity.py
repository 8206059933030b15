"""Similarity search over embedding columns.

Two tiers, same output contract (query_id, vec_id, cos, rank):

  * ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
    query set against the full corpus, one pass, no shuffle of the
    corpus side. This is the correctness baseline AND the right plan
    whenever |queries| is small — at 100 TB the corpus streams through
    codegen'd array arithmetic once.

  * ``lsh_ann_topk`` — approximate top-k via random-hyperplane LSH:
    bucket every vector by the sign pattern of ``n_planes``
    MD5-seeded hyperplanes (deterministic, no RNG state to ship),
    probe only the query's bucket ring (hamming <= probe_radius), rank
    within candidates. Trades recall for a ~(corpus/buckets) read
    reduction — the scale path when queries are many.

Ranking is deterministic: order by (rounded cosine desc, vec_id) so
ties break identically in any engine — required for oracle hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import round_half_up
from ..functions.vectors import as_double, cosine, dot
from ..sources.readers import balance


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k neighbors for each query vector."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = balance(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", round_half_up(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _hyperplane(dim: int, plane_idx: int) -> F.Column:
    """Deterministic pseudo-random hyperplane: component i is
    ``(md5_byte(plane, i) / 255 - 0.5)`` — seedable, identical on every
    executor and every engine, no RNG broadcast needed."""
    comps = [
        F.conv(F.substring(F.md5(F.lit(f"plane:{plane_idx}:{i}")), 1, 2), 16, 10).cast(
            "double"
        )
        / 255.0
        - 0.5
        for i in range(dim)
    ]
    return F.array(*comps)


def lsh_bucket(vec: F.Column, dim: int, n_planes: int = 8) -> F.Column:
    """Sign-pattern bucket id in [0, 2^n_planes)."""
    v = as_double(vec)
    bucket = F.lit(0)
    for p in range(n_planes):
        sign = F.when(dot(v, _hyperplane(dim, p)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + sign * F.lit(2**p)
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    probe_radius: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose bucket is
    within ``probe_radius`` sign-flips of the query's bucket (multi-probe
    LSH), then exact-rank the candidates."""
    c = balance(corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))).select(
        "vec_id",
        "c_vec",
        lsh_bucket(F.col("c_vec"), dim, n_planes).alias("c_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("q_bucket"),
    )
    cand = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .filter(
            F.bit_count(
                F.col("c_bucket").bitwiseXOR(F.col("q_bucket"))
            )
            <= probe_radius
        )
        .withColumn("cos", round_half_up(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )
