"""Semantic deduplication (SemDeDup-style): cluster-then-pairwise
pruning of embedding-space near-duplicates.

The third blocking strategy for embedding near-dup detection, alongside
dedup.py's hyperplane-LSH and the brute-force recall oracle: first
coarse-cluster the corpus with the IVF quantizer (k-means centroids),
then compare pairs ONLY within each cluster and drop all but one member
of every connected duplicate group (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication" —
the published recipe prunes within k-means clusters exactly like this).

Scale shape:

- assignment is ivf_assign's map-only broadcast-argmin pass;
- within-cluster pair emission reuses dedup._bucket_pairs — one
  groupBy(cid) and an in-bucket expansion, never a self-join; a vector
  lives in exactly ONE cluster, so every pair has a unique emission
  site and the distinct-pair shuffle is skipped entirely
  (``distinct=False``);
- the cosine verify runs as a codegen row filter between the expansion
  and any shuffle, so only verified duplicate pairs (a tiny set) ever
  move;
- K must scale with the corpus (K ≈ N/target_cluster_size) to hold the
  per-cluster expansion bounded — same dial as the LSH plane count in
  SCALING.md. The method's documented approximation: near-duplicates
  that straddle a cluster boundary are not compared (that recall trade
  is the published algorithm's, not an implementation shortcut; the
  LSH path in dedup.py makes the opposite trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import round_half_up
from ..functions.vectors import as_double, dot, norm
from .dedup import _bucket_pairs, dedup_clusters
from .similarity import ivf_assign, kmeans_refine


def semantic_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
    centroid_stride: int = 125,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SemDeDup candidate/verify stage on its own: verified
    within-cell duplicate pairs ``(doc_a, doc_b, cos)`` with
    ``doc_a < doc_b``, cosine rounded to 4 for display and verified at
    6-digit rounding >= ``threshold`` (the shared oracle discipline).
    ``semantic_dedup`` consumes this; it is exposed separately so the
    blocking+verify core can be driver-checked as a pairs row.

    ``centroids``: optional (cid, cv) frame; defaults to the stride
    seed over the corpus, polished with ``refine_iters`` Lloyd
    iterations (similarity.kmeans_refine) when requested.
    """
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if centroids is None:
        centroids = emb.filter(F.col(id_col) % centroid_stride == 0).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
        )
        if refine_iters > 0:
            centroids = kmeans_refine(emb, centroids, n_iters=refine_iters,
                                      vec_col=vec_col, id_col=id_col)
    assigned = ivf_assign(emb, centroids, vec_col=vec_col, id_col=id_col)
    return _pairs_from_assigned(assigned, threshold)


def _pairs_from_assigned(assigned: DataFrame, threshold: float) -> DataFrame:
    # Norms hoisted to once-per-vector BEFORE the in-cell expansion —
    # the embedding_dup_pairs_blocked verify discipline (dedup.py): the
    # per-pair predicate then pays ONE dot fold instead of three
    # (dot + both norms), which is the cost driver when cells are
    # ~stride-sized (round-10 profile: the full-cosine predicate cost
    # 4.3 s isolated at sf0.1, hoisted 1.5 s). Bit-identical to
    # cosine()'s fold — norm(as_double(v)) is the same expression on
    # the same values and the division associates identically — so the
    # DuckDB oracle hash holds.
    with_n = assigned.withColumn("_n", norm(as_double(F.col("embedding"))))
    pair_cos = lambda a, b: dot(  # noqa: E731 — shared by pred + projection
        as_double(a["embedding"]), as_double(b["embedding"])
    ) / (a["_n"] * b["_n"])
    return _bucket_pairs(
        with_n,
        keys=["cid"],
        id_col="vec_id",
        payload_cols=("embedding", "_n"),
        pair_pred=lambda a, b: round_half_up(pair_cos(a, b), 6) >= threshold,
        distinct=False,  # one cluster per vector -> one emission site
    ).select(
        F.col("a.id").alias("doc_a"),
        F.col("b.id").alias("doc_b"),
        round_half_up(pair_cos(F.col("a"), F.col("b")), 4).alias("cos"),
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
    centroid_stride: int = 125,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Label every vector with its semantic-duplicate cluster and a
    keep flag. Returns ``(vec_id, cid, cluster_id, keep)``:

    - ``cid``: the k-means cell the vector pruned within;
    - ``cluster_id``: min-id connected-component label over verified
      duplicate pairs (cosine >= ``threshold`` within the cell);
      singletons label themselves;
    - ``keep``: True for the cluster's lowest id — drop the rest.

    ``centroids``: optional (cid, cv) frame; defaults to the stride
    seed over the corpus, polished with ``refine_iters`` Lloyd
    iterations (similarity.kmeans_refine) when requested.
    """
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if centroids is None:
        centroids = emb.filter(F.col(id_col) % centroid_stride == 0).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
        )
        if refine_iters > 0:
            centroids = kmeans_refine(emb, centroids, n_iters=refine_iters,
                                      vec_col=vec_col, id_col=id_col)
    assigned = ivf_assign(emb, centroids, vec_col=vec_col, id_col=id_col)

    pairs = _pairs_from_assigned(assigned, threshold).select("doc_a", "doc_b")

    clusters = dedup_clusters(pairs)
    out = assigned.select("vec_id", "cid").join(
        clusters.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
    )
    cluster_id = F.coalesce(F.col("cluster_id"), F.col("vec_id"))
    return out.select(
        "vec_id",
        "cid",
        cluster_id.alias("cluster_id"),
        (cluster_id == F.col("vec_id")).alias("keep"),
    )
