"""Deduplication operators for training-data pipelines, at five rigor
levels: exact, MinHash+LSH, SimHash, inverted-index n-gram Jaccard, and
embedding-cosine. Every operator is a pure ``DataFrame -> DataFrame``
transform built from joins/groupBys/higher-order array functions — no
Python in the hot path, no driver-side materialization.

Scale shapes (the part that matters at 100 TB):
  * exact: one hash-aggregate shuffle on the content key.
  * minhash_lsh: rows explode x bands (small constant), shuffle on
    (band_idx, band_hash) — collision groups are tiny by construction, so
    the self-join never sees a quadratic blowup; candidate pairs are then
    verified with exact Jaccard.
  * ngram_jaccard: inverted-index join on shingle (pairs sharing >= 1
    shingle), count-intersections aggregate — the standard
    all-pairs-similarity shape (cf. Vernica et al.); hot shingles are the
    skew hazard -> drop ubiquitous shingles (document-frequency cap)
    exactly as real pipelines do.
  * simhash: 16-bit fingerprint per doc, self-join blocked on matching
    nibble (any of 4) -> hamming <= k filter.
  * embedding: brute-force pair cosine over a blocking-free cross join —
    the correctness baseline; the LSH-bucketed variant in similarity.py
    is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import lsh_band_hashes, minhash_signature, simhash16
from ..functions.scalars import round_half_up
from ..functions.text import tokens, word_shingles
from ..functions.vectors import cosine


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5 content key -> (n_copies, keeper =
    lowest id). One shuffle; at 100 TB the md5-of-text beats shuffling
    full documents as the group key."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper_doc_id"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (lowest id) per distinct content."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    )


def _shingled(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_shingles(F.col(text_col), k)).alias("shingles"),
    ).filter(F.size("shingles") > 0)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard verified.

    shingle -> 16 MD5-minhash sigs -> 4 bands -> explode band keys ->
    self-join on (band, key) -> distinct candidate pairs -> verify with
    exact Jaccard >= threshold. Banding bounds the join: only docs
    agreeing on an entire band ever meet.
    """
    shingled = _shingled(df, text_col, id_col, k)
    banded = shingled.select(
        "doc_id",
        "shingles",
        F.posexplode(lsh_band_hashes(minhash_signature(F.col("shingles")))).alias(
            "band_idx", "band_key"
        ),
    )
    left = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"),
        "band_idx", "band_key",
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"),
        "band_idx", "band_key",
    )
    cand = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = round_half_up(inter / union, 4)
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via an inverted-index join — finds
    EVERY pair with overlap >= 1 shingle, then filters on the exact score
    (no LSH recall loss). ``max_shingle_df`` drops shingles appearing in
    more than N docs (stop-shingles), the standard skew guard.
    """
    shingled = _shingled(df, text_col, id_col, k)
    inv = shingled.select(
        "doc_id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle")
    )
    if max_shingle_df is not None:
        hot = (
            inv.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        )
        inv = inv.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a = inv.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"), "shingle"
    )
    b = inv.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"), "shingle"
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = round_half_up(
        F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 4
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document 16-bit SimHash fingerprint."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        simhash16(tokens(F.col(text_col))).alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: block on any matching nibble (pigeonhole:
    hamming <= 3 over 4 nibbles => at least one nibble identical), then
    exact hamming filter — never a full cross join."""
    fp = simhash_fingerprints(df, text_col, id_col)
    nib = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.floor(F.col("simhash") / F.lit(16**i)).cast("int") % 16)
                    for i in range(4)
                ]
            )
        ).alias("nibble_idx", "nibble"),
    )
    a = nib.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "nibble_idx", "nibble",
    )
    b = nib.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "nibble_idx", "nibble",
    )
    return (
        a.join(b, ["nibble_idx", "nibble"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs — brute force all-pairs baseline.
    At scale, swap the cross join for the LSH bucketing in similarity.py;
    semantics (the verified filter) stay identical."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", round_half_up(cosine(F.col("v_a"), F.col("v_b")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
