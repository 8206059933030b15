"""Hashed linear text-quality classifier (fastText-style scoring).

Production corpus pipelines gate documents with a cheap linear
classifier over hashed n-gram features (fastText's architecture:
CCNet/LLaMA-style "looks like Wikipedia" filters). This module
implements the SCORING side of that pattern Spark-first:

- features = lowercased unigrams + adjacent bigrams, built with array
  ops on the token array (zip_with over two slices) — map-side, no
  per-row Python;
- each feature hashes into a 2^20-bucket weight table (the "hashing
  trick" — vocabulary-free, OOV-safe, fixed memory);
- the per-doc margin is the mean bucket weight; score = sigmoid(margin
  * GAIN).

The weight table here is DERIVED, not trained: bucket b's weight is a
deterministic hash of ``w:<b>`` mapped to [-1, 1). That keeps the whole
path engine-portable (the registered query's DuckDB oracle replays the
identical md5 arithmetic, gating the plumbing end-to-end) and makes the
scoring layer a drop-in: swapping in real fastText weights is a
broadcast join against a (bucket, weight) table of at most 2^20 rows —
the plan shape does not change.

Scale shape: one explode + one partial-aggregable groupBy(doc_id) —
map-side combine absorbs the feature fan-out before the shuffle, and
every expression is whole-stage-codegen (no UDFs, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_bucket48
from .text import tokens

N_BUCKETS = 1 << 20
# 2^48 — the hash-prefix width used across functions/hashing idioms:
# 48 bits < 2^53 stay exact in double arithmetic on every engine
_HASH_SPAN = float(1 << 48)
# spreads the mean-of-[-1,1) margin over sigmoid's responsive range
GAIN = 8.0


def doc_features(text: Column) -> Column:
    """Lowercased unigrams + adjacent ``a_b`` bigrams as one array —
    pure array expressions (filter/slice/zip_with), map-side codegen."""
    toks = F.filter(tokens(F.lower(text)), lambda t: t != "")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def feature_bucket(feat: Column) -> Column:
    """Hashing trick: the shared 48-bit md5 bucket idiom mod 2^20
    (features come from explode and are never NULL, so the raw
    primitive applies)."""
    return md5_bucket48(feat, N_BUCKETS)


def bucket_weight(bucket: Column) -> Column:
    """Deterministic pseudo-weight in [-1, 1) for a bucket id — the
    stand-in for a trained weight table (see module docstring)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    return h / F.lit(_HASH_SPAN) * 2.0 - 1.0


def quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document classifier score in (0, 1): sigmoid(GAIN * mean
    feature weight). Documents with no non-empty token produce no
    feature rows and drop out (same contract as the surprisal arm).

    Returns ``(id_col, n_features, qscore)``.
    """
    feats = df.select(
        F.col(id_col), F.explode(doc_features(F.col(text_col))).alias("_feat")
    )
    weighted = feats.select(
        id_col, bucket_weight(feature_bucket(F.col("_feat"))).alias("_w")
    )
    margin = F.avg("_w") * GAIN
    return weighted.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_features"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("qscore"),
    )
