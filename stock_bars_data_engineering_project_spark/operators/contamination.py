"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

The training-data counterpart of dedup (operators/dedup.py): before
training, every corpus document is checked for shingle overlap against
the benchmark suite so evaluation data can be excised from the training
set. Same inverted-index machinery as n-gram Jaccard, but asymmetric —
the benchmark side is tiny relative to the corpus, so its distinct
shingle set is broadcast and the 100-TB corpus side never shuffles:
the whole check is a map-side broadcast semi-join + one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import round_half_up
from ..functions.text import word_shingles


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus document: how many of its distinct k-word shingles
    appear anywhere in the benchmark set, plus the contaminated
    fraction. Returns only documents with at least one overlapping
    shingle (the candidates to drop/inspect).

    Output: (doc_id, n_shingles, n_overlap, contamination) where
    contamination = n_overlap / n_shingles rounded to 4 places.
    """
    from ..sources.readers import balance

    # shingling is the per-row CPU here; balance() guards against a
    # coarse upstream (one row-group) serializing it on one core
    shingled = balance(corpus).select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_shingles(F.col(text_col), k)).alias("shingles"),
    ).filter(F.size("shingles") > 0)

    bench_shingles = (
        benchmark.select(
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), k))
            ).alias("shingle")
        )
        .distinct()
    )

    exploded = shingled.select(
        "doc_id", F.size("shingles").alias("n_shingles"), F.explode("shingles").alias("shingle")
    )
    hits = (
        exploded.join(F.broadcast(bench_shingles), "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap"))  # shingles pre-distinct per doc
    )
    return hits.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        round_half_up(F.col("n_overlap") / F.col("n_shingles"), 4).alias(
            "contamination"
        ),
    )
