"""Corpus-model quality scoring — signals that need the corpus itself
as the model (unlike functions/text.py's per-row heuristics, which are
map-only): today the CCNet-style unigram-LM surprisal gate.

Scale shape: the model is the corpus's own token-count table —
token-cardinality-sized (the same bound TF-IDF's document-frequency
table carries), built by one partial-aggregable wordcount shuffle whose
map-side combine absorbs Zipf skew. Scoring is one token-keyed join of
the exploded corpus against that table plus a broadcast 1-row total,
then one per-doc mean aggregate. Nothing quadratic, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def unigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean surprisal -ln p(token) under the corpus's own
    unigram model (lower-cased whitespace tokens, empties dropped).
    Boilerplate, gibberish, and wrong-language documents have unusual
    token mixes and score HIGH — the standard perplexity-style quality
    gate, with the corpus itself as the language model so no external
    artifact is needed.

    Documents with no non-empty tokens have no defined score and emit
    no row (they drop out of the token join on any engine).

    ``counts`` optionally supplies a precomputed (token, n) unigram
    table (a caller that already built the vocabulary — e.g. the
    term-statistics suite — avoids a second wordcount pass over the
    corpus). It MUST come from the same tokenization: lower-cased
    whitespace tokens, empties dropped.

    Returns (id_col, score) with the RAW double score — display
    rounding belongs to the caller (functions.scalars.round_half_up).
    """
    ltoks = docs.select(
        id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).filter(F.col("token") != "")
    if counts is None:
        counts = ltoks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("total"))
    return (
        ltoks.join(counts, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.avg(-F.log(F.col("n").cast("double") / F.col("total"))).alias(
                "score"
            )
        )
    )
