"""In-engine deterministic text embedder — feature-hashed char n-grams.

Closes the text→vector gap: every embedding consumer in this engine
(semantic dedup, SemDeDup cells, ANN indexes, contrastive mining,
embedding decontamination) takes an `array<float>` column that until now
had to arrive pre-computed (the `embeddings` table). `hash_embed` makes
one from raw text with ZERO external models: the classic feature-hashing
trick (Weinberger et al. 2009, the fastText-subword/HashingVectorizer
family) over char k-grams — each gram hashes to a dimension and a ±1
sign, grams accumulate, the vector L2-normalizes. Deterministic (the
engine's md5 discipline, so a DuckDB oracle or pure-Python twin
recomputes identical vectors bit-for-bit), language-agnostic, and
robust to small edits: two texts sharing most of their k-grams land
near each other in cosine, which is exactly the signal the near-dup
family consumes.

Not a semantic model — "dog" and "canine" stay far apart. It is the
honest in-engine baseline: surface-similarity embeddings good enough to
drive the dedup/blocking machinery end to end, with the same column
contract as a learned model's output, so swapping in real embeddings is
a column substitution.

Scale shape: one explode of the gram array, two partial-aggregable
groupBys keyed on the doc id (component sum, then map→array assembly —
the warehouse `_file_bloom` idiom), one left join back to the input.
Linear in corpus size, no driver state, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_bucket48
from .trigram import char_ngrams


def hash_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    k: int = 3,
    out_col: str = "embedding",
) -> DataFrame:
    """Append ``out_col``: the L2-normalized ``dim``-length
    feature-hashed char ``k``-gram vector of ``text_col`` (lowercased).

    Each gram g contributes sign(g) to component bucket(g), both from
    the engine's 48-bit md5 idiom (salts ``embed`` / ``embsign``), so
    the pure-Python twin in the tests replays vectors exactly. Texts
    with no k-gram (shorter than k, or NULL) get a NULL embedding —
    absence of evidence, not a zero vector that would cosine-match
    nothing honestly. The degenerate all-cancelled vector (norm 0)
    also yields NULL.
    """
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if out_col in df.columns:
        raise ValueError(
            f"hash_embed writes {out_col!r}; input already has that column"
        )
    grams = df.select(
        id_col,
        F.explode(char_ngrams(F.lower(F.col(text_col)), k)).alias("_g"),
    )
    comp = (
        grams.select(
            id_col,
            md5_bucket48(F.col("_g"), dim, salt="embed")
            .cast("int")
            .alias("_b"),
            (
                md5_bucket48(F.col("_g"), 2, salt="embsign") * 2 - 1
            ).cast("double").alias("_s"),
        )
        .groupBy(id_col, "_b")
        .agg(F.sum("_s").alias("_v"))
    )
    assembled = comp.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("_b", "_v"))).alias("_m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("int")), F.lit(0.0)
        ),
    )
    norm = F.sqrt(
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    vec = F.when(
        norm > 0,
        F.transform(arr, lambda x: (x / norm).cast("float")),
    )
    vecs = assembled.select(id_col, vec.alias(out_col))
    return df.join(vecs, id_col, "left")
