"""Engine-portable hashing primitives for near-dup detection.

MinHash and SimHash here are built on **MD5** rather than the engines'
native hash functions (xxhash64 in Spark, DuckDB's `hash`) for one
reason: MD5 is bit-identical everywhere, so the DuckDB oracle can
recompute the SAME signatures, bands, and candidate pairs — the LSH
step itself is correctness-checked, not just spot-verified.

Performance note for 100 TB: MD5-per-shingle is ~2-3x slower than
xxhash64 but both are JVM-side codegen'd expressions; swap
``F.md5`` -> ``F.xxhash64`` for production once cross-engine
verification is no longer needed — the operator shapes are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_SIGS = 16
LSH_BANDS = 4
LSH_ROWS = MINHASH_SIGS // LSH_BANDS


def minhash_signature(shingles: Column, n_sigs: int = MINHASH_SIGS) -> Column:
    """array<string> of ``n_sigs`` MinHash values: for seed s, the
    lexicographic min of ``md5(s || ':' || shingle)``. Min of a uniform
    hash family — the classic Broder estimator; string min avoids any
    cross-engine integer-parsing divergence."""
    idx = F.sequence(F.lit(0), F.lit(n_sigs - 1))
    return F.transform(
        idx,
        lambda s: F.array_min(
            F.transform(
                shingles, lambda sh: F.md5(F.concat(s.cast("string"), F.lit(":"), sh))
            )
        ),
    )


def lsh_band_hashes(signature: Column, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> Column:
    """array<string> of band keys: md5 of each contiguous ``rows``-slice
    of the signature. Two docs collide in a band iff that band's rows all
    match — the standard banding amplification."""
    idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return F.transform(
        idx,
        lambda b: F.md5(F.concat_ws("", F.slice(signature, b * rows + 1, rows))),
    )


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over tokens: bit j of the fingerprint is the sign of
    ``sum over tokens of (bit_j(md5_prefix16(token)) ? +1 : -1)``.

    16 bits (4 hex chars -> int) keeps the per-bit extraction a pair of
    integer ops in both engines; widen to 64 by repeating over 4-char
    windows if finer granularity is needed."""
    tok_val = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int")
    )
    bit_idx = F.sequence(F.lit(0), F.lit(15))
    # bit j of v extracted as floor(v / 2^j) % 2 — shiftleft/shiftright in
    # the Python DSL need literal shift amounts, pow(2, j) is exact here
    pow2 = lambda j: F.pow(F.lit(2.0), j).cast("int")  # noqa: E731
    bit_sums = F.transform(
        bit_idx,
        lambda j: F.aggregate(
            tok_val,
            F.lit(0),
            lambda acc, v: acc
            + F.when(F.floor(v / pow2(j)).cast("int") % 2 == 1, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_sums,
            bit_idx,
            lambda s, j: F.when(s > 0, pow2(j)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def hamming16(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
