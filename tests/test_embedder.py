"""hash_embed: pure-Python replay, unit norm, edit-robustness, and the
end-to-end text → semantic-dedup wiring with zero external models."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.operators.embedder import hash_embed


def _py_embed(text: str, dim: int = 64, k: int = 3):
    text = text.lower()
    grams = [text[i : i + k] for i in range(len(text) - k + 1)]
    if not grams:
        return None
    v = [0.0] * dim
    for g in grams:
        b = int(hashlib.md5(f"embed:{g}".encode()).hexdigest()[:12], 16) % dim
        s = int(hashlib.md5(f"embsign:{g}".encode()).hexdigest()[:12], 16) % 2 * 2 - 1
        v[b] += s
    n = math.sqrt(sum(x * x for x in v))
    return None if n == 0 else [x / n for x in v]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_python_twin_replays_vectors_exactly(spark):
    texts = ["The quick brown fox", "jumps over the lazy dog", "ab"]
    got = {r["doc_id"]: r["embedding"] for r in hash_embed(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        expect = _py_embed(t)
        if expect is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(expect, abs=1e-6)


def test_unit_norm_and_null_contract(spark):
    df = hash_embed(_docs(spark, ["hello world", "xy", None, ""]))
    rows = {r["doc_id"]: r["embedding"] for r in df.collect()}
    assert sum(x * x for x in rows[0]) == pytest.approx(1.0, abs=1e-5)
    assert rows[1] is None and rows[2] is None and rows[3] is None


def test_edit_robustness(spark):
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = a.replace("lazy", "hazy")  # one-word edit
    c = "import numpy as np; return [x**2 for x in range(100)]"
    vs = {r["doc_id"]: r["embedding"] for r in hash_embed(_docs(spark, [a, b, c])).collect()}

    def cos(u, v):
        return sum(x * y for x, y in zip(u, v))

    assert cos(vs[0], vs[1]) > 0.85  # near-dup stays near
    assert cos(vs[0], vs[2]) < 0.5  # unrelated stays far


def test_end_to_end_text_to_semantic_dedup(spark):
    from stock_bars_data_engineering_project_spark.operators.dedup import (
        embedding_dup_pairs_blocked,
    )

    base = "a long enough document about distributed query engines and shuffles"
    texts = [base, base + "!", "completely different content here", "another one entirely"]
    emb = (
        hash_embed(_docs(spark, texts))
        .filter(F.col("embedding").isNotNull())
        .select(F.col("doc_id").alias("vec_id"), "embedding")
    )
    pairs = embedding_dup_pairs_blocked(emb, threshold=0.9, dim=64).collect()
    got = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])) for r in pairs}
    assert (0, 1) in got  # the planted near-dup, found with no external model
    assert all(p == (0, 1) for p in got)


def test_guards(spark):
    df = _docs(spark, ["abc"])
    for kwargs, match in [
        (dict(dim=0), "dim"),
        (dict(k=0), "k must"),
        (dict(out_col="text"), "text"),
    ]:
        with pytest.raises(ValueError, match=match):
            hash_embed(df, **kwargs)
