"""Sliding-window chunking: count law, coverage completeness, overlap
reconstruction, short-doc clamp, and loud NULL contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.operators.chunking import chunk_documents
from stock_bars_data_engineering_project_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"

CHUNK, OVERLAP = 8, 3
STRIDE = CHUNK - OVERLAP


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_chunks(text, size=CHUNK, overlap=OVERLAP):
    toks = text.split(" ")
    stride = size - overlap
    n_chunks = max(1, math.ceil((len(toks) - overlap) / stride))
    return [
        " ".join(toks[i * stride : i * stride + size]) for i in range(n_chunks)
    ]


def test_matches_reference_slicer(spark):
    texts = [
        " ".join(f"t{j}" for j in range(n)) for n in (1, 2, 3, 7, 8, 9, 12, 13, 40)
    ]
    got = (
        chunk_documents(_mk(spark, texts), chunk_size=CHUNK, overlap=OVERLAP)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    want = {
        (i, j): c for i, t in enumerate(texts) for j, c in enumerate(_py_chunks(t))
    }
    assert {(r.doc_id, r.chunk_id): r.chunk_text for r in got} == want
    for r in got:
        assert r.chunk_tokens == len(r.chunk_text.split(" "))


def test_coverage_and_overlap(spark):
    """Every token appears in some chunk; consecutive chunks share
    exactly `overlap` tokens except the (possibly shorter) last one,
    which still contributes > overlap new tokens."""
    n = 41
    text = " ".join(f"w{j}" for j in range(n))
    rows = (
        chunk_documents(_mk(spark, [text]), chunk_size=CHUNK, overlap=OVERLAP)
        .orderBy("chunk_id")
        .collect()
    )
    seen = []
    for r in rows:
        seen.extend(r.chunk_text.split(" "))
    assert set(seen) == {f"w{j}" for j in range(n)}
    for prev, cur in zip(rows, rows[1:]):
        p, c = prev.chunk_text.split(" "), cur.chunk_text.split(" ")
        shared = [t for t in c if t in p]
        assert shared == p[-OVERLAP:]  # suffix of prev == prefix of cur
        assert c[:OVERLAP] == p[STRIDE:][:OVERLAP]
        assert len(c) > OVERLAP  # no chunk is a pure suffix of its predecessor


def test_short_doc_single_chunk(spark):
    rows = chunk_documents(
        _mk(spark, ["a b", "solo"]), chunk_size=CHUNK, overlap=OVERLAP
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert all(len(v) == 1 for v in by_doc.values())
    assert by_doc[0][0].chunk_text == "a b"
    assert by_doc[1][0].chunk_tokens == 1


def test_zero_overlap_partitions_exactly(spark):
    text = " ".join(str(j) for j in range(20))
    rows = (
        chunk_documents(_mk(spark, [text]), chunk_size=6, overlap=0)
        .orderBy("chunk_id")
        .collect()
    )
    assert [r.chunk_tokens for r in rows] == [6, 6, 6, 2]
    assert " ".join(r.chunk_text for r in rows) == text


def test_param_validation(spark):
    df = _mk(spark, ["a"])
    with pytest.raises(ValueError, match="chunk_size"):
        chunk_documents(df, chunk_size=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_size=4, overlap=4)


def test_null_text_fails_loudly(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL text"):
        chunk_documents(df).collect()


def test_real_corpus_volume_law(spark):
    """On the testdata corpus the total emitted token volume equals
    sum over docs of (n + (n_chunks-1) * overlap) — the duplication the
    overlap is supposed to cost, and nothing more."""
    docs = load_table(spark, SF, "documents")
    chunks = chunk_documents(docs, chunk_size=CHUNK, overlap=OVERLAP)
    got = chunks.agg(
        F.sum("chunk_tokens").alias("tok"), F.count(F.lit(1)).alias("n_chunks")
    ).first()
    base = docs.select(
        F.size(F.split("text", " ")).alias("n"),
        F.greatest(
            F.lit(1),
            F.floor((F.size(F.split("text", " ")) - OVERLAP + STRIDE - 1) / STRIDE),
        ).alias("k"),
    ).agg(F.sum("n").alias("tok"), F.sum("k").alias("k")).first()
    assert got.n_chunks == base.k
    assert got.tok == base.tok + (base.k - docs.count()) * OVERLAP
