"""Round-10 single-parse fast paths: a str (SQL column reference)
argument must produce VALUES identical to the loop/lambda-built Column
form it replaces — the conversion law every `*_sql` twin was verified
against at conversion time, pinned here so a later edit to one side
cannot silently drift the other.

Edge rows cover the semantics the twins must preserve: empty string /
whitespace-only text (zero-token divisions), regex-special characters,
the zero vector (unit_normalize / quantize passthrough), and NULL-free
float arrays (the as_double promotion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.functions import text as TX
from stock_bars_data_engineering_project_spark.functions import (
    vectors as V,
)
from stock_bars_data_engineering_project_spark.operators.similarity import (
    l2sq,
)


@pytest.fixture(scope="module")
def text_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, ""),
        (3, "   "),
        (4, "!!! ... ### a@b.co 555-123-4567"),
        (5, "héllo wörld … the of an it"),
        (6, "a"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [0.1, -0.25, 3.5, 0.0] * 4, [1.0, 2.0, -0.5, 0.125] * 4),
        (2, [0.0] * 16, [0.0] * 16),
        (3, [1e-8, -1e8, 127.0, -127.0] * 4, [0.5] * 16),
    ]
    return spark.createDataFrame(
        rows, "id long, va array<float>, vb array<float>"
    )


def _assert_identical(df, old, new):
    out = df.select(old.alias("o"), new.alias("n"))
    assert str(out.schema["o"].dataType) == str(out.schema["n"].dataType)
    mism = out.filter(
        ~(
            (F.col("o").isNull() & F.col("n").isNull())
            | (F.col("o") == F.col("n"))
        )
    ).count()
    assert mism == 0


@pytest.mark.parametrize(
    "helper",
    [
        TX.tokens,
        TX.token_count,
        TX.bpe_ish_token_count,
        TX.stopword_ratio,
        TX.punct_ratio,
        TX.mean_word_len,
        TX.lang_id,
        TX.quality_score,
        TX.rolling_fingerprint,
    ],
)
def test_text_str_path_matches_column_form(text_df, helper):
    _assert_identical(text_df, helper(F.col("text")), helper("text"))


@pytest.mark.parametrize(
    "mk",
    [
        lambda col: V.as_double(col),
        lambda col: V.norm(col),
        lambda col: V.unit_normalize(col),
        lambda col: V.truncate_dims(col, 8),
        lambda col: V.truncate_dims(col, 8, renormalize=False),
        lambda col: V.quantize_int8(col),
    ],
)
def test_vector_unary_str_path_matches_column_form(vec_df, mk):
    _assert_identical(vec_df, mk(F.col("va")), mk("va"))


@pytest.mark.parametrize(
    "mk",
    [
        lambda a, b: V.dot(a, b),
        lambda a, b: V.cosine(a, b),
        lambda a, b: l2sq(a, b),
    ],
)
def test_vector_binary_str_path_matches_column_form(vec_df, mk):
    _assert_identical(
        vec_df, mk(F.col("va"), F.col("vb")), mk("va", "vb")
    )


def test_dequantize_roundtrip_str_path(vec_df):
    _assert_identical(
        vec_df,
        V.dequantize_int8(V.quantize_int8(F.col("va"))),
        V.dequantize_int8(V.quantize_int8_sql("va")),
    )
