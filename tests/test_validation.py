"""Data-quality checks must actually catch violations — every builder
is exercised on data that FAILS its expectation (the registry query only
ever sees clean testdata, so the failure paths are pinned here)."""

from __future__ import annotations

import pytest

from stock_bars_data_engineering_project_spark.operators.validation import (
    accepted_values,
    max_watermark,
    not_null,
    ref_integrity,
    row_count,
    unique_key,
    validation_panel,
    value_range,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_not_null_counts_violations(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id long, text string"
    )
    r = _one(not_null(df, "t", "text"))
    assert (r.check, r.tbl, r.observed, r.failed, r.ok) == (
        "not_null:text", "t", 3, 2, 0
    )


def test_unique_key_counts_extra_rows_and_null_keys(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,)], "k long"
    )
    r = _one(unique_key(df, "t", "k"))
    # 4 rows, 2 distinct non-null keys -> 2 rows beyond one-per-key
    # (the duplicate AND the NULL key both count as violations)
    assert (r.observed, r.failed, r.ok) == (2, 2, 0)


def test_accepted_values_null_is_violation(spark):
    df = spark.createDataFrame([("O",), ("X",), (None,)], "s string")
    r = _one(accepted_values(df, "t", "s", ("O", "F")))
    assert (r.failed, r.ok) == (2, 0)


def test_value_range_bounds_and_guard(spark):
    df = spark.createDataFrame([(0.5,), (1.0,), (51.0,), (None,)], "q double")
    r = _one(value_range(df, "t", "q", lo=1, hi=50))
    assert (r.failed, r.ok) == (3, 0)  # 0.5 low, 51 high, NULL unknown
    r2 = _one(value_range(df, "t", "q", lo=0))
    assert (r2.failed, r2.ok) == (1, 0)  # only NULL violates
    with pytest.raises(ValueError, match="lo/hi"):
        value_range(df, "t", "q")


def test_ref_integrity_counts_orphan_keys_not_rows(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (9,), (9,), (9,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    r = _one(ref_integrity(child, "fk", parent, "pk", "child"))
    # key 9 is orphaned; 3 orphan ROWS but 1 orphan KEY
    assert (r.observed, r.failed, r.ok) == (1, 1, 0)


def test_row_count_and_watermark_empty_table_fail(spark):
    empty = spark.createDataFrame([], "id long, ts timestamp")
    assert _one(row_count(empty, "t")).ok == 0
    assert _one(max_watermark(empty, "t", "ts")).ok == 0


def test_panel_unions_and_rejects_empty(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    panel = validation_panel(
        [not_null(df, "t", "s"), unique_key(df, "t", "k")]
    )
    rows = panel.collect()
    assert [r.check for r in rows] == ["not_null:s", "unique_key:k"]
    assert all(r.ok == 1 for r in rows)
    with pytest.raises(ValueError, match="no checks"):
        validation_panel([])


def test_profile_columns_counts_and_typed_minmax(spark):
    from stock_bars_data_engineering_project_spark.operators.validation import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(2, "b"), (10, "a"), (10, None)], "v long, s string"
    )
    rows = {r.col: r for r in profile_columns(df, "t").collect()}
    assert set(rows) == {"v", "s"}
    v = rows["v"]
    assert (v.tbl, v.n_rows, v.n_null, v.n_distinct) == ("t", 3, 0, 2)
    # numeric ordering, not lexicographic: min 2 (not "10")
    assert (v.min_s, v.max_s) == ("2", "10")
    s = rows["s"]
    assert (s.n_null, s.n_distinct, s.min_s, s.max_s) == (1, 2, "a", "b")
    with pytest.raises(ValueError, match="missing"):
        profile_columns(df, "t", cols=("nope",))


def test_ref_integrity_null_child_key_is_orphan_even_with_null_parent(spark):
    from stock_bars_data_engineering_project_spark.operators.validation import (
        ref_integrity,
    )

    child = spark.createDataFrame([(1,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (None,)], "pk long")
    r = ref_integrity(child, "fk", parent, "pk", "t").collect()[0]
    # NULL references nothing: one orphan key despite the parent NULL
    assert (r.failed, r.ok) == (1, 0)


def test_corpus_report_rollup_and_python_replay(spark):
    """Dataset-card rollup: per-source rows + one NULL-keyed grand
    total from a single rollup; counts/sums replayed in Python; the
    total row equals the sum of strata."""
    import pytest
    from pyspark.sql import functions as F

    from stock_bars_data_engineering_project_spark.operators.validation import (
        corpus_report,
    )

    rows = [
        (1, "srcA", "three tokens here"),
        (2, "srcA", "two tokens"),
        (3, "srcB", "just one single doc with six"),
        # a genuine NULL-valued stratum: must NOT alias the total row
        (4, None, "null source stratum doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = corpus_report(docs).collect()
    got = {(r.source, r.is_total): r for r in out}
    assert set(got) == {
        ("srcA", False), ("srcB", False), (None, False), (None, True),
    }
    assert all(r.rollup_level == (1 if r.is_total else 0) for r in out)
    toks = {"srcA": [3, 2], "srcB": [6]}
    # the NULL stratum row carries its own stats, not the corpus total
    null_stratum = got[(None, False)]
    assert null_stratum.n_docs == 1 and null_stratum.total_tokens == 4
    got = {r.source: r for r in out if not r.is_total and r.source is not None}
    for src, ts in toks.items():
        assert got[src].n_docs == len(ts)
        assert got[src].total_tokens == sum(ts)
        assert got[src].mean_tokens == pytest.approx(
            round(sum(ts) / len(ts), 2)
        )
        assert got[src].total_chars == sum(
            len(t) for _, s, t in rows if s == src
        )
    total = {(r.source, r.is_total): r for r in out}[(None, True)]
    assert total.n_docs == 4
    assert total.total_tokens == sum(sum(v) for v in toks.values()) + 4
    assert total.total_chars == sum(len(t) for _, _, t in rows)
    assert total.p50_tokens == 3  # median of [3, 2, 6, 4]

    with pytest.raises(ValueError, match="at least one column"):
        corpus_report(docs, group_cols=())


def test_k_anonymity_report_and_guards(spark):
    import pytest

    from stock_bars_data_engineering_project_spark.operators.validation import (
        k_anonymity,
    )

    rows = (
        [("a", "en")] * 5
        + [("a", "de")] * 2
        + [("b", "en")] * 1
        + [(None, "en")] * 3   # NULL quasi value is its own class
    )
    df = spark.createDataFrame(rows, ["src", "lang"])
    r = k_anonymity(df, ("src", "lang"), k=3).collect()[0]
    assert (r.n_classes, r.min_class_size, r.n_below_k, r.n_rows_at_risk) == (
        4, 1, 2, 3,
    )
    ok = k_anonymity(df, ("src", "lang"), k=1).collect()[0]
    assert ok.n_below_k == 0 and ok.n_rows_at_risk == 0
    with pytest.raises(ValueError):
        k_anonymity(df, (), k=3)
    with pytest.raises(ValueError):
        k_anonymity(df, ("src",), k=0)


def test_l_diversity_report_and_guards(spark):
    import pytest

    from stock_bars_data_engineering_project_spark.operators.validation import (
        l_diversity,
    )

    rows = [
        ("a", "en"), ("a", "de"), ("a", "fr"),   # 3 distinct
        ("b", "en"), ("b", "en"),                # homogeneous: leaks
        ("c", "en"), ("c", None),                # NULL counts as a value
    ]
    df = spark.createDataFrame(rows, ["src", "lang"])
    r = l_diversity(df, ("src",), "lang", l=2).collect()[0]
    assert (r.n_classes, r.min_distinct_sensitive, r.n_below_l) == (3, 1, 1)
    with pytest.raises(ValueError):
        l_diversity(df, (), "lang")
    with pytest.raises(ValueError):
        l_diversity(df, ("src",), "lang", l=0)


def test_pseudonymize_deterministic_keyed_and_python_twin(spark):
    import hashlib

    from stock_bars_data_engineering_project_spark.operators.validation import (
        pseudonymize,
    )

    df = spark.createDataFrame(
        [(1, "alice@x.com", "NL"), (2, "bob@y.org", None), (3, "alice@x.com", "DE")],
        "id long, email string, country string",
    )
    got = {r["id"]: r for r in pseudonymize(df, ("email", "country"), "s3cret").collect()}
    # python twin of the token construction pins the hash family
    def tok(v):
        return "pid_" + hashlib.sha256(f"s3cret:{v}".encode()).hexdigest()[:16]

    assert got[1]["email"] == tok("alice@x.com")
    assert got[3]["email"] == got[1]["email"]  # referential integrity
    assert got[2]["country"] is None  # NULL stays NULL
    assert got[1]["country"] == tok("NL") and got[3]["country"] == tok("DE")
    # a different secret unlinks every token
    other = {r["id"]: r for r in pseudonymize(df, ("email",), "rotated").collect()}
    assert other[1]["email"] != got[1]["email"]
    # joins still work across tables sharing the secret
    dim = spark.createDataFrame([("alice@x.com", "gold")], "email string, tier string")
    joined = pseudonymize(df, ("email",), "s3cret").join(
        pseudonymize(dim, ("email",), "s3cret"), "email"
    )
    assert sorted(r["id"] for r in joined.collect()) == [1, 3]


def test_pseudonymize_guards(spark):
    from stock_bars_data_engineering_project_spark.operators.validation import (
        pseudonymize,
    )

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    for bad, match in [
        (dict(cols=("v",), secret=""), "secret"),
        (dict(cols=(), secret="s"), "column"),
        (dict(cols=("nope",), secret="s"), "nope"),
        (dict(cols=("v",), secret="s", token_len=4), "token_len"),
    ]:
        try:
            pseudonymize(df, **bad)
            raise AssertionError(f"{bad} must refuse")
        except ValueError as e:
            assert match in str(e)
