"""Regression gate for the DuckDB HUGEINT materialization hazard.

DuckDB widens integer ``SUM()`` / wide bit arithmetic to HUGEINT (int128).
When an oracle result column is HUGEINT, pandas materializes it as float64
via an int128->double rounding path that can diverge from Spark's
int64->double path by 1 ULP for magnitudes beyond 2^53 — which breaks the
driver's cross-engine value hash even though the integers are identical
(observed on ``multimodal_binary_meta``'s ``phash`` at sf0.01, round 7).

The class is invisible to Spark-vs-Python pytest pins — only the
cross-engine hash catches it, and only when a value lands near an ULP
boundary — so we pin the *type* instead: every oracle column must DESCRIBE
as a non-HUGEINT type. ``DESCRIBE`` types the query without executing it,
so this covers all 50 oracles in well under a second.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = Path("/root/testdata/sf0.001")


@pytest.mark.skipif(not SF_DIR.exists(), reason="driver testdata absent")
def test_no_oracle_column_is_hugeint():
    import __spark_entry__ as entrymod
    from stock_bars_data_engineering_project_spark.sources.readers import (
        TESTDATA_TABLES,
    )

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        huge = [(col, typ) for col, typ, *_ in desc if "HUGEINT" in typ.upper()]
        if huge:
            offenders[name] = huge

    assert not offenders, (
        "oracle columns typed HUGEINT — wrap with CAST(... AS BIGINT) to "
        f"avoid the int128->float64 1-ULP hash hazard: {offenders}"
    )


@pytest.mark.skipif(not SF_DIR.exists(), reason="driver testdata absent")
def test_no_oracle_column_is_decimal():
    """The sibling hazard for non-integers: a bare ``1.0`` literal (or
    decimal arithmetic) types as DECIMAL, which pandas materializes as
    ``decimal.Decimal`` objects — stringifying differently from Spark's
    float64 and failing the value hash on EQUAL values (observed on the
    multimodal row's wav law flags, round 8: '1.0' vs Decimal('1.0')).
    Pin the type: every oracle column must DESCRIBE as non-DECIMAL; use
    CAST(... AS DOUBLE) for literal flags and computed ratios."""
    import __spark_entry__ as entrymod
    from stock_bars_data_engineering_project_spark.sources.readers import (
        TESTDATA_TABLES,
    )

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        dec = [(col, typ) for col, typ, *_ in desc if "DECIMAL" in typ.upper()]
        if dec:
            offenders[name] = dec

    assert not offenders, (
        "oracle columns typed DECIMAL — wrap with CAST(... AS DOUBLE) to "
        f"avoid Decimal-vs-float64 hash divergence: {offenders}"
    )
