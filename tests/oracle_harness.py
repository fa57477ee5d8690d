"""Local re-implementation of the driver's DuckDB-oracle comparison:
row-count + column names + order-insensitive values. Strict by default —
our determinism conventions (decimal-exact aggregates, final DOUBLE cast)
should produce bit-identical values, so floats are compared exactly."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from data_iceberg_sandbox_spark.sources.registry import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    key = df.astype(str)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)


# Queries allowed to return zero rows at sf0.01. Currently none: an empty
# result makes the hash comparison vacuously green (0-row == 0-row proves
# nothing — this is how tpch_q9's '%1%' predicate hid for five rounds), so
# every query must demonstrate ≥1 row or be explicitly listed here with a
# reason.
EMPTY_OK: frozenset[str] = frozenset()


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    actual = _canon(spark_df.toPandas())
    expected = _canon(con.execute(sql).fetchdf())
    if name not in EMPTY_OK:
        assert len(expected) > 0, (
            f"{name}: oracle returned 0 rows — vacuous match; fix the "
            "predicate or allowlist in EMPTY_OK with a reason"
        )
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} != oracle {len(expected)}"
    )
    assert list(actual.columns) == list(expected.columns), (
        f"{name}: columns {list(actual.columns)} != {list(expected.columns)}"
    )
    for c in actual.columns:
        ka, ke = actual[c].dtype.kind, expected[c].dtype.kind
        num = {"i", "u", "f"}
        if ka in num or ke in num:
            # integer-vs-float column kinds must agree: a stricter driver
            # hasher would see '1' vs '1.0'
            assert (ka == "f") == (ke == "f"), (
                f"{name}.{c}: dtype kind {ka} vs oracle {ke}"
            )
    for c in actual.columns:
        a, e = actual[c], expected[c]
        for i, (x, y) in enumerate(zip(a, e)):
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                xf = float("nan") if x is None else float(x)
                yf = float("nan") if y is None else float(y)
                if math.isnan(xf) and math.isnan(yf):
                    continue
                assert xf == yf, f"{name}.{c}[{i}]: {x!r} != {y!r}"
            else:
                assert str(x) == str(y), f"{name}.{c}[{i}]: {x!r} != {y!r}"
