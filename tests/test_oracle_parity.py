"""Local mirror of the driver's DuckDB-oracle differential check
(SURVEY.md §5 item 1), run at sf0.001 for speed.

Stricter than the driver: exact value equality after sorting by all
columns (the driver hashes order-insensitively — anything passing
here passes there, modulo sf).
"""

from __future__ import annotations

import math

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
# the IVF oracle trains its centroid literals on the comparison SF —
# point it at the same dir the Spark queries run against here
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object and len(s) > 0 and s.map(
            lambda v: hasattr(v, "toordinal") if pd.notna(v) else False
        ).all():
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
    return out


def compare(spark_df, sql: str, con) -> None:
    sp = _normalize(spark_df.toPandas())
    du = _normalize(con.sql(sql).df())
    assert sorted(sp.columns) == sorted(du.columns), (
        f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(du.columns)}"
    )
    du = du[list(sp.columns)]
    assert len(sp) == len(du), f"row count: spark={len(sp)} oracle={len(du)}"
    cols = list(sp.columns)
    sp = sp.sort_values(cols, na_position="last").reset_index(drop=True)
    du = du.sort_values(cols, na_position="last").reset_index(drop=True)
    for c in cols:
        a, b = sp[c], du[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            for i, (x, y) in enumerate(zip(a, b)):
                nx = x is None or (isinstance(x, float) and math.isnan(x))
                ny = y is None or (isinstance(y, float) and math.isnan(y))
                assert nx == ny and (nx or x == y), f"{c}[{i}]: spark={x!r} oracle={y!r}"
        else:
            pd.testing.assert_series_equal(a, b, check_names=False, check_dtype=False)


NAMES = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    compare(q(spark, SF), sql, con)


def test_every_query_has_result_rows_or_documented_empty(spark):
    # smoke: every declared query at least executes at sf0.001
    for name, q in entrymod.queries().items():
        df = q(spark, SF)
        assert df.columns, name
        df.limit(1).collect()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
