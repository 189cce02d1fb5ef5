"""Mirror of the driver's correctness gate (SURVEY.md §5.2 item 2):
run every SQL-twinned queries() entry on Spark AND its oracle_sql()
on DuckDB over the same sf0.001 parquet, compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return (df.sort_values(list(df.columns))
            .reset_index(drop=True))


def _twinned():
    import __spark_entry__ as E
    qs, osql = E.queries(), E.oracle_sql()
    return [(name, qs[name], osql[name]) for name in sorted(osql)]


@pytest.mark.parametrize("name,fn,sql",
                         _twinned(), ids=[n for n, _, _ in _twinned()])
def test_query_matches_oracle(spark, name, fn, sql):
    spark_pdf = fn(spark, SF_SMOKE).toPandas()
    con = _oracle_con()
    duck_pdf = con.execute(sql).df()
    con.close()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), name
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    pd.testing.assert_frame_equal(
        _normalize(spark_pdf), _normalize(duck_pdf),
        check_dtype=False, check_exact=False, rtol=0, atol=1e-9,
        obj=name)


def test_all_queries_have_callables():
    import __spark_entry__ as E
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 20
