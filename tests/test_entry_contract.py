"""Replicates the driver's verify: entry() smoke, each queries() entry vs
its oracle_sql() via DuckDB — row count, column names, and exact value
match after column-name sort (the driver's order-insensitive hash)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) >= 1
    assert out.columns == ["metric", "estimate", "exact"]


def test_every_query_has_oracle():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10


@pytest.mark.parametrize("name", list(entrymod.queries()))
def test_query_matches_oracle(spark, con, name):
    fn = entrymod.queries()[name]
    got = _normalize(fn(spark, SF).toPandas())
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"{name}: no oracle"
    want = _normalize(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), f"{name} columns"
    assert len(got) == len(want), f"{name} rows"
    for c in got.columns:
        gc, wc = got[c], want[c]
        if gc.dtype.kind == "f":
            assert (abs(gc - wc) < 1e-9).all(), f"{name}.{c}"
        else:
            assert gc.astype(str).tolist() == wc.astype(str).tolist(), f"{name}.{c}"
