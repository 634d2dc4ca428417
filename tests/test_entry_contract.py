"""Mini replica of the driver's correctness gate at sf0.001: every
queries() entry with an oracle must match DuckDB exactly (count, column
names, order-insensitive values)."""

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = E.queries()[name]
    spark_pdf = fn(spark, SF).toPandas()
    oracles = E.oracle_sql()
    if name not in oracles:
        assert len(spark_pdf) >= 0
        return
    duck_pdf = duck.execute(oracles[name]).fetchdf()
    a, b = _norm(spark_pdf), _norm(duck_pdf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        if str(a[c].dtype).startswith("float"):
            assert np.allclose(a[c].values.astype(float), b[c].values.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True), c
        else:
            assert (pd.Series(a[c].values).fillna("∅")
                    == pd.Series(b[c].values).fillna("∅")).all(), c
