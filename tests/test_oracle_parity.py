"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry in Spark AND its DuckDB oracle,
compare row count, column names and (order-insensitive) values.

Runs at sf0.001 for speed; the driver runs sf0.01 — all operators here
are scale-invariant in semantics."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SUBONT_PARITY_SF_DIR", "/root/testdata/sf0.001")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    got = _normalize(q(spark, SF_DIR).toPandas())
    exp = _normalize(_duck(entrymod.oracle_sql()[name]))
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if g.dtype.kind == "f":
            assert np.array_equal(g, e, equal_nan=True), f"{name}.{c}: float mismatch"
        else:
            assert (g == e).all(), f"{name}.{c}: value mismatch"


def test_rows_only_queries_run(spark):
    qs = entrymod.queries()
    for name in set(qs) - set(entrymod.oracle_sql()):
        if name == "subontology_fixture_triples":
            continue  # covered (and golden-checked) in test_pipeline.py
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
