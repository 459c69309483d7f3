"""DuckDB-oracle equivalence for every SQL-expressible query — the local
mirror of the driver's CORRECTNESS gate (row count + schema +
order-insensitive values, with 1e-9 float tolerance)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, SF_SMOKE

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def _compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    a = _canon(spark_pdf)
    b = _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            np.testing.assert_allclose(
                av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-12,
                err_msg=f"{name}: column {c}"
            )
        else:
            mism = np.asarray(av != bv)
            assert not mism.any(), (
                f"{name}: column {c} differs at {mism.sum()} rows; "
                f"first: {av[mism][:3]} vs {bv[mism][:3]}"
            )


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(spark, name):
    sf_dir = SF_DIR
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    oracle_pdf = con.sql(ORACLES[name]).df()
    _compare(spark_pdf, oracle_pdf, name)


def test_rows_only_queries_run(spark):
    """Queries without oracles must still execute and return sane rows."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_SMOKE)
        n = df.count()
        assert n >= 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
