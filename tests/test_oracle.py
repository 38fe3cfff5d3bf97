"""The correctness gate, locally: every queries() entry must match its
DuckDB oracle bit-exactly at sf0.001 (the driver runs the same at
sf0.01)."""

from __future__ import annotations

import pytest

from img2dataset_spark.oracles import ORACLES
from img2dataset_spark.queries import ALL_QUERIES, QUERIES
from tests.oracle_harness import compare, duckdb_conn

SF_DIR = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle():
    assert set(ALL_QUERIES) == set(ORACLES)


def test_driver_facing_registry_fits_the_50_entry_window():
    assert len(QUERIES) == 50


@pytest.fixture(scope="module")
def con():
    return duckdb_conn(SF_DIR)


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_oracle_exact(spark, con, name):
    spark_pdf = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    oracle_pdf = con.execute(ORACLES[name]).fetchdf()
    r = compare(spark_pdf, oracle_pdf)
    assert r["verdict"] == "EXACT", r
