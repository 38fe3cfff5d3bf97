"""The correctness gate, locally: every queries() entry must match its
DuckDB oracle bit-exactly at sf0.001 (the driver runs the same at
sf0.01)."""

from __future__ import annotations

import pytest

from img2dataset_spark.oracles import ORACLES
from img2dataset_spark.queries import QUERIES
from tests.oracle_harness import compare, duckdb_conn

SF_DIR = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)


@pytest.fixture(scope="module")
def con():
    return duckdb_conn(SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_exact(spark, con, name):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    oracle_pdf = con.execute(ORACLES[name]).fetchdf()
    r = compare(spark_pdf, oracle_pdf)
    assert r["verdict"] == "EXACT", r
