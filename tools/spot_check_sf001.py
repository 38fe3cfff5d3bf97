"""Strict-equal spot check of selected queries vs DuckDB at a chosen SF.

Usage: python tools/spot_check_sf001.py <sf_dir> <query> [<query> ...]
Prints one line per query: name VERDICT.  Exits nonzero on any non-EXACT.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_harness import compare, duckdb_conn  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    from img2dataset_spark.oracles import ORACLES
    from img2dataset_spark.queries import ALL_QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("spot-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)
    rc = 0
    for name in names:
        spark_pdf = ALL_QUERIES[name](spark, sf_dir).toPandas()
        oracle_pdf = con.execute(ORACLES[name]).fetchdf()
        r = compare(spark_pdf, oracle_pdf)
        print(name, r["verdict"], flush=True)
        if r["verdict"] != "EXACT":
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
