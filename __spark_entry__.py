"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (full mock-fetch pipeline) on sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2 +
                beyond-reference M6 operators), from
                img2dataset_spark.queries.
oracle_sql()  — matching DuckDB SQL for every query, from
                img2dataset_spark.oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from img2dataset_spark.oracles import ORACLES  # noqa: E402
from img2dataset_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the whole pipeline (scan -> shard -> key -> fetch ->
    decode -> filters -> resize -> encode -> hash -> status) in hermetic
    mock-fetch mode on sf0.001."""
    return QUERIES["pipeline_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # one SQL string per queries() key (ORACLES also covers the
    # EXTRA_QUERIES variants that only pytest checks)
    return {name: ORACLES[name] for name in QUERIES}
