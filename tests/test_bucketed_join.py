"""Bucketed-table co-located joins — the shuffle-elimination layout.

At 100 TB the dominant cost of a repeated big-big join (orders x
lineitem every run) is re-shuffling both sides each time.  Writing both
tables bucketed by the join key pre-shuffles them ONCE at write time;
every subsequent sort-merge join reads co-located buckets and the plan
carries NO Exchange on either side.  This test pins that behavior so
the layout recipe in the README stays true.
"""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is static; route table DATA to the pytest
    # tmp dir via the explicit path option instead (metadata lands in
    # the session-default metastore, dropped again below)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = spark.range(10_000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 97).alias("o_custkey"),
        (F.col("id") * 3 % 1000).cast("double").alias("o_totalprice"),
    )
    lineitem = spark.range(40_000).select(
        (F.col("id") % 10_000).alias("l_orderkey"),
        (F.col("id") % 7).alias("l_linenumber"),
        (F.col("id") % 50).cast("double").alias("l_quantity"),
    )
    for name, df, key in [
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", lineitem, "l_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(wh, name))
            .saveAsTable(name)
        )
    yield spark
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    # hint away the broadcast these test-sized tables would get — the
    # scenario is two tables too big to broadcast
    o = spark.table("b_orders").hint("merge")
    li = spark.table("b_lineitem")
    joined = o.join(li, o.o_orderkey == li.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join should not re-shuffle"
    # and it is not just an empty plan trick
    assert joined.count() == 40_000


def test_bucketed_aggregation_skips_shuffle(bucketed):
    spark = bucketed
    li = spark.table("b_lineitem")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy on the bucket key should not shuffle"
    assert agg.count() == 10_000


def test_unbucketed_join_does_shuffle(bucketed):
    """Control: the same join on plain frames carries Exchanges — the
    assertion above is really the bucketing at work."""
    spark = bucketed
    o = spark.table("b_orders").repartition(5)
    li = spark.table("b_lineitem").repartition(5)
    plan = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan
