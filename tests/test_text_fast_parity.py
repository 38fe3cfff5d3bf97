"""Arrow fast paths must be bit-identical to the Catalyst expression
forms they replace (the expression is the spec the SQL oracle mirrors)."""

from pyspark.sql import functions as F

from img2dataset_spark.functions import text as X
from img2dataset_spark.functions.text_fast import make_rolling_fingerprint_udf

CORPUS = [
    "Hello World",
    "  the   quick\tbrown\nfox  ",
    "",
    "   ",
    None,
    "UPPER lower MiXeD 123 !@#",
    "ünïcödé — em-dash and ellipsis…",
    "日本語のテキスト",
    "a",
    "x" * 3000,  # longer than any power-table default
]


def test_rolling_udf_matches_expression(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "i long, text string")
    roll = make_rolling_fingerprint_udf()
    out = df.select(
        "i",
        X.rolling_fingerprint(F.col("text")).alias("expr"),
        roll(X.normalized_text(F.col("text"))).alias("fast"),
    ).collect()
    for r in out:
        assert r["expr"] == r["fast"], (r["i"], r["expr"], r["fast"])
