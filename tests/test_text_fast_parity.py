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


def test_approx_percentile_close_to_exact(spark):
    """text_length_quantiles documents approx_percentile as the
    huge-group scale path.  approx_percentile returns an actual group
    member (no interpolation), so the honest drop-in bound is RANK
    accuracy, not value distance: with accuracy >> n the sketch is
    within one rank position, i.e. inside the exact percentiles at
    q ± 1/n."""
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    qs = [0.5, 0.9, 0.99]
    rows = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(n_chars, array(0.5D, 0.9D, 0.99D))").alias("exact"),
        F.expr("approx_percentile(n_chars, array(0.5D, 0.9D, 0.99D), 10000)").alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        inv = 1.0 / r["n"]
        bounds = (
            d.filter(F.col("source") == r["source"])
            .agg(
                F.expr(
                    "percentile(n_chars, array({}))".format(
                        ",".join(f"{max(0.0, q - inv)}D,{min(1.0, q + inv)}D" for q in qs)
                    )
                ).alias("b")
            )
            .collect()[0]["b"]
        )
        for i, a in enumerate(r["approx"]):
            lo, hi = bounds[2 * i], bounds[2 * i + 1]
            assert lo <= a <= hi, (r["source"], qs[i], lo, a, hi)
