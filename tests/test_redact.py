"""functions/redact.py — PII scrubbing semantics."""

from pyspark.sql import functions as F

from img2dataset_spark.functions.redact import redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    return redact_pii(df).collect()[0]


def test_email(spark):
    r = _one(spark, "write to Jo.Smith+x@sub.example.co.uk today")
    assert r["text"] == "write to <EMAIL> today"
    assert r["n_email"] == 1 and r["n_ipv4"] == 0


def test_ssn_vs_phone_disjoint(spark):
    r = _one(spark, "ssn 123-45-6789 tel 555-123-4567 and 555.123.4567")
    assert r["text"] == "ssn <SSN> tel <PHONE> and <PHONE>"
    assert r["n_ssn"] == 1 and r["n_phone"] == 2


def test_ipv4_and_no_double_count(spark):
    # the digits inside the email must not also count as ip/phone
    r = _one(spark, "from 192.168.0.1 by admin@10.0.0.7.example.com done")
    assert r["text"] == "from <IPV4> by <EMAIL> done"
    assert r["n_ipv4"] == 1 and r["n_email"] == 1 and r["n_phone"] == 0


def test_clean_text_untouched(spark):
    r = _one(spark, "no pii here just words")
    assert r["text"] == "no pii here just words"
    assert r["n_email"] == r["n_ssn"] == r["n_phone"] == r["n_ipv4"] == 0


def test_schema_and_column_order(spark):
    df = spark.createDataFrame([(1, "x", "k")], "id long, text string, keep string")
    out = redact_pii(df)
    assert out.columns == [
        "id", "text", "keep", "n_email", "n_ssn", "n_phone", "n_ipv4"
    ]


def test_codegen_only_plan(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
