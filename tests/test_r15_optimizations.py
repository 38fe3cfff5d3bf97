"""Equivalence pins for the r15 optimization round: every rewrite is a
pure performance change, so each one gets a test asserting the new path
produces EXACTLY what the old path produced.

- quality_flags' repetition signals as JVM higher-order-function
  expressions (repetition_fractions) vs the Arrow UDF they replaced
  (make_repetition_udf, kept for exactly this pin).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestRepetitionExpressions:
    """r15: the top-token / top-bigram fractions moved from an Arrow
    UDF to pure JVM higher-order functions — quality_flags (and every
    composite embedding it: ingest_wave_e2e, pipeline_e2e, curation_e2e,
    decontamination) now has ZERO Python boundary.  The expressions must
    reproduce the UDF bit-exactly on the corpus and on the hostile
    ASCII-whitespace edge cases.

    (Known, documented divergence OUTSIDE the engine's data contract:
    non-ASCII whitespace — U+00A0, U+3000 … — which Python's ``\\s``
    matches but Java's and RE2's do not.  There the NEW expression form
    agrees with the DuckDB SQL oracle and the relational
    text_repetition twin; the old UDF was the outlier.  No generator
    table contains such text, and the full-SF sweep in this pin plus
    the oracle replay keep that pinned.)"""

    def _both(self, spark, df):
        from img2dataset_spark.operators.quality import (
            make_repetition_udf,
            with_repetition_fractions,
        )

        rep = make_repetition_udf()(F.col("text"))
        old = df.select(
            "doc_id",
            rep.getField("ttf").alias("ttf"),
            rep.getField("tbf").alias("tbf"),
        )
        new = with_repetition_fractions(df.select("doc_id", "text")).select(
            "doc_id", "ttf", "tbf"
        )
        o = {r["doc_id"]: (r["ttf"], r["tbf"]) for r in old.collect()}
        n = {r["doc_id"]: (r["ttf"], r["tbf"]) for r in new.collect()}
        return o, n

    def test_corpus_bit_identical(self, spark, docs):
        o, n = self._both(spark, docs)
        assert o == n

    def test_edge_cases_bit_identical(self, spark):
        edge = spark.createDataFrame(
            [
                (1, None),
                (2, ""),
                (3, "   "),
                (4, "\t\n "),
                (5, "one"),
                (6, " one "),
                (7, "a a a b"),
                (8, "\tleading tab"),
                (9, "trailing space  "),
                (10, "x   y"),
                (11, "A a A"),
                (12, ("word " * 200).strip()),
                (13, "ab"),
                (14, "solo-bigram pair"),
                (15, "rep rep rep rep nonrep"),
            ],
            "doc_id long, text string",
        )
        o, n = self._both(spark, edge)
        assert o == n
        # the null semantics the composites rely on: no token -> NULL
        assert n[1] == (None, None)
        assert n[2] == (None, None)
        assert n[5] == (1.0, None)

    def test_quality_flags_has_no_python_node(self, spark, docs):
        from img2dataset_spark.operators.quality import quality_flags

        plan = quality_flags(docs)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEval" not in plan
