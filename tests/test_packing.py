"""Sequence packing (operators/packing.py): concat-and-chunk spans.

Invariants a correct packing must satisfy, plus determinism across
partition layouts and the oracle-harness strict compare.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from img2dataset_spark.functions.text import bpe_token_count
from img2dataset_spark.operators.packing import (
    materialize_blocks,
    packed_spans,
    with_global_cumsum,
)

SF = "/root/testdata/sf0.001"
BS = 64


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def spans(spark, docs):
    return packed_spans(docs, block_size=BS).toPandas()


class TestPackedSpans:
    def test_blocks_are_exactly_full_except_last(self, spans):
        per_block = spans.groupby("block_id").slice_len.sum().sort_index()
        assert list(per_block.index) == list(range(len(per_block)))
        assert (per_block.iloc[:-1] == BS).all()
        assert 0 < per_block.iloc[-1] <= BS

    def test_docs_reassemble_exactly(self, spark, docs, spans):
        toks = (
            docs.select(
                "doc_id", bpe_token_count(F.col("text")).alias("tok")
            )
            .filter(F.col("tok") > 0)
            .toPandas()
            .set_index("doc_id")["tok"]
        )
        got = spans.groupby("doc_id").slice_len.sum()
        assert got.to_dict() == toks.to_dict()
        # slices of one doc are contiguous in doc_offset order
        for _, g in spans.groupby("doc_id"):
            g = g.sort_values("block_id")
            assert (g.block_id.diff().dropna() == 1).all()
            assert (
                g.doc_offset.iloc[1:].values
                == (g.doc_offset + g.slice_len).iloc[:-1].values
            ).all()

    def test_block_offsets_tile_each_block(self, spans):
        for _, g in spans.groupby("block_id"):
            g = g.sort_values("block_offset")
            assert g.block_offset.iloc[0] == 0
            assert (
                g.block_offset.iloc[1:].values
                == (g.block_offset + g.slice_len).iloc[:-1].values
            ).all()

    def test_deterministic_across_partition_layouts(self, spark, docs, spans):
        relaid = packed_spans(
            docs.repartition(7), block_size=BS, num_partitions=3
        ).toPandas()
        key = ["block_id", "doc_id"]
        a = spans.sort_values(key).reset_index(drop=True)
        b = relaid.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns])

    def test_zero_token_docs_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world"), (2, ""), (3, None), (4, "x")],
            "doc_id long, text string",
        )
        out = packed_spans(df, block_size=8).toPandas()
        assert set(out.doc_id) == {1, 4}

    def test_block_size_validation(self, spark, docs):
        with pytest.raises(ValueError, match="block_size"):
            packed_spans(docs, block_size=0)

    def test_custom_token_count_column(self, spark):
        df = spark.createDataFrame(
            [(1, 5), (2, 3), (3, 9)], "doc_id long, n long"
        )
        out = (
            packed_spans(df, block_size=4, token_count=F.col("n"))
            .toPandas()
            .sort_values(["block_id", "doc_id"])
            .reset_index(drop=True)
        )
        # stream: doc1 [0,5) doc2 [5,8) doc3 [8,17); blocks of 4
        expect = pd.DataFrame(
            {
                "block_id": [0, 1, 1, 2, 3, 4],
                "doc_id": [1, 1, 2, 3, 3, 3],
                "doc_offset": [0, 4, 0, 0, 4, 8],
                "block_offset": [0, 0, 1, 0, 0, 0],
                "slice_len": [4, 1, 3, 4, 4, 1],
            }
        )
        pd.testing.assert_frame_equal(out, expect.astype(out.dtypes.to_dict()))


class TestMaterializeBlocks:
    def test_blocks_reassemble_the_token_stream(self, spark, docs):
        """Concatenating blocks in block_id order reproduces the global
        token stream — the defining property of concat-and-chunk."""
        from img2dataset_spark.functions.text import BPE_TOKEN_RE

        blocks = (
            materialize_blocks(docs, block_size=BS)
            .toPandas()
            .sort_values("block_id")
        )
        got = [t for row in blocks.tokens for t in row]
        toks = (
            docs.select(
                "doc_id",
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(BPE_TOKEN_RE), F.lit(0)
                ).alias("toks"),
            )
            .toPandas()
            .sort_values("doc_id")
        )
        expect = [t for row in toks.toks for t in row]
        assert got == expect
        assert (blocks.n_tokens.iloc[:-1] == BS).all()
        assert (blocks.tokens.map(len) == blocks.n_tokens).all()

    def test_multi_doc_block_ordering(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "d e"), (3, "f g h i")],
            "doc_id long, text string",
        )
        out = (
            materialize_blocks(df, block_size=4)
            .toPandas()
            .sort_values("block_id")
            .reset_index(drop=True)
        )
        # stream: a b c | d e | f g h i  (tokens keep their leading space)
        assert list(out.tokens[0]) == ["a", " b", " c", "d"]
        assert list(out.tokens[1]) == [" e", "f", " g", " h"]
        assert list(out.tokens[2]) == [" i"]
        assert list(out.n_docs) == [2, 2, 1]


class TestRandomizedModel:
    def test_spans_match_pure_python_model(self, spark):
        """200 docs with seeded-random token counts vs a 10-line
        reference packer — catches interval-arithmetic regressions the
        fixed corpus can't."""
        import random

        rng = random.Random(7)
        rows = [(i, rng.randrange(1, 40)) for i in range(200)]
        # model: walk the stream, slice greedily at block boundaries
        bs, pos, expect = 16, 0, []
        for doc_id, tok in rows:
            off = 0
            while off < tok:
                take = min(tok - off, bs - (pos % bs))
                expect.append((pos // bs, doc_id, off, pos % bs, take))
                off += take
                pos += take
        df = spark.createDataFrame(rows, "doc_id long, n long")
        got = [
            tuple(r)
            for r in packed_spans(df, block_size=bs, token_count=F.col("n"))
            .orderBy("block_id", "block_offset")
            .collect()
        ]
        assert got == expect


class TestGlobalCumsum:
    def test_matches_naive_single_partition_window(self, spark):
        rows = [(i * 3 % 101, (i * 7) % 13 + 1) for i in range(101)]
        df = spark.createDataFrame(rows, "k long, v long")
        got = (
            with_global_cumsum(df, "k", "v", "cs", num_partitions=5)
            .toPandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pdf = pd.DataFrame(rows, columns=["k", "v"]).sort_values("k")
        pdf["cs"] = pdf.v.cumsum()
        pd.testing.assert_frame_equal(
            got, pdf.reset_index(drop=True).astype(got.dtypes.to_dict())
        )

    def test_single_row_and_empty(self, spark):
        df = spark.createDataFrame([(1, 42)], "k long, v long")
        assert with_global_cumsum(df, "k", "v").collect()[0]["_cumsum"] == 42
        empty = spark.createDataFrame([], "k long, v long")
        assert with_global_cumsum(empty, "k", "v").count() == 0


def test_oracle_strict_at_sf001(spark):
    """Driver-gate rehearsal: strict compare vs the DuckDB oracle at the
    unit-test scale (tests/test_oracle.py repeats this via the harness)."""
    from img2dataset_spark.oracles import ORACLES
    from img2dataset_spark.queries import ALL_QUERIES
    from tests.oracle_harness import compare, duckdb_conn

    spark_pdf = ALL_QUERIES["pack_sequences"](spark, SF).toPandas()
    oracle_pdf = duckdb_conn(SF).execute(ORACLES["pack_sequences"]).fetchdf()
    assert compare(spark_pdf, oracle_pdf)["verdict"] == "EXACT"
