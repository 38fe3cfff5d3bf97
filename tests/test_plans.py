"""Physical-plan shape guards: the properties that make these queries
scale are asserted, not assumed — pushed filters reach the parquet scan,
small dimensions broadcast, nothing falls back to a cartesian product,
and Python only appears where it is genuinely required.
"""

from __future__ import annotations

import pytest

from img2dataset_spark.queries import ALL_QUERIES as QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(name: str, spark) -> str:
    return QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


class TestScanPruning:
    def test_s7_filter_pushed_to_scan(self, spark):
        plan = plan_of("s7_scan_prune", spark)
        assert "PushedFilters: [" in plan
        assert "IsNotNull(l_quantity)" in plan or "GreaterThan(l_quantity" in plan

    def test_s7_column_pruned(self, spark):
        plan = plan_of("s7_scan_prune", spark)
        # ReadSchema must not include unprojected wide columns
        read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read and "l_comment" not in read[0]


class TestJoinStrategies:
    @pytest.mark.parametrize("name", ["tpch_q3", "tpch_q5"])
    def test_dimensions_broadcast(self, spark, name):
        plan = plan_of(name, spark)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_j1_anti_join_broadcasts(self, spark):
        plan = plan_of("j1_anti_join", spark)
        assert "LeftAnti" in plan

    def test_dedup_survivors_no_forced_broadcast(self, spark):
        """dedup_representatives must NOT hint broadcast: the dupe set can
        be a large fraction of the corpus, so the choice belongs to the
        runtime (AQE / threshold), not a hint.  Assert the hint is absent
        from the logical plan — at test scale AQE may still legitimately
        CHOOSE broadcast from observed size, which is fine."""
        df = QUERIES["dedup_survivors"](spark, SF_DIR)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        assert "broadcast" not in logical.lower()
        assert "LeftAnti" in plan_of("dedup_survivors", spark)

    def test_no_cartesian_anywhere_in_dedup_similarity(self, spark):
        for name in ("dedup_minhash_lsh", "dedup_simhash",
                     "embedding_dup_pairs_lsh", "embedding_dup_pairs",
                     "dedup_substring_spans", "url_dedup"):
            plan = plan_of(name, spark)
            assert "CartesianProduct" not in plan, name
            assert "BroadcastNestedLoopJoin" not in plan, name


class TestCodegenAndPython:
    def test_tpch_q1_stays_jvm_side(self, spark):
        # (AQE prints codegen spans only in the final executed plan, so
        # assert the JVM-side property via stage types instead)
        plan = plan_of("tpch_q1", spark)
        assert "HashAggregate" in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_text_stats_no_python(self, spark):
        # quality metrics are pure Catalyst expressions — no Python stage
        plan = plan_of("text_stats", spark)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_pipeline_python_is_arrow_not_row(self, spark):
        # fetch/transform must cross into Python as Arrow batches, never
        # row-at-a-time
        plan = plan_of("pipeline_e2e", spark)
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan


class TestShardingShape:
    def test_r1_single_range_exchange(self, spark):
        """Ordered sharding needs exactly ONE range shuffle of the data
        (plus the tiny aggregation exchanges) — a second range exchange
        would mean the index pass re-sorts."""
        plan = plan_of("r1_sharding", spark)
        assert plan.count("rangepartitioning") + plan.count("RangePartitioning") <= 2
