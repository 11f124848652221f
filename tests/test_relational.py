"""Oracle parity for the generic relational suite (SURVEY.md §2.7) plus
physical-plan shape checks."""

from __future__ import annotations

import pytest
from conftest import SF_DIR, assert_matches_oracle

from flink_stream_processing_refarch_spark.plans import relational


@pytest.mark.parametrize("name", sorted(relational.ORACLES))
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, relational.QUERIES[name], relational.ORACLES[name]
    )


def test_approx_distinct_runs(spark):
    df = relational.q_approx_distinct(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in relational.q_distinct_counts(spark, SF_DIR).collect()
    }
    for r in rows:
        # 2% target rsd — allow generous 15% absolute slack at tiny SF
        assert abs(r["approx_parts"] - exact[r["l_returnflag"]]) <= max(
            5, 0.15 * exact[r["l_returnflag"]]
        )


def test_revenue_by_nation_broadcasts_dims(spark):
    """customer and nation must join via BroadcastHashJoin (no shuffle for
    dimension tables)."""
    plan = (
        relational.q_revenue_by_nation(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_top_parts_uses_take_ordered(spark):
    plan = (
        relational.q_top_parts(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
