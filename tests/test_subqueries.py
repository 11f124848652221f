"""Oracle parity + decorrelation evidence for plans/subqueries.py.

Subqueries are optimizer surface: correctness says the rewritten join
tree computes the nested semantics; the plan checks say Catalyst really
did rewrite (no subquery expression survives into the optimized plan —
a surviving one would mean a per-row rescan at scale).
"""

from __future__ import annotations

import pytest
from conftest import SF_DIR, assert_matches_oracle

from flink_stream_processing_refarch_spark.plans import subqueries


@pytest.mark.parametrize("name", sorted(subqueries.ORACLES))
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, subqueries.QUERIES[name], subqueries.ORACLES[name]
    )


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_exists_rewrites_to_semi_join(spark):
    plan = _optimized_plan(subqueries.q_exists_returned_orders(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "exists" not in plan.lower().replace("leftsemi", "")


def test_in_rewrites_to_semi_join(spark):
    plan = _optimized_plan(subqueries.q_in_large_orders(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "in(" not in plan.lower()


def test_scalar_subquery_decorrelates(spark):
    """The correlated avg must become a standalone aggregate joined on the
    correlation key — i.e. an Aggregate over l_partkey, no scalar-subquery
    expression left in the optimized tree."""
    plan = _optimized_plan(subqueries.q_scalar_below_avg(spark, SF_DIR))
    assert "scalar-subquery" not in plan
    assert "avg(" in plan and "l_partkey" in plan


def test_exists_filter_pushed_below_semi_join(spark):
    """l_returnflag = 'R' must reach the lineitem side underneath the
    semi-join, not run post-join (at 100 TB this is scan-time pruning)."""
    plan = _optimized_plan(subqueries.q_exists_returned_orders(spark, SF_DIR))
    semi_pos = plan.find("LeftSemi")
    assert semi_pos != -1
    flag_pos = plan.find("l_returnflag")
    assert flag_pos > semi_pos  # filter sits in the subtree below the join
