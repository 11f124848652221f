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


def test_approx_quantiles_accuracy(spark, duck):
    """approx_percentile with accuracy 10000 is exact at this SF (the
    sketch holds every value) — compare against DuckDB's discrete
    quantiles loosely (within 2% of the value range)."""
    rows = {
        r["o_orderpriority"]: (r["p50"], r["p90"], r["p99"])
        for r in relational.q_approx_quantiles(spark, SF_DIR).collect()
    }
    exact = duck.execute(
        """
        SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5),
               quantile_disc(o_totalprice, 0.9),
               quantile_disc(o_totalprice, 0.99),
               max(o_totalprice) - min(o_totalprice)
        FROM orders GROUP BY o_orderpriority
        """
    ).fetchall()
    for prio, e50, e90, e99, rng in exact:
        a50, a90, a99 = rows[prio]
        for a, e in ((a50, e50), (a90, e90), (a99, e99)):
            assert abs(a - e) <= 0.02 * rng, (prio, a, e)


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
