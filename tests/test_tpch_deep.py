"""Oracle parity + plan shape for the deep TPC-H-style join trees
(plans/tpch_deep.py)."""

from __future__ import annotations

import pytest
from conftest import SF_DIR, assert_matches_oracle

from flink_stream_processing_refarch_spark.plans import tpch_deep


@pytest.mark.parametrize("name", sorted(tpch_deep.ORACLES))
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, tpch_deep.QUERIES[name], tpch_deep.ORACLES[name]
    )


def test_market_share_dims_broadcast(spark):
    """The 7-relation tree must broadcast every dimension: the only
    shuffle pair allowed is lineitem ⋈ orders (+ the agg exchange)."""
    plan = (
        tpch_deep.q_market_share(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]
    # one fact-fact join may shuffle; no nested-loop anywhere
    assert "BroadcastNestedLoopJoin" not in plan


def test_order_priority_uses_semi_join(spark):
    plan = (
        tpch_deep.q_order_priority(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan


def test_trade_volume_broadcasts_dims(spark):
    """Both nation-role resolutions broadcast; the disjunctive pair
    predicate must not degrade any join to a nested loop."""
    plan = (
        tpch_deep.q_trade_volume(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    # the ship-date range reaches the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_prospect_customers_anti_join_and_scalar_broadcast(spark):
    """The dormancy check is a LEFT ANTI against the date-filtered
    orders scan; the threshold is a 1-row broadcast (the one BNLJ shape
    the repo allows); the cutoff filter reaches the orders scan."""
    plan = (
        tpch_deep.q_prospect_customers(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_product_profit_part_filter_pushed_and_broadcast(spark):
    """The p_name LIKE filter must reach the part scan (pruning the
    dimension BEFORE broadcast) and every dimension joins as broadcast."""
    plan = (
        tpch_deep.q_product_profit(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StringContains(p_name" in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_unshipped_revenue_filters_pushed(spark):
    """Both fact filters must reach the parquet scans."""
    plan = (
        tpch_deep.q_unshipped_revenue(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan

def test_small_lot_revenue_window_decorrelation(spark):
    """Q17's correlated scalar-AVG decorrelates to a window over the
    partkey partition: ONE broadcast join (the brand prefilter), no
    shuffle join, and the brand IN-list pushed to the part scan."""
    plan = (
        tpch_deep.q_small_lot_revenue(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 1, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    # the brand filter reaches the part scan
    assert "In(p_brand" in plan, plan[:2000]


def test_brand_volume_revenue_pushdown_and_single_join(spark):
    """Q19: the derivable brand prefilter reaches the part scan; the
    OR-of-ANDs residual must not degrade the equi-join to a nested
    loop."""
    plan = (
        tpch_deep.q_brand_volume_revenue(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "In(p_brand" in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") == 1
    assert "BroadcastNestedLoopJoin" not in plan


def test_late_shipments_date_range_pushed(spark):
    """Q12: the ship-year range reaches the lineitem scan even though
    the lateness predicate (spanning both relations) cannot."""
    plan = (
        tpch_deep.q_late_shipments(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan[:2000]
    assert "LessThan(l_shipdate" in plan


def test_supplier_part_variety_anti_join_and_size_pushdown(spark):
    """Q16: the excluded suppliers join as LEFT ANTI, the size list and
    brand exclusion reach the part scan, and the distinct-supplier count
    never shuffles the fact on a pair key (part dim broadcasts)."""
    plan = (
        tpch_deep.q_supplier_part_variety(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "In(p_size" in plan, plan[:2000]
    assert "Not(EqualTo(p_brand" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_small_lot_threshold_is_strict_fifth(spark):
    """Every surviving line must have qty*5*cnt < sum_qty vs its part's
    aggregate — re-derive the per-part sums batch-side and check the
    revenue decomposes exactly."""
    import duckdb

    got = {
        r["p_brand"]: (r["sum_rev_cents"], r["n_lines"])
        for r in tpch_deep.q_small_lot_revenue(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    want = con.execute(
        tpch_deep.SMALL_LOT_REVENUE_SQL
    ).fetchall()
    assert got == {r[0]: (r[1], r[3]) for r in want}


def test_small_lot_revenue_single_fact_scan(spark):
    """The window decorrelation must scan lineitem exactly ONCE (the
    join-back formulation pays a second corpus scan for the per-part
    aggregate)."""
    plan = (
        tpch_deep.q_small_lot_revenue(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    li_scans = {
        m.start()
        for m in re.finditer(r"FileScan parquet.*lineitem", plan)
    }
    assert len(li_scans) == 1, plan[:1500]

def test_important_parts_broadcasts_dim_and_scalar(spark):
    """Q11 analogue: the supplier dim reaches the fact scan as a
    broadcast, the (total, count) scalar is a 1-row broadcast back over
    the per-part values — one fact aggregation exchange, no fact-fact
    shuffle join, and the threshold slice is nonempty but selective."""
    df = tpch_deep.q_important_parts(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # the 1-row scalar joins as a broadcast (hash or nested-loop on the
    # single row — both are broadcast-side)
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]
    rows = df.collect()
    assert 0 < len(rows) < 190  # selective top slice, never everything
