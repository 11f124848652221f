"""Oracle parity for the generic relational suite (SURVEY.md §2.7) plus
physical-plan shape checks."""

from __future__ import annotations

import pytest
from conftest import SF_DIR, assert_matches_oracle
from pyspark.sql import functions as F

from flink_stream_processing_refarch_spark.plans import relational


@pytest.mark.parametrize("name", sorted(relational.ORACLES))
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, relational.QUERIES[name], relational.ORACLES[name]
    )


def test_approx_distinct_sketch_within_bound(spark):
    """The in-row bound check must hold (sketch within 5% of exact) and
    the exact twin must agree with the standalone exact query."""
    rows = relational.q_approx_distinct(spark, SF_DIR).collect()
    assert len(rows) > 0
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in relational.q_distinct_counts(spark, SF_DIR).collect()
    }
    for r in rows:
        assert r["sketch_ok"], r
        assert r["n_parts_exact"] == exact[r["l_returnflag"]]


def test_approx_quantiles_sketch_within_bound(spark, duck):
    """The in-row bound check must hold, and the exact discrete-quantile
    twins must equal DuckDB's quantile_disc (same rank rule) exactly."""
    rows = {
        r["o_orderpriority"]: r
        for r in relational.q_approx_quantiles(spark, SF_DIR).collect()
    }
    for r in rows.values():
        assert r["sketch_ok"], r
    exact = duck.execute(
        """
        SELECT o_orderpriority,
               quantile_disc(o_totalprice, 0.5),
               quantile_disc(o_totalprice, 0.9),
               quantile_disc(o_totalprice, 0.99),
               max(o_totalprice) - min(o_totalprice)
        FROM orders GROUP BY o_orderpriority
        """
    ).fetchall()
    for prio, e50, e90, e99, rng in exact:
        r = rows[prio]
        # rank-rule twins should sit within a hair of quantile_disc
        # (DuckDB's disc rule may pick the neighbouring element)
        for a, e in ((r["p50_exact"], e50), (r["p90_exact"], e90), (r["p99_exact"], e99)):
            assert abs(a - e) <= 0.02 * rng, (prio, a, e)


def test_revenue_by_nation_broadcasts_dims(spark):
    """customer and nation must join via BroadcastHashJoin (no shuffle for
    dimension tables)."""
    plan = (
        relational.q_revenue_by_nation(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_revenue_join_falls_back_to_smj_at_scale(spark):
    """With auto-broadcast disabled (the 100 TB regime for the fact-fact
    join), the un-hinted lineitem ⋈ orders join compiles to a sort-merge
    join on the keys — no code change required. The explicitly hinted
    dimension joins stay broadcast (dims are broadcastable at any SF)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE has its own runtime threshold and would re-broadcast otherwise
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = relational.q_revenue_by_nation(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_needs_no_shuffle(spark, tmp_path):
    """Bucketing both sides of a recurring join on the join key removes
    the per-query Exchange entirely — the co-location strategy for the
    biggest repeated joins at 100 TB. Verified: the bucketed orders ⋈
    customer plan contains a join but zero Exchange operators."""
    warehouse = str(tmp_path / "buckets")
    orders = relational.load_table(spark, SF_DIR, "orders")
    cust = relational.load_table(spark, SF_DIR, "customer")
    (orders.write.format("parquet").bucketBy(4, "o_custkey")
        .sortBy("o_custkey").option("path", warehouse + "/orders")
        .saveAsTable("orders_bkt"))
    (cust.write.format("parquet").bucketBy(4, "c_custkey")
        .sortBy("c_custkey").option("path", warehouse + "/customer")
        .saveAsTable("customer_bkt"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("orders_bkt")
            .join(
                spark.table("customer_bkt"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        join_part = plan.split("HashAggregate")[-1]  # below the agg
        assert "Join" in plan
        assert "Exchange" not in join_part, join_part[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_q_bucketed_join_plan_is_colocated(spark):
    """The registered bucketed_join query must plan as SMJ over bucketed
    scans with exactly ONE Exchange (the post-join groupBy) — the join
    keys themselves never shuffle."""
    df = relational.q_bucketed_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Bucketed: true" in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_asof_join_is_union_window_not_range_join(spark):
    """The as-of join must plan as union + running last_value window —
    NO join operator (the range-join + top-1 form materializes every
    (event, earlier-order) pair before trimming; quadratic per hot key)."""
    df = relational.q_asof_join(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan, plan[:2000]
    assert "Union" in plan, plan[:2000]


def test_top_parts_uses_take_ordered(spark):
    plan = (
        relational.q_top_parts(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
