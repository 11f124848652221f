"""Subquery surface: EXISTS / IN / correlated-scalar decorrelation.

The reference has no query language at all (SURVEY.md §2.7 — its only
"queries" are two hard-wired windowed aggregations in
ProcessTaxiStream.java:96-136), so subqueries are part of the §2.7
"exposed for free from Spark" completeness surface. They matter as
engine evidence because they are OPTIMIZER features, not operators: the
declared plan contains a nested query, and Catalyst must rewrite it into
a join before execution —

  * ``EXISTS`` / ``IN`` predicates -> ``RewritePredicateSubquery`` ->
    left-semi hash join (anti for NOT);
  * correlated scalar subqueries -> ``RewriteCorrelatedScalarSubquery``
    -> aggregate on the correlation key + equi-join.

At 100 TB that rewrite is the difference between a per-row re-scan of a
multi-TB fact table (the naive nested-loop reading of the SQL) and one
shuffle join against a pre-aggregated build side. ``tests/test_relational.py``
asserts the rewrites actually fired (no ``InSubquery``/``Exists`` left in
the optimized plan, semi-join present).

The same SQL text runs on Spark and on the DuckDB oracle (ANSI subset,
shared dialect — same discipline as plans/relational.py: money summed as
row-level integer cents, never floating doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import load_table
from .relational import CENTS

_REV_CENTS = CENTS.format(
    x="l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)"
)


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# EXISTS — TPC-H Q4 shape (order-priority checking)
# ---------------------------------------------------------------------------

EXISTS_RETURNED_ORDERS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
GROUP BY o_orderpriority
"""


def q_exists_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority class that had at least one returned line item.

    Scale: Catalyst rewrites EXISTS to a left-semi join on l_orderkey; the
    `l_returnflag = 'R'` filter is pushed below the join into the lineitem
    scan (PushedFilters), and the date range prunes the probe side. One
    shuffle pair on the order key; semi-join build rows carry zero payload
    columns after pruning.
    """
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(EXISTS_RETURNED_ORDERS_SQL)


# ---------------------------------------------------------------------------
# IN + HAVING — TPC-H Q18 shape (large-volume customers)
# ---------------------------------------------------------------------------

IN_LARGE_ORDERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300
      )
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
"""


def q_in_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose single orders moved > 300 units (TPC-H Q18 shape).

    Scale: the IN-subquery becomes semi-join against a pre-aggregated,
    HAVING-filtered build side — tiny (46 keys at sf0.01, ~0.05% of
    orders), so AQE converts the semi-join to broadcast at runtime and the
    big customer⋈orders⋈lineitem join tree only processes surviving keys.
    l_quantity is integral (TESTDATA.md) so the BIGINT cast is exact.
    """
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(IN_LARGE_ORDERS_SQL)


# ---------------------------------------------------------------------------
# Correlated scalar subquery — TPC-H Q17 shape (small-quantity revenue)
# ---------------------------------------------------------------------------

SCALAR_BELOW_AVG_SQL = f"""
SELECT CAST(sum({_REV_CENTS}) AS BIGINT) AS small_qty_rev_cents,
       count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
"""


def q_scalar_below_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from below-half-average-quantity orders of one brand.

    Scale: the correlated scalar subquery decorrelates into
    ``lineitem.groupBy(l_partkey).avg(l_quantity)`` joined back on the
    part key — one aggregation over the fact table instead of a per-row
    rescan. The brand filter cuts `part` to ~0.7% and broadcasts.
    Determinism: avg of integral quantities is sum/count with an exact
    double sum, so the `<` threshold compares identically in DuckDB.
    """
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(SCALAR_BELOW_AVG_SQL)


# ---------------------------------------------------------------------------
# Conditional aggregation — TPC-H Q14 shape (promo revenue share)
# ---------------------------------------------------------------------------

PROMO_REVENUE_SQL = f"""
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS} ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS total_cents,
       CAST(100.0 AS DOUBLE)
         * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS} ELSE 0 END) AS DOUBLE)
         / CAST(sum({_REV_CENTS}) AS DOUBLE) AS promo_pct
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from promotional parts in a two-month window.

    Scale: pure conditional aggregation — the CASE folds into the partial
    agg (map-side combine), so the join output never materializes per-row
    flags. `part` broadcasts; the ship-date filter is pushed to the scan.
    The pct division happens once on the final single row: bit-identical
    IEEE math in both engines given identical integer cents inputs.
    """
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(PROMO_REVENUE_SQL)


QUERIES = {
    "exists_returned_orders": q_exists_returned_orders,
    "in_large_orders": q_in_large_orders,
    "scalar_below_avg": q_scalar_below_avg,
    "promo_revenue": q_promo_revenue,
}

ORACLES = {
    "exists_returned_orders": EXISTS_RETURNED_ORDERS_SQL,
    "in_large_orders": IN_LARGE_ORDERS_SQL,
    "scalar_below_avg": SCALAR_BELOW_AVG_SQL,
    "promo_revenue": PROMO_REVENUE_SQL,
}
