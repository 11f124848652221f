"""Deep TPC-H-style join trees (Q2/Q3/Q4/Q7/Q8/Q9/Q10/Q13/Q21/Q22
analogues over the driver's TPC-H-ish testdata).

The §2.7 relational suite covers each operator class in isolation;
these queries exercise the COMPOSITIONS a warehouse actually runs
— 4-7-relation join trees with selective dimension filters, conditional
aggregation, semi-join counting, and top-k over a wide grouped fact.
The reference engine has no counterpart (its queries are the two taxi
windows, flink-taxi-stream-processor/.../ProcessTaxiStream.java:96-136);
these extend the exposed-Spark surface the way pricing_summary /
revenue_by_nation (plans/relational.py) do.

Scale posture shared by all of them: every dimension (region, nation,
customer, supplier, part) broadcasts — the only shuffle pairs are
fact-fact (lineitem ⋈ orders) plus the final aggregation exchange, so
the plans keep one fact-table partitioning end-to-end and Catalyst is
free to reorder the dimension joins. Money aggregates go through
row-level integer cents before any cross-row sum (the repo-wide
determinism rule, plans/relational.py:14), so DuckDB hash-parity holds
at any scale; ratios are computed from the exact cent sums and rounded
once at emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from .relational import CENTS, _cents

REV = "l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)"

# Q8 knobs
MS_REGION = "ASIA"
MS_TYPE = "PROMO"
MS_NATION = "NATION_2"
MS_Y0, MS_Y1 = "1996-01-01", "1998-01-01"

# Q10 knobs
RC_D0, RC_D1 = "1996-01-01", "1996-07-01"
RC_TOP = 20

# Q4 knobs
OP_D0, OP_D1 = "1996-01-01", "1996-04-01"

# Q3 knobs
UR_SEGMENT = "BUILDING"
UR_DATE = "1997-03-15"
UR_TOP = 10

# Q7 knobs
TV_N1, TV_N2 = "NATION_3", "NATION_7"
TV_D0, TV_D1 = "1996-01-01", "1998-01-01"

# Q22 knobs
PC_CUTOFF = "2000-01-01"

# Q9 knobs
PP_NAME_PART = "red"  # p_name substring filter (Q9's '%green%')


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp")


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 analogue: within MS_REGION customers buying MS_TYPE parts
    over two order-years, the per-year share of revenue supplied by
    MS_NATION — the deepest join tree in the registry (lineitem ⋈
    orders ⋈ customer ⋈ nation ⋈ region on the demand side, ⋈ part and
    ⋈ supplier ⋈ nation on the supply side; nation plays two roles).
    Share = exact cents ratio, rounded once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(MS_Y0)) & (F.col("o_orderdate") < _ts(MS_Y1))
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == MS_REGION)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == MS_TYPE)
    supp = load_table(spark, sf_dir, "supplier")
    # demand side: customers of the target region
    cust_r = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    # supply side: supplier -> nation name (second nation role)
    supp_n = supp.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_r), orders.o_custkey == cust_r.c_custkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _cents(REV).alias("rev_cents"),
            "supp_nation",
        )
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == MS_NATION, F.col("rev_cents")).otherwise(
                F.lit(0)
            )
        ).alias("nation_rev_cents"),
        F.sum("rev_cents").alias("total_rev_cents"),
    )
    return agg.select(
        "o_year",
        "nation_rev_cents",
        "total_rev_cents",
        F.expr(
            "round(CAST(nation_rev_cents AS DOUBLE)"
            " / CAST(total_rev_cents AS DOUBLE), 6)"
        ).alias("mkt_share"),
    )


MARKET_SHARE_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN sn.n_name = '{MS_NATION}'
                THEN {CENTS.format(x=REV)} ELSE 0 END) AS BIGINT)
         AS nation_rev_cents,
       CAST(sum({CENTS.format(x=REV)}) AS BIGINT) AS total_rev_cents,
       round(CAST(sum(CASE WHEN sn.n_name = '{MS_NATION}'
                  THEN {CENTS.format(x=REV)} ELSE 0 END) AS DOUBLE)
             / CAST(sum({CENTS.format(x=REV)}) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = '{MS_TYPE}'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = '{MS_REGION}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE o_orderdate >= TIMESTAMP '{MS_Y0} 00:00:00'
  AND o_orderdate < TIMESTAMP '{MS_Y1} 00:00:00'
GROUP BY year(o_orderdate)
"""


def q_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 analogue: customers ranked by revenue they returned
    (l_returnflag = 'R') in a six-month order window, top RC_TOP with
    their nation. Fact-fact shuffle join + broadcast dims + TakeOrdered
    (no global sort); ties broken on c_custkey."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(RC_D0)) & (F.col("o_orderdate") < _ts(RC_D1))
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .withColumn("rev_cents", _cents(REV))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum("rev_cents").alias("returned_rev_cents"),
            F.count("*").alias("n_lines"),
        )
        .orderBy(F.desc("returned_rev_cents"), F.asc("c_custkey"))
        .limit(RC_TOP)
    )


RETURNED_CUSTOMERS_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(sum({CENTS.format(x=REV)}) AS BIGINT) AS returned_rev_cents,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{RC_D0} 00:00:00'
  AND o_orderdate < TIMESTAMP '{RC_D1} 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY returned_rev_cents DESC, c_custkey ASC
LIMIT {RC_TOP}
"""


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 analogue: orders placed in one quarter that have at least one
    LATE line (l_shipdate > o_orderdate + 30 days), counted per
    priority. The late-line check is a LEFT SEMI join (existence, no
    fan-out) between the two fact tables — the composition the
    standalone semi_join entry doesn't cover."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(OP_D0)) & (F.col("o_orderdate") < _ts(OP_D1))
    )
    li = load_table(spark, sf_dir, "lineitem")
    # INTERVAL arithmetic, not date_add: date_add truncates the
    # timestamp to DATE (midnight) while the oracle's + INTERVAL 30 DAY
    # preserves time-of-day — the mismatch is masked only while the
    # generator emits midnight-only order times
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORDER_PRIORITY_SQL = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{OP_D0} 00:00:00'
  AND o_orderdate < TIMESTAMP '{OP_D1} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def q_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 analogue: top UR_TOP orders of one market segment by revenue
    from lines still unshipped at UR_DATE. Wide grouped fact (group key
    = orderkey + date + priority) then TakeOrdered; customer filter
    broadcasts into the fact join."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == UR_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts(UR_DATE)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts(UR_DATE)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rev_cents", _cents(REV))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_cents").alias("rev_cents"))
        .orderBy(F.desc("rev_cents"), F.asc("l_orderkey"))
        .limit(UR_TOP)
    )


UNSHIPPED_REVENUE_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum({CENTS.format(x=REV)}) AS BIGINT) AS rev_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{UR_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{UR_DATE} 00:00:00'
  AND l_shipdate > TIMESTAMP '{UR_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY rev_cents DESC, l_orderkey ASC
LIMIT {UR_TOP}
"""


def q_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 analogue: shipped revenue between two nations in BOTH
    directions (supplier in one, customer in the other) per ship-year.
    The new shape vs market_share is the DISJUNCTIVE pair predicate
    ((supp=N1 ∧ cust=N2) ∨ (supp=N2 ∧ cust=N1)) applied after both
    nation roles resolve — Catalyst can't push it into either dimension
    join alone, so the plan keeps both broadcast joins cheap and filters
    the pair on the fact rows. Dimensions all broadcast; the only
    shuffle pair is lineitem ⋈ orders plus the final 3-key aggregation
    exchange. Reference has no counterpart (its queries are the two
    taxi windows); this extends the exposed-Spark surface."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(TV_D0)) & (F.col("l_shipdate") < _ts(TV_D1))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(TV_N1, TV_N2)
    )
    supp_n = supp.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust_n = cust.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
        cust.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    pair = (
        li.join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
        .filter(
            ((F.col("supp_nation") == TV_N1) & (F.col("cust_nation") == TV_N2))
            | ((F.col("supp_nation") == TV_N2) & (F.col("cust_nation") == TV_N1))
        )
    )
    return (
        pair.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _cents(REV).alias("rev_cents"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum("rev_cents").alias("volume_cents"),
            F.count("*").alias("n_lines"),
        )
    )


TRADE_VOLUME_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({CENTS.format(x=REV)}) AS BIGINT) AS volume_cents,
       count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{TV_D0} 00:00:00'
  AND l_shipdate < TIMESTAMP '{TV_D1} 00:00:00'
  AND ((sn.n_name = '{TV_N1}' AND cn.n_name = '{TV_N2}')
    OR (sn.n_name = '{TV_N2}' AND cn.n_name = '{TV_N1}'))
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


def q_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analogue: per nation, the count and total balance (cents) of
    "dormant prospects" — customers whose account balance exceeds the
    global average of positive balances but who placed NO order on/after
    PC_CUTOFF. Composes the uncorrelated scalar subquery (1-row
    broadcast threshold, same decorrelation as scalar_below_avg) with a
    LEFT ANTI join against a filtered fact table — the composition
    neither standalone entry covers. The threshold compares in exact
    cents (row-level cents, integer sum / count in both engines) so the
    boundary row set is engine-stable; avg cents uses integer division
    (DuckDB // = Spark DIV) to stay in exact integers."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts(PC_CUTOFF)
    )
    # exact-integer threshold: floor(mean of positive balances, in cents)
    # DIV (not `/` + cast): Spark's double→bigint cast truncates while
    # DuckDB's CAST rounds — integer division truncates identically in
    # both engines for the positive sums here
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(_cents("c_acctbal")).alias("s"),
            F.count("*").alias("c"),
        )
        .select(F.expr("s DIV c").alias("thr_cents"))
    )
    prospects = (
        cust.withColumn("bal_cents", _cents("c_acctbal"))
        .join(F.broadcast(thr))
        .filter(F.col("bal_cents") > F.col("thr_cents"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
    )
    return (
        prospects.join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_prospects"),
            F.sum("bal_cents").alias("total_bal_cents"),
        )
    )


PROSPECT_CUSTOMERS_SQL = f"""
SELECT n_name,
       count(*) AS n_prospects,
       CAST(sum({CENTS.format(x='c_acctbal')}) AS BIGINT) AS total_bal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE {CENTS.format(x='c_acctbal')} >
      (SELECT CAST(sum({CENTS.format(x='c_acctbal')}) AS BIGINT) // count(*)
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{PC_CUTOFF} 00:00:00')
GROUP BY n_name
"""


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analogue: per supplier-nation and order-year, the profit on
    parts whose name contains PP_NAME_PART — profit per line = revenue
    minus cost, with cost proxied by p_retailprice * l_quantity (the
    testdata has no partsupp/ps_supplycost; the join tree and the
    signed-money aggregation are the Q9 shape). Both money terms go
    through row-level cents before the (possibly negative) integer sum.
    The LIKE filter prunes part BEFORE its broadcast, so the fact scan
    joins against a reduced dimension; shuffle pairs: lineitem ⋈ orders
    plus the final 2-key aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(PP_NAME_PART)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    supp_n = supp.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    profit = "(" + CENTS.format(x=REV) + " - " + CENTS.format(
        x="p_retailprice * l_quantity"
    ) + ")"
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.expr(profit).alias("profit_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.sum("profit_cents").alias("sum_profit_cents"),
            F.count("*").alias("n_lines"),
        )
    )


PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({CENTS.format(x=REV)}
                - {CENTS.format(x='p_retailprice * l_quantity')}) AS BIGINT)
         AS sum_profit_cents,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%{PP_NAME_PART}%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, year(o_orderdate)
"""


# Q21 knobs
LR_TOP = 10

# Q2 knobs
MC_MAX_SIZE = 10


def q_lonely_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 analogue ("suppliers who kept orders waiting" — the
    double-correlated EXISTS / NOT EXISTS composition): suppliers who,
    within a multi-supplier order, were the ONLY supplier whose lines
    came back returned (l_returnflag = 'R'; the testdata has no
    commit/receipt dates, so "late" becomes "returned" — same plan
    signature). Per supplier: the count of such orders, top LR_TOP by
    count then name.

    Plan shape: the fact self-SEMI-join (another supplier exists in the
    order) and self-ANTI-join (no OTHER supplier was also returned)
    both key on l_orderkey — one fact partitioning carries all three
    legs; the supplier dim broadcasts; the distinct-first projection
    keeps the joined rows one-per-(order, supplier), so the count is
    order-level in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    ).distinct()
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
        .distinct()
    )
    cand = l1.join(
        l2,
        (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
        "left_semi",
    )
    lonely = cand.join(
        l3,
        (cand.l_orderkey == l3.o3) & (cand.l_suppkey != l3.s3),
        "left_anti",
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lonely.join(F.broadcast(sup), lonely.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(LR_TOP)
    )


LONELY_RETURNS_SQL = f"""
WITH r AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
           WHERE l_returnflag = 'R')
SELECT s_name, count(*) AS numwait
FROM r JOIN supplier ON r.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = r.l_orderkey
                AND l2.l_suppkey <> r.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = r.l_orderkey
                    AND l3.l_suppkey <> r.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {LR_TOP}
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analogue (the argmin join-back): for every small part
    (p_size <= MC_MAX_SIZE), the supplier offering its minimum observed
    unit price (the testdata has no partsupp, so supply cost = the
    per-line unit price floor(l_extendedprice / l_quantity) in exact
    integer cents); ties break to the lowest s_suppkey.

    Plan shape: the per-part MIN aggregate and the equality join-back
    onto the same relation — the decorrelated form of Q2's correlated
    scalar subquery — over ONE partkey partitioning; part and supplier
    dims broadcast, the part filter LEFT SEMI-prunes the fact scan
    before any aggregation."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") <= MC_MAX_SIZE
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    lc = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    ).select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            "CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5)"
            " AS BIGINT)"
        ).alias("unit_cents"),
    )
    minp = (
        lc.groupBy("l_partkey")
        .agg(F.min("unit_cents").alias("min_cents"))
        .select(F.col("l_partkey").alias("mp_partkey"), "min_cents")
    )
    arg = (
        lc.join(
            minp,
            (lc.l_partkey == minp.mp_partkey)
            & (lc.unit_cents == minp.min_cents),
        )
        .groupBy("l_partkey", "min_cents")
        .agg(F.min("l_suppkey").alias("s_suppkey"))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        arg.join(F.broadcast(sup), "s_suppkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_name")),
            arg.l_partkey == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("min_cents").alias("min_unit_cents"),
        )
    )


MIN_COST_SUPPLIER_SQL = f"""
WITH lc AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT)
           AS unit_cents
  FROM lineitem
  WHERE l_quantity > 0
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_size <= {MC_MAX_SIZE})),
minp AS (SELECT l_partkey, min(unit_cents) AS min_cents
         FROM lc GROUP BY l_partkey),
arg AS (
  SELECT lc.l_partkey, min_cents, min(l_suppkey) AS s_suppkey
  FROM lc JOIN minp ON lc.l_partkey = minp.l_partkey
                   AND lc.unit_cents = minp.min_cents
  GROUP BY lc.l_partkey, min_cents)
SELECT p_partkey, p_name, s_name, min_cents AS min_unit_cents
FROM arg
JOIN supplier USING (s_suppkey)
JOIN part ON arg.l_partkey = p_partkey
"""


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 analogue (customer distribution): how many customers placed
    exactly k orders, INCLUDING k = 0 — the LEFT OUTER join a
    subquery-free formulation cannot express, feeding a two-level
    aggregation (per-customer count, then count-of-counts).

    Plan shape: one outer join keyed on custkey (at warehouse scale
    both sides are big — the shuffle pair), then two map-combinable
    aggregations collapsing to |distinct k| rows."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


ORDER_COUNT_DISTRIBUTION_SQL = """
WITH per AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM per GROUP BY c_count
"""


# Q18 knobs
LO_MIN_QTY = 250  # ~top 1% of per-order quantities in the testdata
LO_TOP = 100

# Q15 knobs
TS_D0, TS_D1 = "1996-01-01", "1996-04-01"

# Q20 knobs
PT_NAME_PART = "red"
PT_D0, PT_D1 = "1996-01-01", "1997-01-01"
PT_MIN_QTY = 45  # per-(supplier, part) shipped quantity threshold


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 analogue (large-volume customers): orders whose total
    lineitem quantity exceeds LO_MIN_QTY, with their customer, ordered
    by o_totalprice (cents) descending, top LO_TOP. The shape Q18
    pins: an aggregate-HAVING subquery over the fact SEMI-joins back
    into a customer ⋈ orders ⋈ lineitem tree that re-aggregates the
    same quantity per output row.

    Plan shape: ONE l_orderkey partitioning serves the HAVING
    aggregate, the semi-join back onto lineitem, and the orders join;
    the qualifying-order set (~1% of orders) broadcasts into both fact
    legs; customer broadcasts as a dim; the final per-order
    re-aggregation is map-combinable and TakeOrdered bounds the
    output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > LO_MIN_QTY)
        .select(F.col("l_orderkey").alias("bk"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("bk"), "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "l_orderkey",
            "o_orderdate",
            _cents("o_totalprice").alias("total_cents"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .orderBy(F.desc("total_cents"), F.asc("l_orderkey"))
        .limit(LO_TOP)
    )


LARGE_ORDERS_SQL = f"""
SELECT c_name, c_custkey, l_orderkey, o_orderdate,
       {CENTS.format(x="o_totalprice")} AS total_cents,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(l_quantity) > {LO_MIN_QTY})
GROUP BY c_name, c_custkey, l_orderkey, o_orderdate, o_totalprice
ORDER BY total_cents DESC, l_orderkey
LIMIT {LO_TOP}
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 analogue (top supplier, the view-level argmax): per-supplier
    revenue (exact cents) over a quarter of ship dates, returning the
    supplier(s) whose revenue equals the global maximum — the scalar
    MAX over an aggregate joined back onto the same aggregate, Q15's
    revenue-view composition.

    Plan shape: one s_suppkey-keyed aggregation over the date-pruned
    fact scan; the 1-row MAX reduces from it and broadcasts back as a
    nested-loop filter (the argmax join-back discipline of
    min_cost_supplier, at view level); the supplier dim broadcasts for
    the name. The aggregate subtree feeds both the max and the
    join-back — Spark reuses the exchange; at warehouse scale the view
    is a materialization."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(TS_D0)) & (F.col("l_shipdate") < _ts(TS_D1))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_cents(REV)).alias("total_rev_cents")
    )
    mx = rev.agg(F.max("total_rev_cents").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_rev_cents == F.col("mx"))
        .join(F.broadcast(sup), rev.supplier_no == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_cents")
    )


TOP_SUPPLIER_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({CENTS.format(x=REV)}) AS BIGINT) AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TS_D0} 00:00:00'
    AND l_shipdate < TIMESTAMP '{TS_D1} 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev_cents
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM revenue)
"""


def q_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analogue (the double-nested semi-join with a quantity
    threshold): suppliers who, for SOME part whose name contains
    PT_NAME_PART, shipped more than PT_MIN_QTY units during the PT_D0
    year — Q20's ``s_suppkey IN (... l_partkey IN (...) GROUP BY ...
    HAVING sum(qty) > T)`` nesting with the availqty comparison
    replaced by a fixed threshold (the testdata has no partsupp), with
    each supplier's nation. Output: (s_name, n_name, n_parts — how
    many distinct qualifying parts).

    Plan shape: the part-name filter broadcasts as a LEFT SEMI prune
    on the date-pruned fact scan; the per-(supplier, part) HAVING
    aggregate keys one shuffle; the qualifying pairs collapse to
    per-supplier counts on the same key prefix; supplier and nation
    broadcast at the top. Nothing wider than (suppkey, partkey, qty)
    ever shuffles."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(PT_NAME_PART)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(PT_D0)) & (F.col("l_shipdate") < _ts(PT_D1))
    )
    pairs = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > PT_MIN_QTY)
    )
    per_supp = pairs.groupBy("l_suppkey").agg(
        F.count("*").alias("n_parts")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        per_supp.join(F.broadcast(sup), per_supp.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select("s_name", "n_name", "n_parts")
    )


PART_PROMOTION_SQL = f"""
WITH pairs AS (
  SELECT l_suppkey, l_partkey
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{PT_D0} 00:00:00'
    AND l_shipdate < TIMESTAMP '{PT_D1} 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '%{PT_NAME_PART}%')
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > {PT_MIN_QTY}),
per AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts
        FROM pairs GROUP BY l_suppkey)
SELECT s_name, n_name, n_parts
FROM per
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""


# Q17 knobs
SL_BRANDS = ("Brand#11", "Brand#23")

# Q19 knobs: (brand, max p_size, qty lo, qty hi) disjuncts
BV_ARMS = (
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#34", 15, 20, 30),
)

# Q12 knobs
LS_Y0, LS_Y1 = "1997-01-01", "1998-01-01"
LS_LATE_DAYS = 90

# Q16 knobs
PV_EXCL_BRAND = "Brand#45"
PV_SIZES = (1, 4, 9, 16, 25, 36, 49)


def q_small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 analogue (small-quantity-order revenue): for parts of the
    SL_BRANDS brands, the revenue from lineitems whose quantity is
    below 20% of that part's average quantity — Q17's correlated
    scalar-AVG subquery, decorrelated into a per-part aggregate joined
    back onto the same filtered fact. The avg comparison is exact
    integer (qty*5*cnt < sum_qty — no division), so DuckDB parity holds
    at any scale; per-brand cent sums and the Q17 ``/7`` yearly figure
    via integer DIV.

    Plan shape: the brand filter prunes the fact through ONE broadcast
    join BEFORE any aggregation; the per-part (sum, cnt) comes from a
    window OVER the partkey partition on the SAME pruned rows — the
    textbook window decorrelation, ONE fact scan and one partkey
    exchange total (the join-back formulation the oracle uses scans
    the fact twice; plan-asserted single-scan in the test). Unlike the
    rejected BM25 word-window (a corpus-wide stopword concentrates on
    one task), the partition key here is the part: per-part line
    counts are bounded at any corpus size, so the window is skew-safe."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*SL_BRANDS)
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "l_partkey",
            "p_brand",
            F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("qty"),
            _cents("l_extendedprice").alias("price_cents"),
        )
    )
    w = Window.partitionBy("l_partkey")
    small = (
        li.withColumn("sum_qty", F.sum("qty").over(w))
        .withColumn("cnt", F.count("*").over(w))
        .filter(F.col("qty") * 5 * F.col("cnt") < F.col("sum_qty"))
    )
    return (
        small.groupBy("p_brand")
        .agg(
            F.sum("price_cents").alias("sum_rev_cents"),
            F.count("*").alias("n_lines"),
        )
        .select(
            "p_brand",
            "sum_rev_cents",
            F.expr("sum_rev_cents DIV 7").alias("avg_yearly_cents"),
            "n_lines",
        )
    )


SMALL_LOT_REVENUE_SQL = f"""
WITH li AS (
  SELECT l_partkey, p_brand,
         CAST(floor(l_quantity) AS BIGINT) AS qty,
         {CENTS.format(x='l_extendedprice')} AS price_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand IN {tuple(SL_BRANDS)}),
avgq AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
                CAST(count(*) AS BIGINT) AS cnt
         FROM li GROUP BY l_partkey),
small AS (
  SELECT p_brand, price_cents
  FROM li JOIN avgq USING (l_partkey)
  WHERE qty * 5 * cnt < sum_qty)
SELECT p_brand, CAST(sum(price_cents) AS BIGINT) AS sum_rev_cents,
       CAST(sum(price_cents) // 7 AS BIGINT) AS avg_yearly_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM small GROUP BY p_brand
"""


def q_brand_volume_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 analogue (discounted revenue, the OR-of-ANDs predicate):
    revenue per brand over lineitem ⋈ part where any BV_ARMS disjunct
    holds — each arm constrains (p_brand, p_size, l_quantity) jointly,
    so no single conjunct can be pushed below the join; Q19's shape
    tests that the optimizer still pushes the DERIVABLE part (brand ∈
    arms, size <= max) into the dimension scan and evaluates the
    residual disjunction on joined rows.

    Plan shape: part broadcasts (with the derived brand/size prefilter
    pushed to its scan); ONE pass over the fact, no shuffle except the
    3-row final combine."""
    arms_spark = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s}"
        f" AND qty BETWEEN {lo} AND {hi})"
        for b, s, lo, hi in BV_ARMS
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*[a[0] for a in BV_ARMS])
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("qty"),
        _cents(REV).alias("rev_cents"),
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .filter(F.expr(arms_spark))
        .groupBy("p_brand")
        .agg(
            F.sum("rev_cents").alias("rev_cents"),
            F.count("*").alias("n_lines"),
        )
    )


_BV_ARMS_SQL = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s}"
    f" AND CAST(floor(l_quantity) AS BIGINT) BETWEEN {lo} AND {hi})"
    for b, s, lo, hi in BV_ARMS
)

BRAND_VOLUME_REVENUE_SQL = f"""
SELECT p_brand, CAST(sum({CENTS.format(x=REV)}) AS BIGINT) AS rev_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_BV_ARMS_SQL}
GROUP BY p_brand
"""


def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analogue (shipping-priority distribution): among LS_Y0-year
    shipments that went out LATE (shipped more than LS_LATE_DAYS after
    the order date — the testdata has no commit/receipt dates, so
    order-to-ship latency stands in for Q12's commit/receipt race),
    per returnflag (the shipmode stand-in): how many belong to
    high-priority orders (1-URGENT / 2-HIGH) vs low — Q12's two-level
    CASE-sum over an orders ⋈ lineitem join whose predicate spans BOTH
    relations (date arithmetic across the join), unpushable to either
    scan alone.

    Plan shape: the ship-year filter prunes the fact scan; the
    lineitem ⋈ orders equi-join is the one shuffle pair (both sides
    big at warehouse scale); the cross-relation lateness predicate
    evaluates on joined rows; the final agg collapses to |returnflag|
    rows map-side."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(LS_Y0)) & (F.col("l_shipdate") < _ts(LS_Y1))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {LS_LATE_DAYS} DAYS")
    )
    hi = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
    return late.groupBy("l_returnflag").agg(
        F.sum(F.expr(f"CASE WHEN {hi} THEN 1 ELSE 0 END")).alias(
            "high_line_count"
        ),
        F.sum(F.expr(f"CASE WHEN {hi} THEN 0 ELSE 1 END")).alias(
            "low_line_count"
        ),
    )


LATE_SHIPMENTS_SQL = f"""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{LS_Y0} 00:00:00'
  AND l_shipdate < TIMESTAMP '{LS_Y1} 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL {LS_LATE_DAYS} DAYS
GROUP BY l_returnflag
"""


def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analogue (parts/supplier relationship): per (p_brand,
    p_size), how many DISTINCT suppliers shipped that part — parts of
    the excluded brand and off-list sizes removed, suppliers with a
    negative account balance (the complaint stand-in; the testdata has
    no comment column) removed by LEFT ANTI join. The shipped
    (l_partkey, l_suppkey) pairs are the partsupp stand-in. Q16's
    shape: dual negative filters (dimension NOT-predicate + supplier
    NOT IN) feeding a count-distinct over a wide group.

    Plan shape: qualifying parts broadcast-SEMI-prune the fact scan;
    the (few) excluded suppliers broadcast as an ANTI join; the pair
    distinct and the count-distinct share one (brand, size)-compatible
    aggregation pipeline — two exchanges total at any scale."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != PV_EXCL_BRAND)
        & F.col("p_size").isin(*PV_SIZES)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SUPPLIER_PART_VARIETY_SQL = f"""
SELECT p_brand, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{PV_EXCL_BRAND}'
  AND p_size IN {tuple(PV_SIZES)}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


# Q11 knobs ("important stock"): the supplier-nation group holding the
# inventory of interest, and the importance multiple over the average
# per-part value. Classic Q11's FRACTION threshold (0.0001/SF) is
# scale-dependent — value-per-part shrinks as |parts| grows — so the
# analogue keys the HAVING off the AVERAGE part value instead
# (value > IP_MULT x avg), which selects a stable top slice at any SF.
IP_NATION_MOD, IP_NATION_REM = 5, 2
IP_MULT = 2


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue (important stock identification): total traded
    value per part supplied by one nation group, keeping parts whose
    value exceeds IP_MULT x the group's average per-part value — the
    group-HAVING-against-a-scalar-over-the-same-aggregate shape (Q11's
    decorrelated scalar subquery). The testdata has no partsupp
    relation, so per-part value is derived from lineitem
    (cents(extendedprice) x quantity, integer-exact).

    Plan shape: the supplier dim broadcasts into the fact scan; ONE
    exchange builds the per-part values, which are PERSISTED
    (persist_latest) because the plan references them twice — as the
    output rows and as the input of the (total, count) scalar; without
    the persist Catalyst inlines the subtree per consumer and the fact
    scans twice (observed in the executed plan). The 1-row scalar then
    broadcasts back over the cached relation — one fact scan, no
    fact-fact shuffle. Threshold compare is integer division over exact
    cent sums, so DuckDB parity holds at any scale."""
    from ..schemas import persist_latest

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") % IP_NATION_MOD == IP_NATION_REM
    )
    val = (
        li.join(
            F.broadcast(supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                _cents("l_extendedprice")
                * F.col("l_quantity").cast("bigint")
            ).alias("value_cents")
        )
    )
    val = persist_latest(val, "important_parts_val")
    tot = val.agg(
        F.sum("value_cents").alias("t"), F.count("*").alias("n")
    )
    return (
        val.join(F.broadcast(tot))
        .filter(
            F.col("value_cents")
            > F.expr(f"({IP_MULT} * t) DIV n")
        )
        .select("l_partkey", "value_cents")
    )


IMPORTANT_PARTS_SQL = f"""
WITH val AS (
  SELECT l_partkey,
         CAST(sum({CENTS.format(x='l_extendedprice')}
              * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey % {IP_NATION_MOD} = {IP_NATION_REM}
  GROUP BY l_partkey),
tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS n FROM val)
SELECT l_partkey, value_cents FROM val, tot
WHERE value_cents > ({IP_MULT} * t) // n
"""


QUERIES = {
    "important_parts": q_important_parts,
    "market_share": q_market_share,
    "returned_customers": q_returned_customers,
    "order_priority": q_order_priority,
    "unshipped_revenue": q_unshipped_revenue,
    "trade_volume": q_trade_volume,
    "prospect_customers": q_prospect_customers,
    "product_profit": q_product_profit,
    "lonely_returns": q_lonely_returns,
    "min_cost_supplier": q_min_cost_supplier,
    "order_count_distribution": q_order_count_distribution,
    "large_orders": q_large_orders,
    "top_supplier": q_top_supplier,
    "part_promotion": q_part_promotion,
    "small_lot_revenue": q_small_lot_revenue,
    "brand_volume_revenue": q_brand_volume_revenue,
    "late_shipments": q_late_shipments,
    "supplier_part_variety": q_supplier_part_variety,
}

ORACLES = {
    "important_parts": IMPORTANT_PARTS_SQL,
    "market_share": MARKET_SHARE_SQL,
    "returned_customers": RETURNED_CUSTOMERS_SQL,
    "order_priority": ORDER_PRIORITY_SQL,
    "unshipped_revenue": UNSHIPPED_REVENUE_SQL,
    "trade_volume": TRADE_VOLUME_SQL,
    "prospect_customers": PROSPECT_CUSTOMERS_SQL,
    "product_profit": PRODUCT_PROFIT_SQL,
    "lonely_returns": LONELY_RETURNS_SQL,
    "min_cost_supplier": MIN_COST_SUPPLIER_SQL,
    "order_count_distribution": ORDER_COUNT_DISTRIBUTION_SQL,
    "large_orders": LARGE_ORDERS_SQL,
    "top_supplier": TOP_SUPPLIER_SQL,
    "part_promotion": PART_PROMOTION_SQL,
    "small_lot_revenue": SMALL_LOT_REVENUE_SQL,
    "brand_volume_revenue": BRAND_VOLUME_REVENUE_SQL,
    "late_shipments": LATE_SHIPMENTS_SQL,
    "supplier_part_variety": SUPPLIER_PART_VARIETY_SQL,
}
