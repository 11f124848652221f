"""Product/stream-analytics queries over the event stream: ordered
funnel completion and retention cohorts.

The reference engine's domain is exactly this kind of event analytics
(its two queries are windowed counts over a taxi event stream,
flink-taxi-stream-processor/.../ProcessTaxiStream.java:96-136); funnels
and cohorts are the next two queries any owner of that stream asks for,
so they are first-class oracle-paired entries here.

Scale posture: every stage is a map-combinable aggregate or a join
CO-PARTITIONED on user_id — one exchange key end-to-end, so AQE reuses
the exchange across stages; nothing is collected, no per-row windows
over raw events (the cohort matrix is bounded by days², the funnel
output by |users|). Event timestamps are the engine's normalized BIGINT
epoch-nanos; outputs are epoch-ms / day indexes — exact integer math in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table

FUNNEL = ("view", "click", "purchase")  # ordered stages
DAY_MS = 86_400_000


def _ev_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_type, ts_ms) — ts normalized nanos -> epoch ms."""
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts DIV 1000000").alias("ts_ms"),
    )


def q_funnel_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered funnel: earliest 'view', then the earliest
    'click' STRICTLY AFTER it, then the earliest 'purchase' strictly
    after that (the standard strictly-ordered funnel definition — a
    purchase before the first view does not count). One row per user
    who entered the funnel: the three stage timestamps (NULL once the
    chain breaks) and the number of stages completed.

    Plan: stage k is a min-aggregate over events joined to the stage
    k-1 frontier on user_id — all three aggregates are map-combinable
    and every join keys on user_id, so the whole funnel runs inside one
    hash-partitioning of the stream."""
    ev = _ev_ms(spark, sf_dir)
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_view_ms"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL[1])
        .join(s1, "user_id")
        .filter(F.col("ts_ms") > F.col("t_view_ms"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_click_ms"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL[2])
        .join(s2, "user_id")
        .filter(F.col("ts_ms") > F.col("t_click_ms"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_purchase_ms"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_view_ms",
            "t_click_ms",
            "t_purchase_ms",
            (
                F.lit(1)
                + F.col("t_click_ms").isNotNull().cast("int")
                + F.col("t_purchase_ms").isNotNull().cast("int")
            ).alias("stages"),
        )
    )


FUNNEL_COMPLETION_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
s1 AS (
  SELECT user_id, min(ts_ms) AS t_view_ms FROM ev
  WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id),
s2 AS (
  SELECT ev.user_id, min(ts_ms) AS t_click_ms
  FROM ev JOIN s1 USING (user_id)
  WHERE event_type = '{FUNNEL[1]}' AND ts_ms > t_view_ms
  GROUP BY ev.user_id),
s3 AS (
  SELECT ev.user_id, min(ts_ms) AS t_purchase_ms
  FROM ev JOIN s2 USING (user_id)
  WHERE event_type = '{FUNNEL[2]}' AND ts_ms > t_click_ms
  GROUP BY ev.user_id)
SELECT s1.user_id, t_view_ms, t_click_ms, t_purchase_ms,
       1 + CAST(t_click_ms IS NOT NULL AS INT)
         + CAST(t_purchase_ms IS NOT NULL AS INT) AS stages
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention matrix: users grouped by first-activity day
    (the cohort), counted on each later day they return. Output is one
    row per (cohort_day, day_offset) with the distinct returning users
    — bounded by days², never by users or events.

    Plan: first-day per user and the distinct (user, day) activity set
    are both map-combinable aggregates on user_id; their join
    co-partitions on user_id; the final count shuffles only the
    bounded (cohort_day, day_offset, user) triples."""
    ev = _ev_ms(spark, sf_dir).select(
        "user_id", F.expr(f"ts_ms DIV {DAY_MS}").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_COHORTS_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) // {DAY_MS} AS day FROM events),
first AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, day FROM ev)
SELECT cohort_day, day - cohort_day AS day_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY cohort_day, day - cohort_day
"""


QUERIES = {
    "funnel_completion": q_funnel_completion,
    "retention_cohorts": q_retention_cohorts,
}

ORACLES = {
    "funnel_completion": FUNNEL_COMPLETION_SQL,
    "retention_cohorts": RETENTION_COHORTS_SQL,
}
