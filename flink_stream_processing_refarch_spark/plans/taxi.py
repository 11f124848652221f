"""The reference's two continuous queries, re-expressed as batch DataFrame
plans (SURVEY.md §0; streaming bindings live in ``streaming/jobs.py``).

Q1 — "areas with high pickup rates" (ProcessTaxiStream.java:96-106):
  trips per (pickup geohash6, 10-min tumbling event-time window), emit
  groups with count >= MIN_PICKUP_COUNT (= 2, ProcessTaxiStream.java:57),
  timestamped window.maxTimestamp() = end - 1 ms.

Q2 — "average trip duration to JFK/LGA" (ProcessTaxiStream.java:109-136):
  for trips dropping off near JFK or LGA (JFK checked first — else-if
  precedence, :114-117), sum and average of the whole-minute trip duration
  per (pickup geohash6, airport code, 10-min window); emit only groups with
  count > 1 (:123).

Scale posture: the filter chain is all range predicates (pushed to scan);
the single shuffle per query is the hash exchange of groupBy on
(location[, airport], window) — the same exchange Flink's keyBy does
(ProcessTaxiStream.java:98,120). Geohash encode is pure bitwise built-ins
inside whole-stage codegen. Event time is bucketed to epoch-aligned
10-minute windows by modular arithmetic on epoch-ms, identical to Spark's
``window()`` alignment but cheaper (no struct column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from ..functions.timeutils import duration_min_sql, window_end_ms_sql
from ..sources.trips import clean_trips

MIN_PICKUP_COUNT = 2  # ProcessTaxiStream.java:57


def q1_pickup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 over the derived trips table (batch = final streaming answer)."""
    trips = clean_trips(spark, sf_dir)
    trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)
    trips = trips.withColumn("wend", F.expr(window_end_ms_sql("dropoff_ms")))
    return (
        trips.groupBy("location", "wend")
        .agg(F.count("*").alias("pickup_count"))
        .filter(F.col("pickup_count") >= MIN_PICKUP_COUNT)
        .select(
            "location",
            "pickup_count",
            (F.col("wend") - 1).alias("timestamp"),  # window.maxTimestamp()
        )
    )


def airport_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 flatMap equivalent (ProcessTaxiStream.java:110-119): classify the
    dropoff as JFK (checked first) or LGA, drop everything else, and attach
    the floored-minute duration and pickup geohash6."""
    trips = clean_trips(spark, sf_dir)
    trips = trips.withColumn(
        "airport_code",
        F.when(geo.near_jfk("dropoff_lat", "dropoff_lon"), F.lit("JFK")).when(
            geo.near_lga("dropoff_lat", "dropoff_lon"), F.lit("LGA")
        ),
    ).filter(F.col("airport_code").isNotNull())
    trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)
    return trips.withColumn(
        "duration_min", F.expr(duration_min_sql("dropoff_ms", "pickup_ms", "spark"))
    ).select("trip_id", "location", "airport_code", "duration_min", "dropoff_ms")


def q2_trip_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: per (location, airport, window) sum/avg of floored minutes."""
    at = airport_trips(spark, sf_dir)
    at = at.withColumn("wend", F.expr(window_end_ms_sql("dropoff_ms")))
    return (
        at.groupBy("location", "airport_code", "wend")
        .agg(
            F.sum("duration_min").alias("sum_trip_duration"),
            F.count("*").alias("cnt"),
        )
        .filter(F.col("cnt") > 1)  # ProcessTaxiStream.java:123
        .select(
            "location",
            "airport_code",
            "sum_trip_duration",
            (F.col("sum_trip_duration").cast("double") / F.col("cnt")).alias(
                "avg_trip_duration"
            ),
            (F.col("wend") - 1).alias("timestamp"),
        )
    )


TREND_TOP = 5  # trending cells kept per window


def q_trending_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 10-minute window, the TREND_TOP pickup cells by trip count
    with their rank — the "trending locations" leaderboard the
    reference's Kibana dashboard renders from Q1's output
    (elasticsearch/kibana-visualizations-and-dashboard.json), computed
    engine-side as a first-class query instead of in the serving layer.
    Same derivation as Q1 up to the (location, window) counts; the
    cutoff is a per-window rank (window partition = wend), no global
    sort and no HAVING floor — quiet windows still report their top
    cells. Ties break to the lexicographically first cell."""
    trips = clean_trips(spark, sf_dir)
    trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)
    trips = trips.withColumn("wend", F.expr(window_end_ms_sql("dropoff_ms")))
    counts = trips.groupBy("wend", "location").agg(
        F.count("*").alias("pickup_count")
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("wend").orderBy(
            F.desc("pickup_count"), F.asc("location")
        )
    )
    return (
        counts.withColumn("rank", rn)
        .filter(F.col("rank") <= TREND_TOP)
        .select(
            (F.col("wend") - 1).alias("timestamp"),
            "location",
            "pickup_count",
            "rank",
        )
    )


def q_trips_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The P1-P4 filter chain + geohash projection (M1) as its own query —
    the shared prefix both reference queries consume."""
    trips = clean_trips(spark, sf_dir)
    trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)
    return trips.select("trip_id", "location", "dropoff_ms", "total_amount")


def q_airport_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    return airport_trips(spark, sf_dir).select(
        "trip_id", "location", "airport_code", "duration_min"
    )
