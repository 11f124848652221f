"""Structured Streaming bindings for the reference's two continuous
queries (ProcessTaxiStream.java:96-136).

Watermark semantics (SURVEY.md §4.3): the reference uses punctuated
in-band watermarks injected by the producer; Spark derives the watermark
from the event-time column (``withWatermark``). On bounded input with the
``availableNow`` trigger, append-mode windows flush deterministically up
to the final watermark = max(event time) − delay: with delay 0 every
window except the one containing the maximum event time emits. The oracle
for the streaming variant is therefore the batch SQL restricted to
``window_end <= max(event_time)`` — an exact, checkable statement of
Spark's emission rule.

Architecture parity notes:
  - The shared ``trips`` sub-stream feeding both queries
    (ProcessTaxiStream.java:87,96,109 — a DAG fan-out Flink shares but two
    Spark ``writeStream``s would recompute) is handled the idiomatic Spark
    way: ONE query with ``foreachBatch`` computing both aggregates from a
    cached micro-batch (``run_taxi_pipeline``).
  - RocksDB state store (ProcessTaxiStream.java:145) maps to
    ``spark.sql.streaming.stateStore.providerClass`` = RocksDBStateStoreProvider.
  - Source throttling (SHARD_GETRECORDS_MAX, :76-77) maps to
    ``maxFilesPerTrigger`` / connector rate options.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geo
from ..functions.timeutils import duration_min_sql
from ..plans.taxi import MIN_PICKUP_COUNT
from ..sources.trips import clean_trip_filter_sql, trip_exprs

# events.parquet physical schema under the nanos-as-long read flag
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) -> bigint
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based streaming source over the events table (the local stand-
    in for the Kinesis consumer, S1; swap format('kinesis') in prod)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def stream_trips_from_wire(
    spark: SparkSession, json_dir: str, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Reference-faithful ingestion: newline JSON wire events (S1/S2) ->
    from_json with the union schema -> malformed rows dropped (S5:
    unparseable lines yield a null struct and are filtered, matching the
    producer's warn-and-skip) -> watermark event rows dropped (P1) ->
    P3/P4 filter chain -> event-time column + watermark."""
    from ..schemas import EVENT_SCHEMA

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.readStream.text(json_dir)
    ev = (
        raw.select(F.from_json("value", EVENT_SCHEMA).alias("e"))
        .filter(F.col("e").isNotNull() & F.col("e.type").isNotNull())
        .select("e.*")
    )
    trips = ev.withColumn(
        "pickup_ms", F.unix_millis("pickup_datetime")
    ).withColumn("dropoff_ms", F.unix_millis("dropoff_datetime"))
    trips = trips.filter(F.expr(clean_trip_filter_sql()))
    return trips.withColumn(
        "dropoff_ts", F.timestamp_millis(F.col("dropoff_ms"))
    ).withWatermark("dropoff_ts", watermark_delay)


def q1_from_wire(spark: SparkSession, json_dir: str, **source_opts) -> DataFrame:
    """Streaming Q1 over the JSON wire stream (bounded run to memory).

    source_opts go to the text source (e.g. maxFilesPerTrigger=1 to force
    one micro-batch per chunk file — the knob that makes watermark
    late-row dropping observable on bounded replays)."""
    from ..schemas import EVENT_SCHEMA

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.readStream
    for k, v in source_opts.items():
        reader = reader.option(k, v)
    raw = reader.text(json_dir)
    ev = (
        raw.select(F.from_json("value", EVENT_SCHEMA).alias("e"))
        .filter(F.col("e").isNotNull() & F.col("e.type").isNotNull())
        .select("e.*")
    )
    trips = ev.withColumn(
        "pickup_ms", F.unix_millis("pickup_datetime")
    ).withColumn("dropoff_ms", F.unix_millis("dropoff_datetime"))
    trips = trips.filter(F.expr(clean_trip_filter_sql()))
    trips = trips.withColumn(
        "dropoff_ts", F.timestamp_millis(F.col("dropoff_ms"))
    ).withWatermark("dropoff_ts", "0 seconds")
    trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)
    agg = (
        trips.groupBy(F.window("dropoff_ts", "10 minutes"), "location")
        .agg(F.count("*").alias("pickup_count"))
        .filter(F.col("pickup_count") >= MIN_PICKUP_COUNT)
        .select(
            "location",
            "pickup_count",
            (F.unix_millis("window.end") - 1).alias("timestamp"),
        )
    )
    return _run_to_memory(agg)


def stream_clean_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived trip stream with the P1-P4 filter chain and an event-time
    column; watermark attached AFTER filtering (so it tracks the cleaned
    stream, matching where the reference assigns timestamps)."""
    ev = stream_events(spark, sf_dir)
    trips = ev.select(
        *[F.expr(e).alias(name) for name, e in trip_exprs("spark")]
    ).filter(F.expr(clean_trip_filter_sql()))
    return trips.withColumn(
        "dropoff_ts", F.timestamp_millis(F.col("dropoff_ms"))
    ).withWatermark("dropoff_ts", "0 seconds")


def q1_stream_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Q1: append-mode windowed count with HAVING."""
    trips = stream_clean_trips(spark, sf_dir)
    trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)
    return (
        trips.groupBy(F.window("dropoff_ts", "10 minutes"), "location")
        .agg(F.count("*").alias("pickup_count"))
        .filter(F.col("pickup_count") >= MIN_PICKUP_COUNT)
        .select(
            "location",
            "pickup_count",
            (F.unix_millis("window.end") - 1).alias("timestamp"),
        )
    )


def q2_stream_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Q2: airport classification + windowed sum/avg duration."""
    trips = stream_clean_trips(spark, sf_dir)
    trips = trips.withColumn(
        "airport_code",
        F.when(geo.near_jfk("dropoff_lat", "dropoff_lon"), F.lit("JFK")).when(
            geo.near_lga("dropoff_lat", "dropoff_lon"), F.lit("LGA")
        ),
    ).filter(F.col("airport_code").isNotNull())
    trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)
    trips = trips.withColumn(
        "duration_min", F.expr(duration_min_sql("dropoff_ms", "pickup_ms", "spark"))
    )
    return (
        trips.groupBy(
            F.window("dropoff_ts", "10 minutes"), "location", "airport_code"
        )
        .agg(
            F.sum("duration_min").alias("sum_trip_duration"),
            F.count("*").alias("cnt"),
        )
        .filter(F.col("cnt") > 1)
        .select(
            "location",
            "airport_code",
            "sum_trip_duration",
            (F.col("sum_trip_duration").cast("double") / F.col("cnt")).alias(
                "avg_trip_duration"
            ),
            (F.unix_millis("window.end") - 1).alias("timestamp"),
        )
    )


def _run_to_memory(df: DataFrame, use_rocksdb: bool = True) -> DataFrame:
    """Run a bounded streaming query (availableNow) into a memory sink and
    return the final result as a batch DataFrame."""
    spark = df.sparkSession
    if use_rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q1_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded streaming replay of Q1 (availableNow -> memory sink)."""
    return _run_to_memory(q1_stream_df(spark, sf_dir))


def q2_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_to_memory(q2_stream_df(spark, sf_dir))


def run_taxi_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
) -> dict[str, DataFrame]:
    """The full consumer job (ProcessTaxiStream.main equivalent): ONE
    streaming query over the trip stream; each micro-batch is cached once
    and both aggregates are computed from it (the Flink DAG-fan-out
    equivalent, SURVEY.md §4.1), then bulk-written to the ES-style sink.

    Returns the accumulated results of both queries as batch DataFrames.
    """
    from .sinks import EsBulkFileSink, write_batch_to_es

    out_dir = out_dir or tempfile.mkdtemp(prefix="es_sink_")
    sink_q1 = EsBulkFileSink(out_dir + "/pickup_count")
    sink_q2 = EsBulkFileSink(out_dir + "/trip_duration")
    results: dict[str, list] = {"pickup_count": [], "trip_duration": []}

    trips = stream_clean_trips(spark, sf_dir)
    trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            wend = "unix_millis(window.end) - 1"
            q1 = (
                batch_df.groupBy(F.window("dropoff_ts", "10 minutes"), "location")
                .agg(F.count("*").alias("pickup_count"))
                .filter(F.col("pickup_count") >= MIN_PICKUP_COUNT)
                .select("location", "pickup_count", F.expr(wend).alias("timestamp"))
            )
            q2 = (
                batch_df.withColumn(
                    "airport_code",
                    F.when(
                        geo.near_jfk("dropoff_lat", "dropoff_lon"), F.lit("JFK")
                    ).when(geo.near_lga("dropoff_lat", "dropoff_lon"), F.lit("LGA")),
                )
                .filter(F.col("airport_code").isNotNull())
                .withColumn(
                    "duration_min",
                    F.expr(duration_min_sql("dropoff_ms", "pickup_ms", "spark")),
                )
                .groupBy(F.window("dropoff_ts", "10 minutes"), "location", "airport_code")
                .agg(
                    F.sum("duration_min").alias("sum_trip_duration"),
                    F.count("*").alias("cnt"),
                )
                .filter(F.col("cnt") > 1)
                .select(
                    "location",
                    "airport_code",
                    "sum_trip_duration",
                    (
                        F.col("sum_trip_duration").cast("double") / F.col("cnt")
                    ).alias("avg_trip_duration"),
                    F.expr(wend).alias("timestamp"),
                )
            )
            write_batch_to_es(q1, sink_q1, "pickup_count")
            write_batch_to_es(q2, sink_q2, "trip_duration")
            results["pickup_count"].extend(q1.collect())
            results["trip_duration"].extend(q2.collect())
        finally:
            batch_df.unpersist()

    ckpt = tempfile.mkdtemp(prefix="ckpt_pipeline_")
    q = (
        trips.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from ..schemas import PICKUP_COUNT_SCHEMA, TRIP_DURATION_SCHEMA

    return {
        "pickup_count": spark.createDataFrame(
            results["pickup_count"], PICKUP_COUNT_SCHEMA
        ),
        "trip_duration": spark.createDataFrame(
            results["trip_duration"], TRIP_DURATION_SCHEMA
        ),
        "out_dir": out_dir,
    }
