"""Schemas for the reference's wire and output models (SURVEY.md §1).

The reference deserializes JSON with Gson using snake_case naming and a
type-discriminated union on the ``type`` field
(flink-taxi-stream-processor/.../events/kinesis/Event.java:31-54). Spark
needs no POJO codegen — one wide StructType covers both event types
(``trip`` and ``watermark``); ``from_json`` binds snake_case directly.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Union of TripEvent (events/kinesis/TripEvent.java:22-28, producer-side
# trip_id at kinesis-taxi-stream-producer/.../events/TripEvent.java:30) and
# WatermarkEvent (events/kinesis/WatermarkEvent.java:21-31).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("trip_id", T.LongType()),
        T.StructField("pickup_datetime", T.TimestampType()),
        T.StructField("dropoff_datetime", T.TimestampType()),
        T.StructField("pickup_lat", T.DoubleType()),
        T.StructField("pickup_lon", T.DoubleType()),
        T.StructField("dropoff_lat", T.DoubleType()),
        T.StructField("dropoff_lon", T.DoubleType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("watermark", T.TimestampType()),
    ]
)

# Q1 output document (events/es/PickupCount.java:19-29, es-index.json:3-11).
PICKUP_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("location", T.StringType()),
        T.StructField("pickup_count", T.LongType()),
        T.StructField("timestamp", T.LongType()),  # window end - 1 ms
    ]
)

# Q2 output document (events/es/TripDuration.java:19-33, es-index.json:13-30).
TRIP_DURATION_SCHEMA = T.StructType(
    [
        T.StructField("location", T.StringType()),
        T.StructField("airport_code", T.StringType()),
        T.StructField("sum_trip_duration", T.LongType()),
        T.StructField("avg_trip_duration", T.DoubleType()),
        T.StructField("timestamp", T.LongType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir: str, name: str):
    """Read one testdata parquet table (TESTDATA.md).

    Pins the session timezone to UTC first: NTZ->TZ casts and epoch
    extraction must agree with DuckDB's naive-UTC reading even when the
    caller (e.g. the external driver) built the session without it.

    ``events`` additionally gets its ``ts`` normalized to BIGINT
    epoch-nanos (see :func:`normalize_event_ts`) so every downstream
    plan can use one arithmetic (``ts DIV 1000000`` -> epoch ms)
    regardless of which physical timestamp layout the driver generated.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df):
    """Normalize ``events.ts`` to BIGINT epoch-nanos.

    The driver's testdata generator has produced both parquet layouts
    across rounds: TIMESTAMP(NANOS) — which Spark can only read under
    ``spark.sql.legacy.parquet.nanosAsLong`` as a BIGINT of nanos — and
    TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ. DuckDB reads either
    as naive TIMESTAMP, so the oracles' ``epoch_ms(ts)`` is layout-blind;
    this shim gives the Spark side the same property. The NTZ->LTZ cast
    is exact because load_table pins the session timezone to UTC.
    """
    from pyspark.sql import functions as F  # noqa: N812

    if "ts" not in df.columns:
        return df
    dtype = dict(df.dtypes)["ts"]
    if dtype in ("timestamp", "timestamp_ntz"):
        df = df.withColumn(
            "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
        )
    return df


def spread(df):
    """Round-robin repartition ONLY when the scan is under-parallelized.

    The local testdata tables are single-file / single-row-group parquet,
    so they scan as 1-3 partitions and starve CPU-bound map work (md5,
    shingling) at local[32]. At real scale the scan has >= cores splits
    and this returns the input unchanged — so wide columns (document
    text) never cross a repartition exchange in the at-scale plan; the
    exchange exists only in the starved-scan local case. Callers should
    project down to the columns they need *before* calling.
    """
    sess = df.sparkSession
    par = sess.sparkContext.defaultParallelism
    return df.repartition(par) if df.rdd.getNumPartitions() < par else df
