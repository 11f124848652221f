"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator (SURVEY.md §2 + extensions) to a (spark, sf_dir) ->
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL the
driver hash-compares against at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from flink_stream_processing_refarch_spark.operators import dedup as dedup_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import multimodal as mm_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import sampling as sampling_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import similarity as sim_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import text as text_ops  # noqa: E402
from flink_stream_processing_refarch_spark.oracle import sqlgen  # noqa: E402
from flink_stream_processing_refarch_spark.plans import relational, subqueries, taxi  # noqa: E402
from flink_stream_processing_refarch_spark.streaming import jobs as streaming_jobs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Q1 (pickup counts per geohash6 per 10-min window) at sf0.001."""
    return taxi.q1_pickup_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {
        "q1_pickup_count": taxi.q1_pickup_count,
        "q2_trip_duration": taxi.q2_trip_duration,
        "trips_clean": taxi.q_trips_clean,
        "airport_trips": taxi.q_airport_trips,
        "q1_streaming": streaming_jobs.q1_streaming,
        "q2_streaming": streaming_jobs.q2_streaming,
    }
    out.update(streaming_jobs.QUERIES)
    out.update(relational.QUERIES)
    out.update(subqueries.QUERIES)
    out.update(text_ops.QUERIES)
    out.update(dedup_ops.QUERIES)
    out.update(sim_ops.QUERIES)
    out.update(mm_ops.QUERIES)
    out.update(sampling_ops.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = {
        "q1_pickup_count": sqlgen.q1_sql(),
        "q2_trip_duration": sqlgen.q2_sql(),
        "trips_clean": sqlgen.trips_clean_sql(),
        "airport_trips": sqlgen.airport_trips_oracle_sql(),
        "q1_streaming": sqlgen.q1_streaming_sql(),
        "q2_streaming": sqlgen.q2_streaming_sql(),
    }
    out.update(streaming_jobs.ORACLES)
    out.update(relational.ORACLES)
    out.update(subqueries.ORACLES)
    out.update(text_ops.ORACLES)
    out.update(dedup_ops.ORACLES)
    out.update(sim_ops.ORACLES)
    out.update(mm_ops.ORACLES)
    out.update(sampling_ops.ORACLES)
    return out
