"""SparkSession factory tuned for this engine.

Local mode is the test harness; the config discipline (AQE, shuffle
partition sizing, Arrow, UTC) is what we would ship to a 1000-executor
cluster — only master/memory change there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .vendorpath import ensure_protobuf


def get_spark(
    app_name: str = "flink_stream_processing_refarch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    Defaults follow the env contract: ``local[$SPARK_GRAFT_CPUS]`` and
    shuffle partitions sized to the core count (not the 200 default, which
    produces tiny partitions locally; on a real cluster this is set to
    ~2-3x total cores instead).
    """
    # Must run before the JVM spawns: exports the miniproto vendor dir on
    # PYTHONPATH so Spark's python workers can import google.protobuf
    # (transformWithStateInPandas state protocol). No-op when the real
    # protobuf distribution is installed.
    ensure_protobuf()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.ts is TIMESTAMP(NANOS) — read as BIGINT nanos
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
