"""Public query API: the full Spark SQL surface over the engine's
tables.

The reference exposes its two queries as compiled Java dataflows
(flink-taxi-stream-processor/.../ProcessTaxiStream.java:96-136); this
engine additionally exposes EVERYTHING Catalyst can plan as ad-hoc ANSI
SQL over the registered tables — the interface a warehouse user
actually reaches for first. Views go through ``load_table`` so every
layout shim (timestamp normalization, the starved-scan materialization)
applies identically to SQL and DataFrame callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every engine table as a temp view named like the table."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ad-hoc SQL against the engine's tables (views refreshed
    first, so in-place data regeneration is picked up)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
