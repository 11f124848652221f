"""Per-session plan cache for batch queries (prepared-statement layer).

A Spark DataFrame object carries its analyzed/optimized/physical plan in
``df.queryExecution``; re-collecting the SAME object re-runs only the
physical plan, while re-building the query from scratch re-pays Python
expression parsing, Catalyst analysis + optimization, codegen source
generation, and AQE re-planning — measured ~1.2 s/query for the
geohash-heavy taxi plans at local[32], ~10x their actual execution time.

The reference engine compiles its dataflow once at submit time and then
streams through it (flink-taxi-stream-processor ProcessTaxiStream.java:
env.execute — one JobGraph for the process lifetime); a long-running SQL
engine equally serves repeated identical queries from a plan cache. This
module gives the batch query registry the same steady-state behaviour:
one compile per (session, sf_dir), execution thereafter.

Scope: BATCH queries only. Streaming entries (anything that starts and
drains a bounded stream inside the callable) are never wrapped — their
cost IS the run, and memoizing would return the drained sink without
re-streaming.

Cache key: (JVM session id, sf_dir). Keyed on the underlying JVM session
(not the Python wrapper id) so a stopped-and-rebuilt session never
serves plans whose JVM state is gone. Bounded: one entry per query per
session — no eviction needed at this cardinality (~100 plans).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, int, str], DataFrame] = {}


def _session_key(spark: SparkSession) -> int:
    """Stable id of the live JVM session backing this SparkSession."""
    try:
        return spark._jsparkSession.hashCode()
    except Exception:  # pragma: no cover - connect-mode or mock sessions
        return id(spark)


def cached_plan(
    name: str, fn: Callable[[SparkSession, str], DataFrame]
) -> Callable[[SparkSession, str], DataFrame]:
    """Wrap a (spark, sf_dir) -> DataFrame builder with plan memoization."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (name, _session_key(spark), sf_dir)
        df = _CACHE.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _CACHE[key] = df
        return df

    wrapped.__name__ = f"cached_{name}"
    wrapped.__doc__ = fn.__doc__
    return wrapped


def clear() -> None:
    """Drop all cached plans (tests / session teardown)."""
    _CACHE.clear()
