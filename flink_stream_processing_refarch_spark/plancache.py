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

Cache key: (JVM session UUID, sf_dir, sf_dir file stamp). Keyed on the
underlying JVM session's ``sessionUUID`` (globally unique — not the
Python wrapper id, and not ``hashCode()``, which is an identity hash
that a new session can reuse after the old one is GC'd) so a
stopped-and-rebuilt session never serves plans whose JVM state is gone.
The file stamp (total bytes + max mtime over the sf_dir's tables) makes
the cache self-invalidating when the driver regenerates testdata at the
same path mid-session — a cached DataFrame pins the parquet file
listing captured at first build, so serving it over replaced files
would throw or return stale rows. Bounded: plans are held per session,
and only the ``MAX_SESSIONS`` most recent sessions are retained — a
driver that rebuilds its session every round cannot accumulate
dead-session plans for the process lifetime.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

MAX_SESSIONS = 4

#: session key -> {(query name, sf_dir, stamp): DataFrame}, most-recent last
_CACHE: OrderedDict[object, dict[tuple, DataFrame]] = OrderedDict()


def _session_key(spark: SparkSession):
    """Globally-unique id of the live JVM session backing this wrapper."""
    try:
        return spark._jsparkSession.sessionUUID()
    except Exception:  # pragma: no cover - connect-mode or mock sessions
        return id(spark)


def cached_plan(
    name: str, fn: Callable[[SparkSession, str], DataFrame]
) -> Callable[[SparkSession, str], DataFrame]:
    """Wrap a (spark, sf_dir) -> DataFrame builder with plan memoization.

    Refuses builders marked ``stateful_build = True`` — those run part of
    their algorithm while CONSTRUCTING the plan (persist / localCheckpoint
    / convergence collects), so memoizing the built DataFrame would serve
    pre-computed state instead of re-running the work. The attribute
    lives on the builder itself (declared where the state-building code
    is), so the honesty of the bench can't drift out of sync with a
    hand-maintained exemption list.
    """
    if getattr(fn, "stateful_build", False):
        raise ValueError(
            f"{name} is marked stateful_build; it must not be plan-cached"
        )

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .schemas import table_stamp

        skey = _session_key(spark)
        plans = _CACHE.get(skey)
        if plans is None:
            plans = _CACHE[skey] = {}
            while len(_CACHE) > MAX_SESSIONS:  # drop oldest session's plans
                _CACHE.popitem(last=False)
        else:
            _CACHE.move_to_end(skey)
        key = (name, sf_dir, table_stamp(sf_dir))
        df = plans.get(key)
        if df is None:
            from .schemas import evict_stale_stamp

            # in-place testdata regeneration: this query's previous-stamp
            # plan can never be served again — drop it so a long-lived
            # session's cache doesn't accumulate a plan per generation
            evict_stale_stamp(plans, key, 2)
            df = plans[key] = fn(spark, sf_dir)
        return df

    wrapped.__name__ = f"cached_{name}"
    wrapped.__doc__ = fn.__doc__
    return wrapped


def clear() -> None:
    """Drop all cached plans (tests / session teardown)."""
    _CACHE.clear()
