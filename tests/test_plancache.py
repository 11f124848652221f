"""Behavioral tests for the per-session plan cache (plancache.py) and its
wiring in the __spark_entry__ registry."""

from __future__ import annotations

import sys

from conftest import SF_DIR

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from flink_stream_processing_refarch_spark import plancache


def test_batch_queries_return_same_plan_per_session_and_sf(spark):
    q = entry.queries()
    df1 = q["pricing_summary"](spark, SF_DIR)
    df2 = q["pricing_summary"](spark, SF_DIR)
    assert df1 is df2  # one compile per (session, sf_dir)


def test_cache_key_includes_sf_dir(spark):
    q = entry.queries()
    a = q["pricing_summary"](spark, SF_DIR)
    b = q["pricing_summary"](spark, "/root/testdata/sf0.01")
    assert a is not b


def test_streaming_and_stateful_builders_are_not_cached(spark):
    """Streaming entries re-run their bounded stream per call; stateful
    builders (convergence actions / localCheckpoint) re-run their
    algorithm — neither may serve a memoized frame."""
    q = entry.queries()
    for name in ("streaming_dedup", "dedup_clusters", "semantic_dedup"):
        df1 = q[name](spark, SF_DIR)
        df2 = q[name](spark, SF_DIR)
        assert df1 is not df2, name


def test_cached_plan_still_recomputes_results(spark):
    """The cache memoizes the PLAN; collect on it must still produce the
    full result set (and equal a fresh uncached build)."""
    q = entry.queries()
    cached = q["semi_join"](spark, SF_DIR)
    n1 = len(cached.collect())
    plancache.clear()
    fresh = q["semi_join"](spark, SF_DIR)
    assert fresh is not cached
    assert len(fresh.collect()) == n1 > 0
