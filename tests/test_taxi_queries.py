"""Oracle-checked golden tests for the reference's query surface
(SURVEY.md §0 Q1/Q2, §2.2-2.3) at sf0.001."""

from __future__ import annotations

from conftest import SF_DIR, assert_matches_oracle

from flink_stream_processing_refarch_spark.oracle import sqlgen
from flink_stream_processing_refarch_spark.plans import taxi
from flink_stream_processing_refarch_spark.sources import trips as trips_mod


def test_q1_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, taxi.q1_pickup_count, sqlgen.q1_sql())


def test_q2_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, taxi.q2_trip_duration, sqlgen.q2_sql())


def test_trips_clean_matches_oracle(spark, duck):
    assert_matches_oracle(
        spark, duck, taxi.q_trips_clean, sqlgen.trips_clean_sql(), min_rows=1
    )


def test_airport_trips_matches_oracle(spark, duck):
    assert_matches_oracle(
        spark, duck, taxi.q_airport_trips, sqlgen.airport_trips_oracle_sql(),
        min_rows=1,
    )


def test_trending_cells_matches_oracle_and_q1_consistency(spark, duck):
    assert_matches_oracle(
        spark, duck, taxi.q_trending_cells, sqlgen.trending_cells_sql(),
        min_rows=1,
    )
    # cross-query consistency: for every (window, cell) Q1 reports, the
    # trending count for that cell (when ranked) must agree
    trend = {
        (r.timestamp, r.location): r.pickup_count
        for r in taxi.q_trending_cells(spark, SF_DIR).collect()
    }
    assert trend
    for r in taxi.q1_pickup_count(spark, SF_DIR).collect():
        key = (r.timestamp, r.location)
        if key in trend:
            assert trend[key] == r.pickup_count


def test_filter_chain_excludes_fixture_cases(spark):
    """FIXTURES.md §4: watermark rows, invalid coords, hole cells and
    out-of-region endpoints are all filtered; negative durations are kept."""
    derived = trips_mod.derive_trips(spark, SF_DIR)
    clean = trips_mod.clean_trips(spark, SF_DIR)
    n_all = derived.count()
    n_clean = clean.count()
    assert 0 < n_clean < n_all
    # no watermark rows survive (P1)
    assert clean.filter("type = 'watermark'").count() == 0
    # pickup anchor 5 = dr72 hole, 6 = outside NYC, 7/12 = invalid (P3/P4)
    assert clean.filter("trip_id % 13 IN (5, 6, 7, 12)").count() == 0
    # negative durations survive (reference does not filter them, M2/F4)
    neg = taxi.airport_trips(spark, SF_DIR).filter("duration_min < 0")
    assert neg.count() > 0


def test_q1_plan_shape(spark):
    """One shuffle (the groupBy exchange), no Python eval in the plan."""
    plan = (
        taxi.q1_pickup_count(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # hash exchange (+AQE read)
