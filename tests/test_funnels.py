"""Oracle parity + invariants for the event-stream product-analytics
queries (plans/funnels.py)."""

from __future__ import annotations

import pytest
from conftest import SF_DIR, assert_matches_oracle

from flink_stream_processing_refarch_spark.plans import funnels


@pytest.mark.parametrize("name", sorted(funnels.ORACLES))
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, funnels.QUERIES[name], funnels.ORACLES[name], min_rows=1
    )


def test_funnel_is_strictly_ordered(spark):
    rows = funnels.q_funnel_completion(spark, SF_DIR).collect()
    assert rows
    seen_stages = set()
    for r in rows:
        assert r["stages"] in (1, 2, 3)
        seen_stages.add(r["stages"])
        if r["t_click_ms"] is not None:
            assert r["t_click_ms"] > r["t_view_ms"]
        else:
            assert r["t_purchase_ms"] is None  # chain breaks monotonically
        if r["t_purchase_ms"] is not None:
            assert r["t_purchase_ms"] > r["t_click_ms"]
        assert r["stages"] == (
            1
            + (r["t_click_ms"] is not None)
            + (r["t_purchase_ms"] is not None)
        )


def test_retention_cohort_matrix_is_consistent(spark, duck):
    """day_offset 0 always exists per cohort (the cohort's own first
    day), offsets are non-negative, and summing distinct users over a
    cohort's offset-0 row equals the number of users whose first
    activity day is that cohort day."""
    rows = funnels.q_retention_cohorts(spark, SF_DIR).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r["day_offset"] >= 0
        by_cohort.setdefault(r["cohort_day"], {})[r["day_offset"]] = r["n_users"]
    expect = dict(
        duck.execute(
            f"""
            SELECT cohort_day, count(*) FROM (
              SELECT user_id, min(epoch_ms(ts) // {funnels.DAY_MS}) AS cohort_day
              FROM events GROUP BY user_id)
            GROUP BY cohort_day
            """
        ).fetchall()
    )
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets
        assert offsets[0] == expect[cohort]
