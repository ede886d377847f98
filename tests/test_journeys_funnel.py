"""Funnel + concurrency-sweep invariants (journeys.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators import journeys
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_funnel_monotone(spark):
    """Each step conditions on the previous, so counts can only shrink."""
    r = journeys.events_funnel_ordered(spark, SF_ORACLE).collect()[0]
    assert r.n_signup >= r.n_click >= r.n_purchase >= 0
    assert r.n_signup > 0 and r.n_click > 0, "fixture should convert users"
    assert 0 <= r.conv_overall_milli <= r.conv_click_milli <= 1000


def test_peak_concurrency_bounds(spark):
    """Per-day peak is at least 1 on any day with a session, never
    exceeds that day's session count, and the attaining second falls
    inside the day."""
    rows = journeys.sessions_peak_concurrency(spark, SF_ORACLE).collect()
    assert rows
    ev = t(spark, SF_ORACLE, "events_ms")
    n_users = ev.select("user_id").distinct().count()
    for r in rows:
        assert r.peak_concurrency >= 1
        assert r.peak_concurrency <= n_users
        day_start = (
            spark.sql(f"SELECT unix_date(DATE'{r.day}') * 86400 AS s").collect()[0].s
        )
        assert day_start <= r.first_peak_epoch_s <= day_start + 86399
