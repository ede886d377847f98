"""Last-touch attribution invariants (attribution.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators import attribution
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_attribution_conserves_purchases_and_revenue(spark):
    """Every purchase lands in exactly one channel (touch types +
    'direct'), and attributed revenue sums to total purchase revenue."""
    out = attribution.events_last_touch_attribution(spark, SF_ORACLE).collect()
    channels = {r.channel for r in out}
    assert channels <= set(attribution._TOUCH_TYPES) | {"direct"}
    ev = t(spark, SF_ORACLE, "events_ms").filter(F.col("event_type") == "purchase")
    want = ev.agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("value").cast("decimal(12,4)") * 100).cast("bigint")
        ).alias("cents"),
    ).collect()[0]
    assert sum(r.n_purchases for r in out) == want.n
    assert sum(r.revenue_cents for r in out) == want.cents
    assert len(out) >= 2, "fixture should attribute to more than one channel"


def test_linear_attribution_conserves_revenue(spark):
    """Linear credits (floor + remainder-to-last) must sum exactly to
    total purchase revenue — the integer split leaks nothing."""
    out = attribution.events_linear_attribution(spark, SF_ORACLE).collect()
    ev = t(spark, SF_ORACLE, "events_ms").filter(F.col("event_type") == "purchase")
    want = ev.agg(
        F.sum(
            (F.col("value").cast("decimal(12,4)") * 100).cast("bigint")
        ).alias("cents")
    ).collect()[0]
    assert sum(r.revenue_cents for r in out) == want.cents
    assert {r.channel for r in out} <= set(attribution._TOUCH_TYPES) | {"direct"}
