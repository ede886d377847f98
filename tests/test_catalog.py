"""Catalog regression tests: one session must be able to switch between
scale-factor directories without stale temp views (the driver runs the
sf0.001 smoke and the sf0.01 oracle gate on one session)."""

from __future__ import annotations

from kalytical_spark import catalog
from tests.conftest import SF_ORACLE, SF_SMALL


def test_sf_switch_rebinds_views(spark):
    catalog.register(spark, SF_SMALL)
    n_small = spark.table("lifecycle_events").count()
    sup_small = spark.table("pipeline_defs").count()
    catalog.register(spark, SF_ORACLE)
    n_oracle = spark.table("lifecycle_events").count()
    sup_oracle = spark.table("pipeline_defs").count()
    assert (n_small, sup_small) == (1000, 10)
    assert (n_oracle, sup_oracle) == (10000, 100)
    # and back again — the first registration must not be sticky
    catalog.register(spark, SF_SMALL)
    assert spark.table("lifecycle_events").count() == 1000
    assert spark.table("pipeline_defs").count() == 10
