"""Semantic tests for incremental aggregate maintenance: all three CDC
change types occur non-vacuously, the delta aggregate touches only changed
groups, and maintenance equals full recomputation exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators import incremental
from kalytical_spark.operators.common import DEC
from tests.conftest import SF_ORACLE


def test_all_three_change_types_present(spark):
    old, new = incremental._snapshots(spark, SF_ORACLE)
    changes = incremental.diff_snapshots(old, new, "o_orderkey")
    kinds = {r.change_type for r in changes.select("change_type").distinct().collect()}
    assert kinds == {"added", "removed", "changed"}


def test_changed_rows_carry_both_sides(spark):
    old, new = incremental._snapshots(spark, SF_ORACLE)
    changes = incremental.diff_snapshots(old, new, "o_orderkey")
    chg = changes.filter(F.col("change_type") == "changed").limit(5).collect()
    assert chg
    for r in chg:
        assert (
            float(r.old_row.o_totalprice) - float(r.new_row.o_totalprice)
            == incremental._CHG_BUMP
        )


def test_maintenance_equals_recompute(spark):
    """The incrementally maintained aggregate must equal a from-scratch
    groupBy over the new snapshot, row for row and bit for bit."""
    maintained = {
        (r.o_orderstatus, r.order_month): (r.n, r.sum_totalprice)
        for r in incremental.orders_incremental_agg(spark, SF_ORACLE).collect()
    }
    _, new = incremental._snapshots(spark, SF_ORACLE)
    recomputed = {
        (r.o_orderstatus, r.order_month): (r.n, r.sum_totalprice)
        for r in new.withColumn(
            "order_month", F.date_trunc("month", "o_orderdate").cast("date")
        )
        .groupBy("o_orderstatus", "order_month")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("sum_totalprice"),
        )
        .collect()
    }
    assert maintained == recomputed


def test_delta_touches_only_changed_groups(spark):
    """The merge must not rewrite untouched groups: groups with no changed
    rows keep their old_agg value by the outer-join coalesce, and the delta
    side contains only groups that actually had a change."""
    old, new = incremental._snapshots(spark, SF_ORACLE)
    grp = lambda df: df.withColumn(  # noqa: E731
        "order_month", F.date_trunc("month", "o_orderdate").cast("date")
    )
    changes = incremental.diff_snapshots(grp(old), grp(new), "o_orderkey")
    touched = {
        (r.s, r.m)
        for r in changes.select(
            F.coalesce(
                F.col("new_row.o_orderstatus"), F.col("old_row.o_orderstatus")
            ).alias("s"),
            F.coalesce(
                F.col("new_row.order_month"), F.col("old_row.order_month")
            ).alias("m"),
        )
        .distinct()
        .collect()
    }
    n_groups = (
        grp(new).select("o_orderstatus", "order_month").distinct().count()
    )
    assert 0 < len(touched) < n_groups, (
        "synthetic churn should touch some but not all groups, proving the "
        "maintenance path skips the unchanged bulk"
    )
