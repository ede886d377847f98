"""Semantic tests for the deep decision-support shapes: the outer-join
zero bucket is non-vacuous, the having-gate broadcasts, the q21 aggregate
rewrite flags only sole-late suppliers, and market shares sum to one."""

from __future__ import annotations

from kalytical_spark.operators import decision_support as ds
from tests.conftest import SF_ORACLE


def test_q13_zero_bucket_exists(spark):
    rows = ds.q13_order_count_distribution(spark, SF_ORACLE).collect()
    assert rows
    counts = {r.c_count: r.custdist for r in rows}
    assert 0 in counts and counts[0] > 0, (
        "customers whose only orders are urgent must land in the zero "
        "bucket — the predicate belongs in the JOIN condition, not WHERE"
    )
    assert len(counts) > 3


def test_q18_threshold_and_broadcast(spark):
    df = ds.q18_large_volume_customers(spark, SF_ORACLE)
    rows = df.collect()
    assert rows
    assert all(r.total_qty > ds._Q18_MIN_QTY for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, (
        "the having-gated aggregate is rare and must broadcast"
    )


def test_q21_sole_late_semantics(spark):
    rows = ds.q21_sole_late_supplier(spark, SF_ORACLE).collect()
    assert rows, "lateness threshold should flag suppliers on this corpus"
    assert all(r.numwait >= 1 for r in rows)
    # descending by numwait with name tie-break
    pairs = [(r.numwait, r.s_name) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_q12_buckets_partition_all_late_lines(spark):
    rows = ds.q12_late_shipment_priority(spark, SF_ORACLE).collect()
    assert rows
    assert any(r.high_line_count > 0 for r in rows)
    assert any(r.low_line_count > 0 for r in rows)


def test_q14_share_bounds(spark):
    (r,) = ds.q14_promo_revenue_share(spark, SF_ORACLE).collect()
    assert 0 < r.promo_revenue < r.total_revenue
    assert 0 < r.promo_share_pct < 100
    assert r.promo_share_pct == 100.0 * r.promo_revenue / r.total_revenue


def test_q22_dormant_non_vacuous(spark):
    rows = ds.q22_dormant_high_balance(spark, SF_ORACLE).collect()
    assert rows, "dormancy window must keep the anti join non-vacuous"
    assert all(r.numcust > 0 and r.totacctbal > 0 for r in rows)


def test_q2_argmin_total_and_minimal(spark):
    from pyspark.sql import functions as F
    from kalytical_spark.operators.common import t

    rows = ds.q2_min_cost_supplier(spark, SF_ORACLE).collect()
    assert rows
    by_part = {}
    for r in rows:
        assert r.p_partkey not in by_part, "argmin must be total: one row per part"
        by_part[r.p_partkey] = r.best_price
    mins = {
        r.l_partkey: r.m
        for r in t(spark, SF_ORACLE, "lineitem")
        .groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("m"))
        .collect()
    }
    assert by_part == {k: mins[k] for k in by_part}
    assert set(by_part) == set(mins)


def test_q4_exists_counts_orders_once(spark):
    from pyspark.sql import functions as F
    from kalytical_spark.operators.common import t

    rows = ds.q4_priority_order_check(spark, SF_ORACLE).collect()
    assert rows
    total_orders = t(spark, SF_ORACLE, "orders").count()
    # semi-join semantics: each qualifying order counted exactly once, so
    # the rollup can never exceed the order population
    assert 0 < sum(r.order_count for r in rows) <= total_orders


def test_q7_both_directions_present(spark):
    rows = ds.q7_nation_volume_shipping(spark, SF_ORACLE).collect()
    assert rows
    dirs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert len(dirs) == 2, "both trade directions must appear"
    assert all(r.revenue > 0 for r in rows)


def test_q8_shares_partition_unity(spark):
    rows = ds.q8_market_share(spark, SF_ORACLE).collect()
    assert rows
    per_year: dict[int, float] = {}
    for r in rows:
        assert 0.0 < r.share <= 1.0
        assert r.nation_rev <= r.year_rev
        per_year[r.o_year] = per_year.get(r.o_year, 0.0) + r.share
    for y, s in per_year.items():
        assert abs(s - 1.0) < 1e-9, f"{y}: shares sum to {s}"
