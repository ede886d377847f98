"""Python-differential check for the Spearman screen (stats.py): exact
integer components and rho against a from-scratch recompute."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from kalytical_spark.operators import stats
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def _doubled_ranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    out = [0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        dr = (i + 1) + j  # min rank + max rank = doubled average rank
        for k in range(i, j):
            out[order[k]] = dr
        i = j
    return out


def test_spearman_differential(spark):
    rows = stats.events_spearman_daily(spark, SF_ORACLE).collect()
    assert rows
    daily = (
        t(spark, SF_ORACLE, "events_ms")
        .select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            (F.col("value").cast("decimal(12,4)") * 100).cast("bigint").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("x"), F.sum("c").alias("y"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.x, r.y))
    for r in rows:
        xs, ys = zip(*series[r.event_type])
        u, v = _doubled_ranks(xs), _doubled_ranks(ys)
        n = len(xs)
        num = n * sum(a * b for a, b in zip(u, v)) - sum(u) * sum(v)
        dx = n * sum(a * a for a in u) - sum(u) ** 2
        dy = n * sum(b * b for b in v) - sum(v) ** 2
        assert (r.num, r.denx, r.deny, r.n_days) == (num, dx, dy, n), r
        if dx > 0 and dy > 0:
            assert abs(r.rho - num / math.sqrt(dx * dy)) < 1e-12
            assert -1.0 <= r.rho <= 1.0
        else:
            assert r.rho is None


def test_bootstrap_ci_brackets_point(spark):
    """Poisson bootstrap: B resamples, CI ordered, point estimate inside
    (the mean bootstrap distribution centers on the sample mean)."""
    r = stats.events_bootstrap_mean_ci(spark, SF_ORACLE).collect()[0]
    assert r.n_resamples == stats.BOOTSTRAP_B
    assert r.ci_lo_milli <= r.ci_hi_milli
    assert r.ci_lo_milli <= r.point_milli <= r.ci_hi_milli
    assert r.ci_lo_milli < r.ci_hi_milli, "CI should have nonzero width"


def test_abtest_power_invariants(spark):
    from kalytical_spark.operators import stats as st

    rows = {r.arm: r for r in st.events_abtest_power(spark, SF_ORACLE).collect()}
    # every non-baseline arm materialized on this fixture
    assert set(rows) == set(range(1, st.OPE_ARMS))
    for r in rows.values():
        assert r.n > 1 and r.n_0 > 1
        assert r.mde_cents > 0
        assert r.mean0_cents > 0
        # sanity: with thousands of rows per arm the MDE is a small
        # fraction of the baseline mean, not a multiple of it
        assert r.mde_cents < r.mean0_cents
    # uniform md5 arms: sizes within 25% of each other
    ns = [r.n for r in rows.values()]
    assert max(ns) < 1.25 * min(ns)


def test_sprt_monitor_walk_algebra(spark):
    from kalytical_spark.operators import stats as st

    rows = {r.arm: r for r in st.events_sprt_monitor(spark, SF_ORACLE).collect()}
    assert set(rows) == set(range(st.OPE_ARMS))
    for r in rows.values():
        assert r.min_llr_micro <= r.max_llr_micro
        if r.decision == "accept_h1":
            assert r.h1_cross_day is not None
            assert r.max_llr_micro >= st.SPRT_BOUND_MICRO
            if r.h0_cross_day is not None:
                assert r.h1_cross_day <= r.h0_cross_day
        elif r.decision == "accept_h0":
            assert r.h0_cross_day is not None
            assert r.min_llr_micro <= -st.SPRT_BOUND_MICRO
        else:
            assert r.h1_cross_day is None and r.h0_cross_day is None
            assert -st.SPRT_BOUND_MICRO < r.min_llr_micro
            assert r.max_llr_micro < st.SPRT_BOUND_MICRO
