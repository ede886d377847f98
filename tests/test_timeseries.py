"""Semantic tests for the time-series family: non-vacuous gap fill,
forward-fill carry semantics, cohort-matrix invariants, exact-integer
anomaly algebra, and equi-depth balance."""

from __future__ import annotations

from kalytical_spark.operators import timeseries
from tests.conftest import SF_ORACLE


def test_gap_fill_has_real_gaps_and_carries_forward(spark):
    rows = timeseries.events_gap_fill_resample(spark, SF_ORACLE).collect()
    assert rows, "resample grid should be non-empty"
    gaps = [r for r in rows if r.is_gap]
    hits = [r for r in rows if not r.is_gap]
    assert gaps, "sparse slice must produce genuine gap hours (non-vacuous)"
    assert hits, "slice must also contain observed hours"
    # gap rows carry n=0 and the last observed sum forward
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.hour)):
        if r.is_gap:
            assert r.n == 0
            assert r.ffill_sum_value == by_key.get(r.event_type)
        else:
            assert r.n > 0
            by_key[r.event_type] = r.ffill_sum_value
    # grid is dense: per type, hours step by exactly 1h
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r.hour)
    for hours in per_type.values():
        hours.sort()
        assert all(
            (b - a).total_seconds() == 3600 for a, b in zip(hours, hours[1:])
        )


def test_cohort_retention_invariants(spark):
    rows = timeseries.events_cohort_retention(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.week_offset
        assert 0 < r.n_active <= r.cohort_size
        assert 0 < r.retention_bps <= 10000
    # offset-0 retention is exactly 100%: every user is active in their
    # own first-seen week by construction
    zero = [r for r in rows if r.week_offset == 0]
    assert zero and all(r.retention_bps == 10000 for r in zero)


def test_rate_anomaly_algebra_is_exact(spark):
    rows = timeseries.events_rate_anomaly(spark, SF_ORACLE).collect()
    assert rows, "threshold should flag some hours on this corpus"
    n = timeseries._BASELINE_HOURS
    for r in rows:
        # recompute the integer inequality from the surfaced window sums
        assert r.lhs == timeseries._Z4_LHS * (r.c * n - r.s) ** 2
        assert r.rhs == timeseries._Z25_RHS * (n * r.ss - r.s * r.s)
        assert r.lhs > r.rhs


def test_rolling_wau_dominates_dau_and_is_monotone_in_coverage(spark):
    from pyspark.sql import functions as F
    from kalytical_spark.operators.common import t

    rows = timeseries.events_rolling_wau(spark, SF_ORACLE).collect()
    assert rows
    wau = {r.window_day: r.wau for r in rows}
    # brute-force check on a few days: wau(d) == distinct users active in
    # (d-6 .. d]
    ud = (
        t(spark, SF_ORACLE, "events_ms")
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    days = sorted(wau)
    for d in days[:: max(1, len(days) // 5)]:
        expect = len(
            {r.user_id for r in ud if 0 <= (d - r.day).days <= timeseries._WAU_DAYS - 1}
        )
        assert wau[d] == expect, d
    # WAU dominates single-day active counts
    dau: dict = {}
    for r in ud:
        dau[r.day] = dau.get(r.day, 0) + 1
    for d, n in dau.items():
        if d in wau:
            assert wau[d] >= n


def test_robust_outliers_match_bruteforce(spark):
    from kalytical_spark.operators.common import t

    rows = timeseries.events_robust_outliers(spark, SF_ORACLE).collect()
    assert rows
    vals: dict[str, list] = {}
    for r in (
        t(spark, SF_ORACLE, "events_ms").select("event_type", "value").collect()
    ):
        vals.setdefault(r.event_type, []).append(r.value)

    def q50(xs):
        xs = sorted(xs)
        n = len(xs)
        mid = (n - 1) / 2
        lo, hi = xs[int(mid)], xs[int(mid + 0.5)]
        return (lo + hi) / 2

    for r in rows:
        xs = vals[r.event_type]
        med = q50(xs)
        assert r.med == med
        devs = [abs(x - med) for x in xs]
        mad = q50(devs)
        assert r.mad == mad
        n_out = sum(1 for d in devs if d > timeseries._MAD_K * mad)
        assert r.n_outliers == n_out
        assert r.mad >= 0 and (r.n_outliers == 0 or r.max_adev > 0)


def test_cumulative_users_monotone_and_consistent(spark):
    from kalytical_spark.operators.common import t

    rows = sorted(
        timeseries.events_cumulative_users(spark, SF_ORACLE).collect(),
        key=lambda r: r.day,
    )
    assert rows
    running = 0
    for r in rows:
        running += r.new_users
        assert r.cumulative_users == running
    total_users = (
        t(spark, SF_ORACLE, "events_ms").select("user_id").distinct().count()
    )
    assert rows[-1].cumulative_users == total_users
    assert rows[0].new_users > 0, "first active day must introduce users"


def test_window_suite_algebra(spark):
    rows = timeseries.events_window_suite(spark, SF_ORACLE).collect()
    assert rows
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
    for et, rs in per_type.items():
        rs.sort(key=lambda r: (r.value, r.event_id))
        n = len(rs)
        for i, r in enumerate(rs):
            assert r.rk == i + 1  # total order -> rank == row position
            if n > 1:
                assert r.pr == i / (n - 1)
            assert r.cd == (i + 1) / n
            assert 1 <= r.quartile <= 4
            assert r.prev_value == (rs[i - 1].value if i > 0 else None)
            assert r.next_value == (rs[i + 1].value if i < n - 1 else None)


def test_equidepth_buckets_are_balanced_and_ordered(spark):
    rows = timeseries.events_equidepth_histogram(spark, SF_ORACLE).collect()
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
    for et, bs in per_type.items():
        bs.sort(key=lambda r: r.bucket)
        assert [b.bucket for b in bs] == list(range(1, 11))
        counts = [b.n for b in bs]
        assert max(counts) - min(counts) <= 1, f"{et}: unbalanced {counts}"
        # bucket value ranges are non-overlapping and increasing
        for a, b in zip(bs, bs[1:]):
            assert a.lo <= a.hi <= b.lo <= b.hi


def test_multitouch_credit_conserves_value(spark):
    """Position-based attribution must conserve exactly: weights sum to
    1000 milli per purchase and credit to 1000 * value_milli — the
    property integer division with deterministic remainder placement
    guarantees and float splitting cannot. U-shape: with >= 3 touches the
    first and last get 400 each and every middle weight is within 1 of
    the others."""
    from collections import defaultdict

    from kalytical_spark.operators import events as ev_ops

    rows = ev_ops.events_multitouch_credit(spark, SF_ORACLE).collect()
    assert rows
    by_purchase = defaultdict(list)
    for r in rows:
        by_purchase[r.purchase_id].append(r)
    multi = [g for g in by_purchase.values() if len(g) >= 3]
    assert multi, "need at least one >=3-touch purchase for the U-shape check"
    for grp in by_purchase.values():
        n = grp[0].n_touches
        assert len(grp) == n
        assert sum(r.weight_milli for r in grp) == 1000
        v_milli = grp[0].credit_micro // grp[0].weight_milli  # purchase value
        assert sum(r.credit_micro for r in grp) == 1000 * v_milli
        if n >= 3:
            srt = sorted(grp, key=lambda r: r.touch_rank)
            assert srt[0].weight_milli == 400 and srt[-1].weight_milli == 400
            mids = [r.weight_milli for r in srt[1:-1]]
            assert max(mids) - min(mids) <= 1
            assert sum(mids) == 200
