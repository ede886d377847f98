"""Drift/conformal invariants: PSI non-negativity and flag algebra,
conformal order-statistic index and coverage arithmetic."""

from __future__ import annotations

from kalytical_spark.operators import drift
from tests.conftest import SF_ORACLE


def test_psi_invariants(spark):
    rows = drift.events_psi_drift(spark, SF_ORACLE).collect()
    assert rows
    days = [r.day for r in rows]
    assert len(set(days)) == len(days)
    for r in rows:
        assert r.n_day >= 0
        assert r.t_types >= 1
        # PSI is a sum of (p-q)ln(p/q) terms, each >= 0; quantization can
        # only shave fractional micro-nats per cell
        assert r.psi_micro >= -r.t_types
        assert r.drift_flag == (r.psi_micro > drift.PSI_FLAG_MICRO)
    # the synthetic mix is near-stationary: most days must NOT flag
    flagged = sum(1 for r in rows if r.drift_flag)
    assert flagged < len(rows) / 2


def test_conformal_interval_invariants(spark):
    rows = drift.events_conformal_interval(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # split halves differ by at most one day
        assert abs(r.n_cal - r.n_test) <= 1
        # the split-conformal index: ceil(0.9 * (n+1)), clamped to n
        expected_k = min(-(-9 * (r.n_cal + 1) // 10), r.n_cal)
        assert r.k_conf == expected_k
        assert 0 <= r.n_covered <= r.n_test
        assert r.coverage_milli == (1000 * r.n_covered) // r.n_test
        assert r.halfwidth >= 0.0
    # the 90% guarantee should roughly hold on stationary synthetic data:
    # aggregate coverage across types well above half
    tot_cov = sum(r.n_covered for r in rows)
    tot_test = sum(r.n_test for r in rows)
    assert tot_cov * 10 >= tot_test * 6
