"""Semantic tests for deterministic sampling: balanced-sample rate
behavior, exact-k membership stability, split proportions, and the
broadcast plan shape of the stratified filter."""

from __future__ import annotations

from kalytical_spark.operators import sampling
from tests.conftest import SF_ORACLE


def test_balanced_sample_rates(spark):
    rows = sampling.events_balanced_sample(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 < r.sample_n <= r.total_n
        if r.total_n <= sampling._TARGET:
            assert r.sample_n == r.total_n, "small strata must be kept whole"
        else:
            # md5 is uniform: achieved size is TARGET +/- sampling noise
            assert 0.8 * sampling._TARGET <= r.sample_n <= 1.2 * sampling._TARGET


def test_hash_topk_exact_k_and_stable(spark):
    df = sampling.events_hash_topk_sample(spark, SF_ORACLE)
    rows = df.collect()
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
    for et, rs in per_type.items():
        assert sorted(x.rk for x in rs) == list(range(1, sampling._K + 1)), et
    # membership is a pure function of the data: re-running yields the
    # identical set (no rand(), no partition-order dependence)
    again = {(r.event_type, r.event_id) for r in df.collect()}
    assert {(r.event_type, r.event_id) for r in rows} == again


def test_split_proportions_and_totals(spark):
    rows = sampling.events_train_val_test_split(spark, SF_ORACLE).collect()
    by_type: dict[str, dict[str, int]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.split] = r.n
    for et, splits in by_type.items():
        assert set(splits) == {"train", "val", "test"}, et
        total = sum(splits.values())
        frac = splits["train"] / total
        assert 0.75 < frac < 0.85, f"{et}: train fraction {frac}"


def test_balanced_sample_broadcasts_threshold_dim(spark):
    plan = sampling.events_balanced_sample(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, (
        "per-stratum threshold table must broadcast so the sample predicate "
        "runs inside the scan stage"
    )
