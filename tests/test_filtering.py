"""Semantic tests for the classifier gate: both decisions occur, the
logit algebra is reproducible from the surfaced features, scoring is a
shuffle-free pure projection, and language quotas bind."""

from __future__ import annotations

from kalytical_spark.operators import filtering
from tests.conftest import SF_ORACLE


def test_classifier_both_classes_and_algebra(spark):
    rows = filtering.docs_quality_classifier(spark, SF_ORACLE).collect()
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped, "filter must be non-vacuous in both directions"
    for r in rows[:50] + dropped[:50]:
        ttr_u = r.n_distinct * filtering._U // r.n_tokens
        stop_u = r.n_stop * filtering._U // r.n_tokens
        expect = (
            filtering._BIAS
            - filtering._W_TTR * abs(ttr_u - filtering._TTR_CENTER)
            + filtering._W_STOP * stop_u
            + (
                -filtering._SHORT_PENALTY
                if r.n_tokens < filtering._MIN_TOKENS
                else 0
            )
        )
        assert r.logit_u == expect
        assert r.keep == (expect > 0)


def test_classifier_is_shuffle_free_jvm_projection(spark):
    df = filtering.docs_quality_classifier(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "scoring must be a pure scan projection"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "scoring must stay JVM-side"
    )


def test_language_quota_binds(spark):
    rows = filtering.docs_language_quota_sample(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 < r.sample_n <= r.kept_n
        if r.kept_n <= filtering._QUOTA:
            assert r.sample_n == r.kept_n
        else:
            # md5 uniformity: achieved size near the quota
            assert r.sample_n <= 1.5 * filtering._QUOTA
