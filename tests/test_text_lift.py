"""Collocation-lift invariants: pair counts bounded by marginals, lift
algebra reproducible, df floor respected, ranking totally ordered."""

from __future__ import annotations

from kalytical_spark.operators import text
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_token_lift_invariants(spark):
    rows = text.text_token_lift_topk(spark, SF_ORACLE).collect()
    assert rows
    n_docs = t(spark, SF_ORACLE, "documents").count()
    for r in rows:
        assert r.tok_a < r.tok_b
        assert r.df_a >= text._LIFT_MIN_DF and r.df_b >= text._LIFT_MIN_DF
        assert 0 < r.n_ab <= min(r.df_a, r.df_b)
        assert r.lift == r.n_ab * n_docs / (r.df_a * r.df_b)
    lifts = [(r.lift, r.tok_a, r.tok_b) for r in rows]
    assert lifts == sorted(lifts, key=lambda x: (-x[0], x[1], x[2]))
    # top collocations should genuinely co-occur more than independence
    assert rows[0].lift > 1.0
