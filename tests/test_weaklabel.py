"""Weak-supervision invariants: LF matrix set algebra and the vote
distribution's conservation laws."""

from __future__ import annotations

from kalytical_spark.operators import weaklabel
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_lf_report_matrix_algebra(spark):
    rows = {r.lf: r for r in weaklabel.docs_weak_lf_report(spark, SF_ORACLE).collect()}
    assert set(rows) == set(weaklabel.LF_NAMES)
    n_docs = t(spark, SF_ORACLE, "documents").count()
    for r in rows.values():
        assert r.n_fired == r.n_keep + r.n_drop
        # conflict implies overlap implies fired
        assert 0 <= r.n_conflict <= r.n_overlap <= r.n_fired <= n_docs
        assert r.coverage_milli == (1000 * r.n_fired) // n_docs
    # conflicts are symmetric pairs: if anything conflicts, at least two
    # LFs must each report at least one conflicting doc
    conflicted = [r.lf for r in rows.values() if r.n_conflict > 0]
    assert len(conflicted) != 1
    # each LF must genuinely fire on this corpus (thresholds aren't dead)
    assert all(r.n_fired > 0 for r in rows.values())


def test_vote_distribution_conserves_docs(spark):
    rows = {r.vote: r for r in weaklabel.docs_weak_label_votes(spark, SF_ORACLE).collect()}
    n_docs = t(spark, SF_ORACLE, "documents").count()
    assert sum(r.n_docs for r in rows.values()) == n_docs
    assert set(rows) <= {-1, 0, 1}
    # ties can never be unanimous
    if -1 in rows:
        assert rows[-1].n_unanimous == 0
    for r in rows.values():
        assert 0 <= r.n_unanimous <= r.n_docs
    # majority voting must decide SOMETHING on this corpus
    assert any(v in rows and rows[v].n_docs > 0 for v in (0, 1))
