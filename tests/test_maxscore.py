"""Max-score retrieval: losslessness is oracle-proven (exhaustive twin);
these pin the properties the oracle can't see — the prune must actually
engage, and the split must stay sound under its own invariants."""

from __future__ import annotations

from kalytical_spark.operators.maxscore import (
    MAXSCORE_N_QUERIES,
    MAXSCORE_TOP_DOCS,
    text_maxscore_prune_report,
    text_maxscore_topk,
)
from tests.conftest import SF_SMALL


def test_prune_engages_and_stays_sound(spark):
    rows = {r.qid: r for r in text_maxscore_prune_report(spark, SF_SMALL).collect()}
    assert len(rows) == MAXSCORE_N_QUERIES
    for r in rows.values():
        # the largest-u term is always essential (its prefix sum >= theta)
        assert 1 <= r.n_essential <= r.n_terms
        assert r.cand_docs <= r.matched_docs
        assert r.theta_e6 <= r.u_max_e6
    # the rarest-term query must measurably prune (non-vacuous fixture):
    # at least one query scores a strict subset of its matched docs
    assert any(r.cand_docs < r.matched_docs for r in rows.values())
    # and at least one query drops a whole posting list
    assert any(r.n_essential < r.n_terms for r in rows.values())


def test_topk_shape(spark):
    out = text_maxscore_topk(spark, SF_SMALL).collect()
    assert len(out) == MAXSCORE_N_QUERIES * MAXSCORE_TOP_DOCS
    per_q = {}
    for r in out:
        per_q.setdefault(r.qid, []).append((r.rk, r.score_e6, r.doc_id))
    for ranked in per_q.values():
        ranked.sort()
        scores = [s for _, s, _ in ranked]
        assert scores == sorted(scores, reverse=True)
