"""Late-interaction retrieval: the token-level IVF prefilter (PLAID shape)
must re-rank with the EXACT MaxSim scorer (scores on surviving pairs are
bit-identical to the brute-force baseline), hold its recall floor, and fit
deterministically."""

from __future__ import annotations

from kalytical_spark.operators.colbert import (
    _TOK_FIT_CACHE,
    MAXSIM_NTOK,
    N_PROBE_TOK,
    fit_token_cells,
    sim_maxsim_ivf_pruned,
    sim_maxsim_pruned_recall_report,
    sim_maxsim_topk,
)
from kalytical_spark.operators.similarity import TOP_K
from tests.conftest import SF_SMALL


def test_recall_floor(spark):
    row = sim_maxsim_pruned_recall_report(spark, SF_SMALL).collect()[0]
    assert row.recall_ok
    assert row.k_total == row.n_queries * TOP_K


def test_pruned_scores_are_exact(spark):
    """The prefilter only prunes — any (query, doc) pair surviving into the
    pruned top-k must carry the same integer-snapped MaxSim score the
    brute-force baseline computed for it."""
    exact = {
        (r.query_id, r.vec_id): r.score_e4
        for r in sim_maxsim_topk(spark, SF_SMALL).collect()
    }
    for r in sim_maxsim_ivf_pruned(spark, SF_SMALL).collect():
        if (r.query_id, r.vec_id) in exact:
            assert exact[(r.query_id, r.vec_id)] == r.score_e4


def test_token_fit_deterministic(spark):
    import numpy as np

    postings1, C1 = fit_token_cells(spark, SF_SMALL)
    p1 = sorted((r.vec_id, r.cell) for r in postings1.collect())
    _TOK_FIT_CACHE.clear()
    postings2, C2 = fit_token_cells(spark, SF_SMALL)
    p2 = sorted((r.vec_id, r.cell) for r in postings2.collect())
    assert np.array_equal(C1, C2)
    assert p1 == p2
    # every doc posts at most NTOK cells (one per token, distinct)
    from collections import Counter

    per_doc = Counter(v for v, _ in p1)
    assert max(per_doc.values()) <= MAXSIM_NTOK
    assert N_PROBE_TOK * MAXSIM_NTOK < C1.shape[0] * MAXSIM_NTOK
