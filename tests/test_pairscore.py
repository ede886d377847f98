"""Pairwise-score invariants: BLEU bounds vs the underlying Jaccard
pairs, threshold-sweep monotonicity."""

from __future__ import annotations

from kalytical_spark.operators import pairscore
from kalytical_spark.operators.dedup import dedup_minhash_lsh
from tests.conftest import SF_ORACLE


def test_bleu_pair_bounds(spark):
    rows = pairscore.text_bleu_near_pairs(spark, SF_ORACLE).collect()
    pairs = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_ORACLE).collect()}
    assert {(r.doc_a, r.doc_b) for r in rows} == pairs
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.p1_micro <= 1_000_000
        assert 0 <= r.p2_micro <= 1_000_000
        # bigram precision can never exceed unigram precision... is false in
        # general, but the geometric mean is always between them
        lo, hi = sorted((r.p1_micro, r.p2_micro))
        assert lo - 1 <= r.bleu2 * 1e6 <= hi + 1
        assert r.len_ratio_milli == (1000 * r.n1_b) // r.n1_a
    # verified near-dups (Jaccard >= 0.7) must show high unigram overlap
    assert sum(r.p1_micro for r in rows) / len(rows) > 500_000


def test_threshold_sweep_monotone(spark):
    rows = sorted(
        pairscore.dedup_threshold_sweep(spark, SF_ORACLE).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == list(pairscore.SWEEP_THRESHOLDS)
    # raising the threshold can only shrink the pair set and touched docs
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_pairs <= lo.n_pairs
        assert hi.docs_touched <= lo.docs_touched
    # the floor threshold equals the full verified pair set
    n_all = dedup_minhash_lsh(spark, SF_ORACLE).count()
    assert rows[0].n_pairs == n_all
    for r in rows:
        assert r.docs_touched <= 2 * r.n_pairs


def test_minhash_calibration_bounds(spark):
    rows = pairscore.dedup_minhash_calibration(spark, SF_ORACLE).collect()
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh(spark, SF_ORACLE).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in rows} == set(pairs)
    for r in rows:
        assert 0 <= r.n_match <= 16
        assert r.est_milli == (1000 * r.n_match) // 16
        # +-1: Python round() is banker's, the engines' ROUND is half-away
        assert abs(r.err_milli - (r.est_milli - round(r.jaccard * 1000))) <= 1
        # banded at 8 bands of 2: a verified pair matched at least one band,
        # so at least 2 minhashes agree
        assert r.n_match >= 2
    # estimator sanity on high-Jaccard pairs: mean estimate not wildly off
    mean_err = sum(r.err_milli for r in rows) / len(rows)
    assert abs(mean_err) < 300
