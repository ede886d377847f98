"""Held-out LM family invariants: Stupid Backoff's split/score algebra,
Good-Turing's frequency-of-frequencies identities, Zipf fit sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kalytical_spark.operators import lm
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_stupid_backoff_invariants(spark):
    rows = lm.text_stupid_backoff(spark, SF_ORACLE).collect()
    assert rows
    docs = t(spark, SF_ORACLE, "documents")
    n_docs = docs.count()
    # held-out split: only the score half appears, and it is a real split
    assert 0 < len(rows) < n_docs
    for r in rows:
        assert 0 <= r.n_backoff <= r.n_bigrams
        # every per-position score is in [0, 1e6], so the doc total is too
        assert 0 <= r.score_micro <= r.n_bigrams * 1_000_000
        assert abs(r.avg_score - round(r.score_micro / 1e6 / r.n_bigrams, 4)) < 1e-12
    # the held-out design must make the backoff branch real somewhere
    assert sum(r.n_backoff for r in rows) > 0
    # ... but seen bigrams must dominate (the model trains on half the corpus)
    assert sum(r.n_backoff for r in rows) < sum(r.n_bigrams for r in rows)


def test_stupid_backoff_score_halves_disjoint(spark):
    scored_ids = {
        r.doc_id for r in lm.text_stupid_backoff(spark, SF_ORACLE).collect()
    }
    buckets = {
        r.doc_id: r.b
        for r in t(spark, SF_ORACLE, "documents")
        .select(
            "doc_id",
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
            .cast("bigint")
            .alias("b"),
        )
        .collect()
    }
    for doc_id in scored_ids:
        assert buckets[doc_id] >= lm.SB_TRAIN_LT


def test_good_turing_identities(spark):
    rows = {r.r: r for r in lm.text_good_turing(spark, SF_ORACLE).collect()}
    assert rows, "trigram type space must have a low-count head"
    for r, row in rows.items():
        assert 1 <= r <= lm.GT_MAX_R
        assert row.n_r > 0
        # adjacent rows agree on the shared N_{r+1}
        if r + 1 in rows:
            assert row.n_r_next == rows[r + 1].n_r
        assert row.rstar_micro == (1_000_000 * (r + 1) * row.n_r_next) // row.n_r
    # Good-Turing on a natural-ish corpus discounts singletons: r*=1 < 1
    if 1 in rows and 2 in rows:
        assert rows[1].rstar_micro < 2_000_000


def test_zipf_fit_shape(spark):
    row = lm.text_zipf_ols(spark, SF_ORACLE).collect()
    assert len(row) == 1
    r = row[0]
    assert 2 <= r.k <= lm.ZIPF_HEAD_K
    # frequency is non-increasing in rank, so the fitted slope is <= 0
    assert r.slope_micro <= 0
    assert r.slope == round(r.slope_micro / 1e6, 4)
    # intercept_milli approximates ln(c_max) in milli-nats: same sign, sane scale
    assert r.intercept_milli > 0
    assert r.intercept_milli < math.log(10**15) * 1000


def test_heaps_fit_shape(spark):
    row = lm.text_heaps_law(spark, SF_ORACLE).collect()
    assert len(row) == 1
    r = row[0]
    assert 2 <= r.k <= lm.HEAPS_BUCKETS
    # vocabulary never shrinks and never outgrows tokens: 0 <= beta <= 1
    # (quantization can push a hair past the ends)
    assert -1000 <= r.beta_micro <= 1_001_000
    # intercept is ln K in milli-nats; V(n) <= n forces lnK <= (1-beta)lnN,
    # and on any non-empty corpus the fitted line must pass sanity
    assert r.logk_milli < 30_000


def test_perplexity_filter_invariants(spark):
    rows = lm.text_perplexity_filter(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # Laplace NLL is non-negative (every ratio >= 1: c12 <= c1, c2 <= N)
        assert 0 <= r.avg_nll_micro
        assert r.h_micro // r.n_bigrams == r.avg_nll_micro
        assert r.keep == (r.avg_nll_micro < lm.PPL_BAR_MICRO)
    # the median-placed bar must genuinely split the corpus
    keeps = [r.keep for r in rows]
    assert any(keeps) and not all(keeps)


def test_perplexity_source_report_accounts_for_every_scored_doc(spark):
    per_doc = lm.text_perplexity_filter(spark, SF_ORACLE).collect()
    report = {r.source: r for r in
              lm.text_perplexity_source_report(spark, SF_ORACLE).collect()}
    assert sum(r.n_docs for r in report.values()) == len(per_doc)
    for r in report.values():
        assert 0 <= r.n_keep <= r.n_docs
        assert r.keep_rate_milli == (1000 * r.n_keep) // r.n_docs


def test_source_influence_canary_and_structure(spark):
    rows = lm.docs_source_influence(spark, SF_ORACLE).collect()
    assert rows
    # the full-model NLL is recomputed inside the exploded per-source
    # frame: identical across sources or the join fanned out wrong
    fulls = {r.nll_full_micro for r in rows}
    assert len(fulls) == 1
    ns = {r.n_bigrams for r in rows}
    assert len(ns) == 1
    per_doc = lm.text_perplexity_filter(spark, SF_ORACLE).collect()
    # and it equals the perplexity filter's corpus total (same expression)
    assert fulls.pop() == sum(r.h_micro for r in per_doc)
    assert ns.pop() == sum(r.n_bigrams for r in per_doc)
    for r in rows:
        assert r.influence_micro == r.nll_loo_micro - r.nll_full_micro
