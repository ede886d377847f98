"""Corpus-diagnostic invariants: novelty conservation and confusion-
matrix row algebra."""

from __future__ import annotations

from kalytical_spark.operators import corpusdiag
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_novelty_conservation(spark):
    rows = sorted(
        corpusdiag.docs_ngram_novelty(spark, SF_ORACLE).collect(),
        key=lambda r: r.decile,
    )
    assert 1 <= len(rows) <= corpusdiag.NOVELTY_DECILES
    n_docs = t(spark, SF_ORACLE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert r.novelty_milli == (1000 * r.n_novel) // r.n_grams
    # every distinct gram in the corpus is novel in exactly one doc, so the
    # total novel count equals the global distinct-trigram count
    total_novel = sum(r.n_novel for r in rows)
    from pyspark.sql import functions as F

    distinct_grams = (
        t(spark, SF_ORACLE, "documents")
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(text, ' ')) - 3),"
                    " i -> concat_ws(' ', split(text, ' ')[i],"
                    " split(text, ' ')[i+1], split(text, ' ')[i+2]))"
                )
            ).alias("g")
        )
        .distinct()
        .count()
    )
    assert total_novel == distinct_grams
    # decile 0 contains the corpus's first docs: its novelty is the maximum
    assert rows[0].novelty_milli == max(r.novelty_milli for r in rows)


def test_langid_confusion_algebra(spark):
    rows = corpusdiag.text_langid_confusion(spark, SF_ORACLE).collect()
    assert rows
    n_docs = t(spark, SF_ORACLE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, cells in by_lang.items():
        tot = sum(c.n_docs for c in cells)
        for c in cells:
            assert c.share_milli == (1000 * c.n_docs) // tot
        # no duplicate (lang, predicted) cells
        preds = [c.predicted_lang for c in cells]
        assert len(preds) == len(set(preds))


def test_burstiness_bounds(spark):
    rows = corpusdiag.text_burstiness(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= corpusdiag.BURST_TOP_K
    cfs = [(r.cf, r.tok) for r in rows]
    assert cfs == sorted(cfs, key=lambda x: (-x[0], x[1]))
    for r in rows:
        # cf >= df always (a doc contributes at least one occurrence)
        assert r.cf >= r.df > 0
        assert r.burst_milli == (1000 * r.cf) // r.df
        assert r.burst_milli >= 1000


def test_knn_graph_degree_histogram(spark):
    from kalytical_spark.operators import embgraph

    rows = embgraph.emb_knn_graph_stats(spark, SF_ORACLE).collect()
    assert rows
    # degrees live in [0, K]; histogram covers exactly the sample
    assert all(0 <= r.mutual_degree <= embgraph.KNN_K for r in rows)
    assert sum(r.n_nodes for r in rows) == min(
        embgraph.KNN_SAMPLE,
        t(spark, SF_ORACLE, "embeddings").count(),
    )
    degs = [r.mutual_degree for r in rows]
    assert len(degs) == len(set(degs))
    # mutual edges exist at all on a clustered synthetic space
    assert any(r.mutual_degree > 0 and r.n_nodes > 0 for r in rows)
