"""Exact-substring span dedup (spans.py): planted-twin span geometry,
maximal-merge invariants, rate accounting, and the shuffle_hash plan rule."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from kalytical_spark.operators import spans
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_planted_twin_spans(spark):
    """A middle-token-mutated twin shares exactly the left half and the
    right half with its original — both must surface as maximal spans
    (when long enough), and no span may cross the mutated position."""
    rows = spans.dedup_substring_spans(spark, SF_ORACLE).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    docs = {
        r.doc_id: r.n
        for r in t(spark, SF_ORACLE, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    planted = [
        d for d, n in docs.items()
        if d % spans.SPAN_PLANT_MOD == 0 and n >= spans._MIN_PLANT_TOKS
    ]
    assert planted, "fixture must contain planted twins"
    checked = 0
    for d in planted:
        n = docs[d]
        m = n // 2  # mutated position in the twin
        twin = d + spans.SPAN_PLANT_OFFSET
        twin_spans = {(r.span_start, r.span_end) for r in by_doc.get(twin, [])}
        want = set()
        if m - 1 >= spans.SPAN_L:
            want.add((1, m - 1))
        if n - m >= spans.SPAN_L:
            want.add((m + 1, n))
        # the original may have extra corpus-collision spans; the twin's
        # halves are duplicated by construction, and the mutated token
        # can never sit inside a duplicated span of the twin
        assert want <= twin_spans, (d, n, m, want, twin_spans)
        for s, e in twin_spans:
            assert not (s <= m <= e), (twin, m, s, e)
        checked += 1
    assert checked >= 1


def test_spans_are_maximal_and_disjoint(spark):
    """Gaps-and-islands invariant: within a doc, spans are disjoint and
    separated by more than zero tokens (adjacent spans would have merged),
    and every span is at least L tokens long."""
    rows = spans.dedup_substring_spans(spark, SF_ORACLE).collect()
    by_doc = defaultdict(list)
    for r in rows:
        assert r.span_ntoks >= spans.SPAN_L
        assert r.span_ntoks == r.span_end - r.span_start + 1
        assert r.n_windows == r.span_ntoks - spans.SPAN_L + 1
        by_doc[r.doc_id].append((r.span_start, r.span_end))
    for doc, ss in by_doc.items():
        ss.sort()
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert s2 > e1 + 1, (doc, (s1, e1), (s2, e2))


def test_rate_accounting(spark):
    """Per-source dup tokens must equal the sum of span lengths for that
    source's docs, and never exceed total tokens."""
    span_rows = spans.dedup_substring_spans(spark, SF_ORACLE).collect()
    corpus = spans._corpus(spark, SF_ORACLE).select(
        "doc_id", "source", F.size("ts").alias("n")
    ).collect()
    src_of = {r.doc_id: r.source for r in corpus}
    want = defaultdict(int)
    for r in span_rows:
        want[src_of[r.doc_id]] += r.span_ntoks
    for r in spans.dedup_substring_rate(spark, SF_ORACLE).collect():
        assert r.dup_toks == want.get(r.source, 0), r
        assert 0 <= r.dup_toks <= r.total_toks
        assert r.dup_rate_milli == (1000 * r.dup_toks) // r.total_toks


def test_excise_consistency(spark):
    """Excise output must agree with the span table: dup_toks = sum of
    span lengths per doc, and an untouched doc's clean_fp is the md5 of
    its original text."""
    import hashlib

    span_rows = spans.dedup_substring_spans(spark, SF_ORACLE).collect()
    dup_by_doc = defaultdict(int)
    for r in span_rows:
        dup_by_doc[r.doc_id] += r.span_ntoks
    texts = {
        r.doc_id: r.text
        for r in t(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    }
    rows = spans.dedup_substring_excise(spark, SF_ORACLE).collect()
    seen_untouched = 0
    for r in rows:
        assert r.dup_toks == dup_by_doc.get(r.doc_id, 0), r
        assert r.clean_n_toks == r.n_toks - r.dup_toks
        if r.dup_toks == 0 and r.doc_id in texts:
            want = hashlib.md5(texts[r.doc_id].encode()).hexdigest()
            assert r.clean_fp == want, r
            seen_untouched += 1
    assert seen_untouched >= 1
    # corpus rows (docs + plants) are all present
    n_corpus = spans._corpus(spark, SF_ORACLE).count()
    assert len(rows) == n_corpus


def test_spans_dup_join_is_shuffle_hash(spark):
    """The duplicated-gram dim is corpus-vocabulary-sized: must ride a
    ShuffledHashJoin, never a broadcast (repo convention)."""
    plan = (
        spans.dedup_substring_spans(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan, plan
