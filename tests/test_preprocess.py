"""Semantic invariants for the preprocessing family (operators/preprocess.py).

Value parity with DuckDB is covered by the oracle gate; these tests pin the
properties the oracle can't see: packing conservation laws, planted
contamination recovery, split determinism and balance.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from kalytical_spark.operators import preprocess
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_pack_windows_conserve_tokens(spark):
    """Every non-final window holds exactly PACK_WINDOW tokens, and per
    source the filled tokens sum to the shard's total token count."""
    out = preprocess.pack_context_windows(spark, SF_ORACLE).cache()
    last_w = out.groupBy("source").agg(F.max("win").alias("max_w"))
    non_final = out.join(last_w, "source").filter(F.col("win") < F.col("max_w"))
    bad = non_final.filter(F.col("tokens_filled") != preprocess.PACK_WINDOW).count()
    assert bad == 0

    from kalytical_spark.operators.common import t

    totals = (
        t(spark, SF_ORACLE, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("n_tok"))
    )
    packed = out.groupBy("source").agg(F.sum("tokens_filled").alias("filled"))
    mismatch = (
        totals.join(packed, "source").filter(F.col("n_tok") != F.col("filled")).count()
    )
    assert mismatch == 0
    # every document starts in exactly one window
    n_docs = t(spark, SF_ORACLE, "documents").count()
    assert out.agg(F.sum("n_starting")).collect()[0][0] == n_docs
    out.unpersist()


def test_decontam_flags_planted_leaks(spark):
    """The re-keyed copies of every-82nd doc are cross-document leaks: each
    must be flagged and must match its original's benchmark prompt."""
    out = preprocess.decontam_ngram_overlap(spark, SF_ORACLE)
    leaked = {
        r["doc_id"]: r["first_bench_id"]
        for r in out.filter(
            F.col("doc_id") >= preprocess.DECONTAM_PLANT_OFFSET
        ).collect()
    }
    assert leaked, "no leaked copies flagged"
    for copy_id, bench in leaked.items():
        assert bench == copy_id - preprocess.DECONTAM_PLANT_OFFSET  # matched the original eval doc, not itself


def test_split_assignment_balanced_and_complete(spark):
    out = preprocess.split_assign_stats(spark, SF_ORACLE)
    per_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    total = sum(per_split.values())
    assert set(per_split) == {"train", "val", "test"}
    assert total == 500
    assert 0.70 <= per_split["train"] / total <= 0.90


def test_repetition_filters_split_pass_fail(spark):
    out = preprocess.text_repetition_filters(spark, SF_ORACLE).cache()
    n_pass = out.filter("gopher_pass").count()
    n_fail = out.filter("NOT gopher_pass").count()
    assert n_pass > 0 and n_fail > 0  # thresholds actually discriminate
    bounds = out.filter(
        (F.col("top_token_frac") < 0) | (F.col("top_token_frac") > 1)
        | (F.col("dup_2gram_frac") < 0) | (F.col("dup_2gram_frac") > 1)
    ).count()
    assert bounds == 0
    out.unpersist()


def test_longest_run_full_prompt_on_leaks(spark):
    """Every planted re-crawl is a copy of a benchmark SOURCE doc
    (82 = 2 x 41), so the (leak, its own prompt) pair must show a
    contiguous run covering the whole prompt; and no run may exceed the
    doc's hit geometry (runs of w windows are w + NGRAM - 1 tokens)."""
    out = preprocess.decontam_longest_run(spark, SF_ORACLE).collect()
    by_pair = {(r.doc_id, r.bench_id): r for r in out}
    docs = {
        r.doc_id: r.n
        for r in t(spark, SF_ORACLE, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    leaks = [
        d for d, n in docs.items()
        if d % 82 == 0 and n >= preprocess.BENCH_PROMPT_TOKENS
    ]
    assert leaks, "fixture must contain leaked bench sources"
    for d in leaks:
        key = (d + preprocess.DECONTAM_PLANT_OFFSET, d)
        assert key in by_pair, key
        assert by_pair[key].longest_run_toks >= preprocess.BENCH_PROMPT_TOKENS, by_pair[key]
    for r in out:
        assert r.longest_run_toks >= preprocess.NGRAM
        assert r.n_runs >= 1 and r.n_hit_windows >= r.n_runs
