"""Semantic invariants for the preprocessing family (operators/preprocess.py).

Value parity with DuckDB is covered by the oracle gate; these tests pin the
properties the oracle can't see: packing conservation laws, planted
contamination recovery, split determinism and balance.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from kalytical_spark.operators import preprocess
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
