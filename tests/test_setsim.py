"""Prefix-filtered set-similarity join (setsim.py): exactness vs the
unpruned exhaustive join, non-vacuous pruning, and the shuffle_hash plan
rule for the vocabulary-sized df dim."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators import setsim
from kalytical_spark.operators.dedup import signature_tables
from tests.conftest import SF_ORACLE


def _exhaustive_pairs(spark):
    """Unpruned inverted-index join at the setsim threshold — the ground
    truth the prefix filter must reproduce exactly."""
    sh, _ = signature_tables(spark, SF_ORACLE)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    jac = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .filter(
            1000 * F.col("n_inter")
            >= setsim.SETSIM_T_MILLI * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
    )
    return {
        (r.doc_a, r.doc_b, r.n_inter, r.n_a, r.n_b)
        for r in jac.collect()
    }


def test_prefix_filter_is_exact(spark):
    """The prefix filtering theorem: pruning candidate generation to each
    set's rarest |s| - ceil(t*|s|) + 1 tokens loses NO pair with J >= t."""
    truth = _exhaustive_pairs(spark)
    got = {
        (r.doc_a, r.doc_b, r.n_inter, r.n_a, r.n_b)
        for r in setsim.dedup_setsim_prefix(spark, SF_ORACLE).collect()
    }
    assert truth, "fixture should contain pairs at J >= 0.5 (planted fuzzy copies)"
    assert got == truth


def test_prefix_pruning_is_material(spark):
    """The prefix index must be materially smaller than the full inverted
    index — otherwise the operator is the exhaustive join in disguise."""
    sh, _ = signature_tables(spark, SF_ORACLE)
    full_postings = sh.count()
    # reproduce the operator's prefix selection
    df = sh.groupBy("shingle").agg(F.count("*").alias("sh_df"))
    from pyspark.sql.window import Window as W

    wdoc = W.partitionBy("doc_id").orderBy("sh_df", "shingle")
    ranked = sh.join(df, "shingle").select(
        "doc_id",
        F.row_number().over(wdoc).alias("rn"),
        F.count("*").over(W.partitionBy("doc_id")).alias("n_sh"),
    )
    prefix_postings = ranked.filter(
        F.col("rn")
        <= F.col("n_sh") - F.expr(f"({setsim.SETSIM_T_MILLI} * n_sh + 999) div 1000") + 1
    ).count()
    # at t=0.5 the prefix is ~half of each set
    assert prefix_postings < 0.6 * full_postings, (prefix_postings, full_postings)


def test_setsim_df_join_is_shuffle_hash(spark):
    """The shingle-df dim is vocabulary-sized: must ride a ShuffledHashJoin,
    never a broadcast (repo convention — broadcast of a vocab-sized dim is
    the 100 TB scale-killer fixed in r4)."""
    plan = setsim.dedup_setsim_prefix(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
