"""Semantic tests for embedding aggregation: the gram-identity coherence
equals the brute-force O(N^2) pair mean, centroids cover labels x dim,
and the coherence plan contains no pair self-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators import embedding_stats as es
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_centroids_cover_labels_x_dim(spark):
    rows = es.emb_label_centroids(spark, SF_ORACLE).collect()
    labels = {r.label for r in rows}
    dims = {r.pos for r in rows}
    assert dims == set(range(64))
    assert len(rows) == len(labels) * 64
    for r in rows:
        assert abs(r.centroid) < 1.0
        assert r.centroid == r.sum_q / (r.n * es._U)


def test_coherence_matches_bruteforce_pairs(spark):
    """The whole point of the gram identity: same number as the O(N^2)
    pair join, computed linearly. Verify exactly on the quantized ints."""
    got = {
        r.label: r.pair_dot_sum
        for r in es.emb_label_coherence(spark, SF_ORACLE).collect()
    }
    assert got
    q = es._quantized(spark, SF_ORACLE)
    a = q.select("label", F.col("vec_id").alias("va"), "pos", F.col("q").alias("qa"))
    b = q.select("label", F.col("vec_id").alias("vb"), "pos", F.col("q").alias("qb"))
    brute = (
        a.join(b, ["label", "pos"])
        .filter(F.col("va") < F.col("vb"))
        .groupBy("label")
        .agg(F.sum(F.col("qa") * F.col("qb")).cast("bigint").alias("pair_dot_sum"))
    )
    expect = {r.label: r.pair_dot_sum for r in brute.collect()}
    assert got == expect


def test_coherence_plan_has_no_pair_selfjoin(spark):
    df = es.emb_label_coherence(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only join is the tiny per-label rollup merge, never vec x vec:
    # no join condition on vec_id columns appears in the plan
    joins = [seg for seg in plan.splitlines() if "Join" in seg]
    assert all("vec_id" not in seg for seg in joins), joins
