"""Invariant tests for integer PageRank over the dependency DAG."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators import graph
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE

_BASE = (graph._PR_D_DEN - graph._PR_D_NUM) * graph._PR_U // graph._PR_D_DEN


def test_pagerank_invariants(spark):
    rows = graph.dag_pagerank(spark, SF_ORACLE).collect()
    assert rows
    ranks = {r.node: r.rank_u for r in rows}
    edges = (
        t(spark, SF_ORACLE, "dag_edges")
        .select(
            F.col("upstream_uuid").alias("src"),
            F.col("pipeline_uuid").alias("dst"),
        )
        .collect()
    )
    nodes = {e.src for e in edges} | {e.dst for e in edges}
    assert set(ranks) == nodes, "every edge endpoint must be ranked"
    with_in = {e.dst for e in edges}
    for node, rank_u in ranks.items():
        assert rank_u >= _BASE, (node, rank_u)
        if node not in with_in:
            # source nodes receive no contributions: rank is exactly the
            # damped base after the first iteration
            assert rank_u == _BASE, (node, rank_u)
    # contribution conservation: total rank never exceeds the initial mass
    # (the dangling leak only removes mass, the base term adds less than
    # the damping removes)
    assert sum(ranks.values()) <= len(nodes) * graph._PR_U
    # ranking is discriminative: not all equal
    assert len(set(ranks.values())) > 1


def test_link_prediction_invariants(spark):
    from kalytical_spark.operators import graph
    from kalytical_spark.operators.sketches import _copurchase_edges
    from tests.conftest import SF_ORACLE

    rows = graph.graph_link_prediction(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= 20
    edges = {(r.u, r.v) for r in _copurchase_edges(spark, SF_ORACLE).collect()}
    scores = [(r.jaccard_micro, r.p, r.q) for r in rows]
    assert scores == sorted(scores, key=lambda x: (-x[0], x[1], x[2]))
    for r in rows:
        assert r.p < r.q
        # predicted links must NOT already be edges
        assert (r.p, r.q) not in edges
        # Jaccard bounds: cn <= min(deg) and the micro ratio is consistent
        assert 0 < r.cn <= min(r.deg_p, r.deg_q)
        assert r.jaccard_micro == (1_000_000 * r.cn) // (r.deg_p + r.deg_q - r.cn)
        # each Adamic-Adar wedge term is at most 1e6/ln(2)
        assert 0 < r.aa_micro <= r.cn * 1_442_696
