"""Dump `.explain("formatted")` output for named registry queries to
plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (the optimization-round
evidence files).

Usage: python tools/dump_plan.py <before|after> name1 [name2 ...]
       python tools/dump_plan.py <before|after> memo:<memo_name>
       python tools/dump_plan.py <before|after> iter:<loop_query>

Runs against $SPARK_GRAFT_SF_DIR (default sf0.1) with the same session
factory the bench uses, memo-warm (shared builds pre-paid) so the dumped
plan is the steady-state shape the bench times.

``iter:`` (VERDICT r11 item 8): loop queries checkpoint per round, so
their final frame explains as a 9-line pinned leaf — useless as plan
evidence. The iter: builders reconstruct ONE steady-state iteration
(round inputs pinned exactly as the loop pins them, the round's own
trailing checkpoint omitted) and dump THAT plan: the per-iteration
shuffle/join shape is the unit the optimization claims are about.
Supported: iter:dag_pagerank, iter:graph_kcore_membership,
iter:graph_label_propagation, iter:cc_labels.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kalytical_spark import catalog  # noqa: E402
from kalytical_spark.registry import all_queries  # noqa: E402
from kalytical_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"),
)


def _iter_pagerank(spark):
    from pyspark.sql import functions as F

    from kalytical_spark.operators import graph
    from kalytical_spark.operators.common import t

    edges = t(spark, SF_DIR, "dag_edges").select(
        F.col("upstream_uuid").alias("src"), F.col("pipeline_uuid").alias("dst")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("deg"))
    e_deg = F.broadcast(
        edges.join(outdeg, "src").select("src", "dst", "deg").localCheckpoint()
    )
    # round input pinned exactly as the loop pins each round's output
    ranks = nodes.withColumn(
        "rank_u", F.lit(graph._PR_U).cast("bigint")
    ).localCheckpoint()
    base = (graph._PR_D_DEN - graph._PR_D_NUM) * graph._PR_U
    contrib = (
        ranks.join(e_deg, ranks["node"] == F.col("src"))
        .select(F.col("dst").alias("node"), F.expr("rank_u div deg").alias("c"))
        .groupBy("node")
        .agg(F.sum("c").alias("s"))
    )
    return nodes.join(F.broadcast(contrib), "node", "left").select(
        "node",
        F.expr(
            f"CAST({base} div {graph._PR_D_DEN} + "
            f"({graph._PR_D_NUM} * coalesce(s, 0L)) div {graph._PR_D_DEN} AS BIGINT)"
        ).alias("rank_u"),
    )


def _iter_kcore(spark):
    from pyspark.sql import functions as F

    from kalytical_spark.operators import graph
    from kalytical_spark.operators.sketches import copurchase_edges

    edges = copurchase_edges(spark, SF_DIR)
    deg = (
        edges.select(F.col("u").alias("p"))
        .unionAll(edges.select(F.col("v").alias("p")))
        .groupBy("p")
        .agg(F.count("*").alias("d"))
    )
    keep = deg.filter(F.col("d") >= graph._KCORE_K).select("p")
    return edges.join(keep.withColumnRenamed("p", "u"), "u", "leftsemi").join(
        keep.withColumnRenamed("p", "v"), "v", "leftsemi"
    )


def _iter_lpa(spark):
    from pyspark.sql import functions as F

    from kalytical_spark.operators import graph
    from kalytical_spark.operators.sketches import copurchase_edges

    und = copurchase_edges(spark, SF_DIR)
    edges = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    labels = (
        edges.select("node")
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    nbr_lbls = edges.join(labels.withColumnRenamed("node", "nbr"), "nbr").select(
        "node", "lbl"
    )
    return (
        nbr_lbls.groupBy("node", "lbl")
        .agg(F.count("*").alias("cnt"))
        .groupBy("node")
        .agg(F.expr(f"max_by(lbl, cnt * {graph._LPA_KEYBASE} - lbl)").alias("lbl"))
    )


def _iter_cc(spark):
    from pyspark.sql import functions as F

    from kalytical_spark.operators import components

    edges = components._dup_edges(spark, SF_DIR).cache()
    edges.count()  # materialized by round 0 in the real loop
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    nbr = (
        edges.join(labels, edges["dst"] == labels["doc_id"])
        .groupBy("src")
        .agg(F.min("label").alias("nbr_label"))
    )
    propagated = labels.join(nbr, labels["doc_id"] == nbr["src"], "left").select(
        "doc_id",
        F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
    )
    parent = propagated.select(
        F.col("doc_id").alias("p_id"), F.col("label").alias("p_label")
    )
    return propagated.join(parent, propagated["label"] == parent["p_id"], "left").select(
        "doc_id", F.coalesce("p_label", "label").alias("label")
    )


ITER_BUILDERS = {
    "iter:dag_pagerank": _iter_pagerank,
    "iter:graph_kcore_membership": _iter_kcore,
    "iter:graph_label_propagation": _iter_lpa,
    "iter:cc_labels": _iter_cc,
}


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("kalytical_plans")
    catalog.register(spark, SF_DIR)
    queries = all_queries()

    import bench

    memos = dict(bench._memo_builders())
    # pre-pay shared memos so the dumped plan is the memo-warm shape
    for memo_name, build in memos.items():
        if any(n == memo_name for n in names):
            continue  # the target memo itself must stay cold to show its build plan
        out = build(spark, SF_DIR)
        if out is not None:
            out.count()

    for name in names:
        if name.startswith("iter:"):
            df = ITER_BUILDERS[name](spark)
        elif name.startswith("memo:"):
            df = memos[name](spark, SF_DIR)
        else:
            fn, _oracle = queries[name]
            df = fn(spark, SF_DIR)
        if df is None:
            print(f"# {name}: eager build, no frame to explain", file=sys.stderr)
            continue
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        safe = name.replace(":", "_")
        path = os.path.join(OUT_DIR, f"{safe}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {SF_DIR} ({tag})\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
