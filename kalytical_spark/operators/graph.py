"""Graph operators over the dependency DAG: bounded multi-hop reachability
(the transitive form of the reference's one-hop downstream lookup,
data_provider.py:36-37) and impact analysis.

Implementation: iterative frontier expansion — k self-joins of the edge
list, deduped per level. The edge list is O(pipelines) and broadcast, so
each hop is a broadcast join with no shuffle of the accumulated frontier;
depth is bounded because the synthetic DAG (+1 mod n edges) contains cycles,
as real pipeline graphs may transiently. The oracle is a DuckDB recursive
CTE with the same depth bound — two very different execution strategies,
one result.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import eager_cache, t

MAX_HOPS = 3


def dag_transitive_downstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pipelines reachable within MAX_HOPS downstream hops of each root
    ('downstream of X, transitively') with the minimal hop distance."""
    edges = t(spark, sf_dir, "dag_edges").select(
        F.col("upstream_uuid").alias("src"), F.col("pipeline_uuid").alias("dst")
    )
    frontier = edges.withColumn("hops", F.lit(1))
    levels = [frontier]
    for _ in range(MAX_HOPS - 1):
        frontier = (
            frontier.alias("f")
            .join(F.broadcast(edges.alias("e")), F.col("f.dst") == F.col("e.src"))
            .select(
                F.col("f.src").alias("src"),
                F.col("e.dst").alias("dst"),
                (F.col("f.hops") + 1).alias("hops"),
            )
            # dedupe per level: without it the frontier enumerates every
            # distinct PATH (outdeg^hops rows per root) instead of every
            # reachable node — exponential in the hop bound
            .groupBy("src", "dst")
            .agg(F.min("hops").alias("hops"))
        )
        levels.append(frontier)
    all_paths = reduce(DataFrame.unionByName, levels)
    return (
        all_paths.filter(F.col("src") != F.col("dst"))  # mask cycle self-returns
        .groupBy(F.col("src").alias("pipeline_uuid"), F.col("dst").alias("downstream_uuid"))
        .agg(F.min("hops").cast("int").alias("min_hops"))
    )


ORACLE_TRANSITIVE = f"""
WITH RECURSIVE reach AS (
  SELECT upstream_uuid AS src, pipeline_uuid AS dst, 1 AS hops
  FROM dag_edges
  UNION ALL
  SELECT r.src, e.pipeline_uuid AS dst, r.hops + 1
  FROM reach r JOIN dag_edges e ON r.dst = e.upstream_uuid
  WHERE r.hops < {MAX_HOPS}
)
SELECT src AS pipeline_uuid, dst AS downstream_uuid,
       CAST(MIN(hops) AS INT) AS min_hops
FROM reach
WHERE src <> dst
GROUP BY 1, 2
"""


def dag_impact_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast radius per pipeline: how many downstreams within MAX_HOPS, and
    how many of those have retries configured (the 'what breaks if X fails'
    operational query)."""
    reach = dag_transitive_downstream(spark, sf_dir)
    defs = t(spark, sf_dir, "pipeline_defs").select(
        F.col("pipeline_uuid").alias("downstream_uuid"),
        (F.col("retry_max") > 0).alias("has_retries"),
    )
    return (
        reach.join(F.broadcast(defs), "downstream_uuid")
        .groupBy("pipeline_uuid")
        .agg(
            F.count("*").alias("n_downstream"),
            F.sum(F.col("has_retries").cast("int")).alias("n_with_retries"),
            F.min("min_hops").cast("int").alias("nearest_hop"),
            F.max("min_hops").cast("int").alias("farthest_hop"),
        )
    )


ORACLE_IMPACT = f"""
WITH RECURSIVE reach AS (
  SELECT upstream_uuid AS src, pipeline_uuid AS dst, 1 AS hops
  FROM dag_edges
  UNION ALL
  SELECT r.src, e.pipeline_uuid AS dst, r.hops + 1
  FROM reach r JOIN dag_edges e ON r.dst = e.upstream_uuid
  WHERE r.hops < {MAX_HOPS}
), dedup AS (
  SELECT src, dst, MIN(hops) AS min_hops FROM reach WHERE src <> dst GROUP BY 1, 2
)
SELECT d.src AS pipeline_uuid,
       CAST(COUNT(*) AS BIGINT) AS n_downstream,
       CAST(SUM(CASE WHEN p.retry_max > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_retries,
       CAST(MIN(d.min_hops) AS INT) AS nearest_hop,
       CAST(MAX(d.min_hops) AS INT) AS farthest_hop
FROM dedup d JOIN pipeline_defs p ON d.dst = p.pipeline_uuid
GROUP BY 1
"""


CP_HOPS = 3
DEFAULT_WEIGHT_MS = 60_000


def _node_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pipeline weight = MAX observed wall-clock of a completed exec
    (running -> success/failure, integer ms — exact in both engines);
    pipelines with no completed exec get DEFAULT_WEIGHT_MS. O(pipelines)
    rows — broadcast everywhere it's used."""
    ev = t(spark, sf_dir, "lifecycle_events")
    # ONE scan + ONE shuffle for both endpoints (r12, guide §2.4): the
    # old starts/ends frames each scanned the lifecycle log and shuffled
    # by (pipeline, exec) separately, then joined — min(running) and
    # max(success|failure) are conditional aggregates over the same
    # grouping, and the inner join's both-present requirement is the
    # NOT NULL filter on both.
    dur = (
        ev.filter(F.col("event_subtype").isin("running", "success", "failure"))
        .groupBy("pipeline_uuid", "exec_uuid")
        .agg(
            F.min(
                F.when(F.col("event_subtype") == "running", F.col("event_time"))
            ).alias("t0"),
            F.max(
                F.when(
                    F.col("event_subtype").isin("success", "failure"),
                    F.col("event_time"),
                )
            ).alias("t1"),
        )
        .filter(F.col("t0").isNotNull() & F.col("t1").isNotNull())
        .select(
            "pipeline_uuid",
            (F.unix_millis("t1") - F.unix_millis("t0")).alias("dur_ms"),
        )
    )
    per = dur.groupBy("pipeline_uuid").agg(F.max("dur_ms").alias("w"))
    defs = t(spark, sf_dir, "pipeline_defs").select("pipeline_uuid")
    return defs.join(per, "pipeline_uuid", "left").select(
        "pipeline_uuid", F.coalesce("w", F.lit(DEFAULT_WEIGHT_MS)).cast("bigint").alias("w")
    )


def dag_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical path (bounded weighted longest path): for each pipeline, the
    maximum total duration of any <=CP_HOPS-edge dependency path ending at
    it — 'how late can this pipeline start finishing'. Iterative DP: level
    k+1 = level k joined one hop downstream, accumulating the destination's
    weight; both the edge list and the weight table are O(pipelines) and
    broadcast, so the DP never shuffles the path frontier. All arithmetic
    is integer (ms), so Spark and the DuckDB recursive-CTE oracle agree
    bit-for-bit. Cycles in the synthetic DAG are handled by the hop bound,
    exactly as in dag_transitive_downstream."""
    # the weight table is O(pipelines) and feeds every DP level — cache it so
    # the lifecycle scan happens once, not once per level (eager: multiple
    # consumers in one action, see common.eager_cache)
    wts = eager_cache(_node_weights(spark, sf_dir))
    edges = t(spark, sf_dir, "dag_edges").select(
        F.col("upstream_uuid").alias("src"), F.col("pipeline_uuid").alias("dst")
    )
    frontier = wts.select(
        F.col("pipeline_uuid").alias("node"),
        F.col("w").alias("cost"),
        F.lit(0).cast("int").alias("hops"),
    )
    levels = [frontier]
    for k in range(1, CP_HOPS + 1):
        frontier = (
            frontier.alias("f")
            .join(F.broadcast(edges.alias("e")), F.col("f.node") == F.col("e.src"))
            .join(
                F.broadcast(wts.alias("wt")),
                F.col("e.dst") == F.col("wt.pipeline_uuid"),
            )
            .select(
                F.col("e.dst").alias("node"),
                (F.col("f.cost") + F.col("wt.w")).alias("cost"),
                F.lit(k).cast("int").alias("hops"),
            )
        )
        levels.append(frontier)
    # max + argmax in ONE pass (r12, guide §2.4): the old shape cached the
    # DP result and self-joined it against its own per-node max (cache
    # build job + count + groupBy + join + re-aggregate); a per-node max
    # WINDOW annotates each path with its node's best cost, the argmax is
    # a filter, and the final rollup reuses the window's node partitioning
    # — one consumer, so the DP union needs no cache at all (every level
    # is broadcast-join-only over the cached wts: recompute-free).
    paths = reduce(DataFrame.unionByName, levels)
    from pyspark.sql import Window as W

    wn = W.partitionBy("node")
    return (
        paths.withColumn("mx", F.max("cost").over(wn))
        .filter(F.col("cost") == F.col("mx"))
        .groupBy(
            F.col("node").alias("pipeline_uuid"),
            F.col("mx").alias("critical_cost"),
        )
        .agg(
            F.min("hops").cast("int").alias("critical_hops"),
            F.count("*").alias("n_critical_paths"),
        )
    )


ORACLE_CRITICAL_PATH = f"""
WITH RECURSIVE starts0 AS (
  SELECT pipeline_uuid, exec_uuid, MIN(event_time) AS t0
  FROM lifecycle_events WHERE event_subtype = 'running' GROUP BY 1, 2
), ends0 AS (
  SELECT pipeline_uuid, exec_uuid, MAX(event_time) AS t1
  FROM lifecycle_events WHERE event_subtype IN ('success', 'failure') GROUP BY 1, 2
), wts AS (
  SELECT d.pipeline_uuid,
         CAST(COALESCE(MAX(epoch_ms(e.t1) - epoch_ms(s.t0)), {DEFAULT_WEIGHT_MS}) AS BIGINT) AS w
  FROM pipeline_defs d
  LEFT JOIN (starts0 s JOIN ends0 e USING (pipeline_uuid, exec_uuid))
         ON d.pipeline_uuid = s.pipeline_uuid
  GROUP BY 1
), paths AS (
  SELECT pipeline_uuid AS node, w AS cost, 0 AS hops FROM wts
  UNION ALL
  SELECT e.pipeline_uuid, p.cost + w.w, p.hops + 1
  FROM paths p
  JOIN dag_edges e ON p.node = e.upstream_uuid
  JOIN wts w ON e.pipeline_uuid = w.pipeline_uuid
  WHERE p.hops < {CP_HOPS}
), best AS (
  SELECT node, MAX(cost) AS critical_cost FROM paths GROUP BY 1
)
SELECT b.node AS pipeline_uuid, b.critical_cost,
       CAST(MIN(p.hops) AS INT) AS critical_hops,
       CAST(COUNT(*) AS BIGINT) AS n_critical_paths
FROM best b JOIN paths p ON p.node = b.node AND p.cost = b.critical_cost
GROUP BY 1, 2
"""


# Integer PageRank: all arithmetic in scaled integers (rank unit = _PR_U),
# damping 85/100 applied as multiply-then-floor-divide, per-edge
# contribution = rank div outdeg. Identical floor semantics in Spark
# (`div`) and DuckDB (`//`) make every iteration bit-exact across engines
# — no float accumulation to diverge. Dangling mass is dropped (documented
# leak; ranking order is what the scheduler consumes). _PR_ITERS fixed
# iterations, no convergence test — deterministic plan depth.
_PR_U = 1_000_000
_PR_ITERS = 8
_PR_D_NUM, _PR_D_DEN = 85, 100


def dag_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline criticality ranking: integer PageRank over the dependency
    DAG. Spark runs _PR_ITERS broadcast-join iterations (the edge list is
    O(pipelines) and broadcast; ranks reshuffle only on the dst-keyed
    contribution aggregate); the oracle unrolls the same recurrence as a
    CTE chain — two execution strategies, bit-identical integer fixpoint
    prefix."""
    edges = t(spark, sf_dir, "dag_edges").select(
        F.col("upstream_uuid").alias("src"), F.col("pipeline_uuid").alias("dst")
    )
    # nodes and the degree-annotated edge list feed EVERY iteration: pin
    # both once so the unrolled loop neither re-derives them per round nor
    # accretes an O(iters)-deep Catalyst tree (the r11 before-plan was
    # 1,913 operators — planning+codegen of that tree dominated the query
    # at bench scale; kcore/LPA already truncate per round). Guide §3.3
    # ("materialising an intermediate truncates the plan") + §2.4.
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
    ranks = nodes.withColumn("rank_u", F.lit(_PR_U).cast("bigint"))
    base = (_PR_D_DEN - _PR_D_NUM) * _PR_U
    for _ in range(_PR_ITERS):
        contrib = (
            ranks.join(e_deg, ranks["node"] == F.col("src"))
            .select(F.col("dst").alias("node"), F.expr("rank_u div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        # contrib is node-bounded (O(pipelines), same class as the edge
        # broadcast above): broadcasting it makes the rank refresh
        # exchange-free — one shuffle per iteration (the contribution
        # aggregate), the synchronous-PageRank minimum
        ranks = (
            nodes.join(F.broadcast(contrib), "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({base} div {_PR_D_DEN} + "
                    f"({_PR_D_NUM} * coalesce(s, 0L)) div {_PR_D_DEN} AS BIGINT)"
                ).alias("rank_u"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def _pr_oracle() -> str:
    base = (_PR_D_DEN - _PR_D_NUM) * _PR_U
    ctes = [
        """nodes AS (
  SELECT upstream_uuid AS node FROM dag_edges
  UNION
  SELECT pipeline_uuid FROM dag_edges
), outdeg AS (
  SELECT upstream_uuid AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM dag_edges GROUP BY 1
), e_deg AS (
  SELECT e.upstream_uuid AS src, e.pipeline_uuid AS dst, o.deg
  FROM dag_edges e JOIN outdeg o ON e.upstream_uuid = o.node
), pr0 AS (
  SELECT node, CAST(%d AS BIGINT) AS rank_u FROM nodes
)"""
        % _PR_U
    ]
    for i in range(_PR_ITERS):
        ctes.append(
            f"""contrib{i} AS (
  SELECT ed.dst AS node, SUM(p.rank_u // ed.deg) AS s
  FROM e_deg ed JOIN pr{i} p ON ed.src = p.node
  GROUP BY 1
), pr{i + 1} AS (
  SELECT n.node,
         CAST({base} // {_PR_D_DEN}
              + ({_PR_D_NUM} * COALESCE(c.s, 0)) // {_PR_D_DEN} AS BIGINT)
           AS rank_u
  FROM nodes n LEFT JOIN contrib{i} c ON n.node = c.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, rank_u FROM pr{_PR_ITERS}"
    )


ORACLE_PAGERANK = _pr_oracle()


QUERIES: dict[str, tuple] = {
    "dag_transitive_downstream": (dag_transitive_downstream, ORACLE_TRANSITIVE),
    "dag_impact_analysis": (dag_impact_analysis, ORACLE_IMPACT),
    "dag_critical_path": (dag_critical_path, ORACLE_CRITICAL_PATH),
    "dag_pagerank": (dag_pagerank, ORACLE_PAGERANK),
}


_KCORE_K = 2  # the k in k-core: iteratively peel nodes with degree < k
_KCORE_ROUNDS = 6  # fixpoint bound: each round removes >= 1 node or stops


def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition of the part co-purchase graph: peel
    nodes of degree < _KCORE_K for _KCORE_ROUNDS synchronous rounds and
    report, per surviving node, its residual degree inside the core — the
    cohesive-subgraph filter that separates structurally-embedded parts
    from hangers-on (degree alone can't: a degree-5 node whose neighbors
    all peel is not in the 2-core).

    Both engines run the SAME bounded recurrence (Spark loop vs unrolled
    CTE chain, the dag_pagerank twin pattern), so the outputs match
    exactly even if the fixpoint needs fewer rounds; on the fixture the
    peel converges well within the bound. Synchronous semantics: each
    round recomputes degrees on the PREVIOUS round's survivor set.

    Scale: each round is one groupBy-degree + one semi-join over the
    current edge set — the edge set only shrinks; rounds are a fixed
    constant (deeper cores use the same loop with higher bounds)."""
    from ..operators.sketches import copurchase_edges

    edges = copurchase_edges(spark, sf_dir)
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.select(F.col("u").alias("p"))
            .unionAll(edges.select(F.col("v").alias("p")))
            .groupBy("p")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= _KCORE_K).select("p")
        # checkpoint per round: edges feeds the NEXT round's degree count
        # AND both semi-joins — without truncation the lineage tree
        # triples every round (the components.py pointer-doubling lesson)
        edges = (
            edges.join(keep.withColumnRenamed("p", "u"), "u", "leftsemi")
            .join(keep.withColumnRenamed("p", "v"), "v", "leftsemi")
            .localCheckpoint()
        )
    return (
        edges.select(F.col("u").alias("p"))
        .unionAll(edges.select(F.col("v").alias("p")))
        .groupBy("p")
        .agg(F.count("*").cast("bigint").alias("core_degree"))
    )


def _kcore_oracle() -> str:
    from .sketches import ORACLE_TRIANGLES

    # reuse the exact co-purchase edge CTE the triangle oracle defines
    und_cte = ORACLE_TRIANGLES.split("), tri AS")[0].strip()
    assert und_cte.startswith("WITH und AS (")
    # every CTE is AS MATERIALIZED: each round references the previous one
    # multiple times, and DuckDB's default inlining would re-expand the
    # whole chain (and re-open the lineitem scan) exponentially — the
    # oracle-side twin of the Spark lineage checkpointing above
    und_body = und_cte[len("WITH und AS (") :]
    ctes = [
        "und AS MATERIALIZED (" + und_body + ")",
        "e0 AS MATERIALIZED (SELECT u, v FROM und)",
    ]
    for r in range(_KCORE_ROUNDS):
        ctes.append(
            f"""k{r} AS MATERIALIZED (
  SELECT p FROM (
    SELECT u AS p FROM e{r} UNION ALL SELECT v FROM e{r}
  ) GROUP BY 1 HAVING COUNT(*) >= {_KCORE_K}
), e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e
  JOIN k{r} a ON e.u = a.p
  JOIN k{r} b ON e.v = b.p
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT p, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM (SELECT u AS p FROM e{_KCORE_ROUNDS} UNION ALL SELECT v FROM e{_KCORE_ROUNDS})
GROUP BY 1"""
    )


QUERIES["graph_kcore_membership"] = (graph_kcore_membership, _kcore_oracle())


_LPA_ROUNDS = 4  # synchronous label-propagation iterations
_LPA_KEYBASE = 10_000_000_000  # composite argmax: count * base - label


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the part co-purchase graph via synchronous
    label propagation: every node starts as its own community, then for
    _LPA_ROUNDS each node adopts the most frequent label among its
    neighbors (ties -> smallest label), all nodes updating from the SAME
    previous-round labels. Complements components.py (pure connectivity)
    and the k-core peel (density): LPA finds DENSELY-INTERLINKED regions
    inside one connected component — the product-affinity clusters.

    Deterministic: the mode argmax rides a composite bigint key
    (count * base - label, the repo's padded-composite-argmax convention),
    and synchronous updates make round results order-independent. Both
    engines run the identical bounded recurrence (Spark loop vs unrolled
    MATERIALIZED CTE chain — the kcore/pagerank twin pattern).

    Scale: per round, one co-partitioned join of the label frame onto the
    directed edge list and two hash aggregates — O(E) work per round,
    fixed rounds, nothing collected; lineage is truncated per round
    (components.py lesson)."""
    from ..operators.sketches import copurchase_edges

    und = copurchase_edges(spark, sf_dir)
    edges = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    labels = edges.select("node").distinct().withColumn("lbl", F.col("node"))
    for _ in range(_LPA_ROUNDS):
        nbr_lbls = edges.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "lbl")
        labels = (
            nbr_lbls.groupBy("node", "lbl")
            .agg(F.count("*").alias("cnt"))
            .groupBy("node")
            .agg(
                F.expr(f"max_by(lbl, cnt * {_LPA_KEYBASE} - lbl)").alias("lbl")
            )
            .localCheckpoint(eager=False)
        )
    return labels.select(
        "node", F.col("lbl").cast("bigint").alias("community")
    )


def _lpa_oracle() -> str:
    from .sketches import ORACLE_TRIANGLES

    und_cte = ORACLE_TRIANGLES.split("), tri AS")[0].strip()
    assert und_cte.startswith("WITH und AS (")
    und_body = und_cte[len("WITH und AS (") :]
    ctes = [
        "und AS MATERIALIZED (" + und_body + ")",
        "edges AS MATERIALIZED (SELECT u AS node, v AS nbr FROM und "
        "UNION ALL SELECT v AS node, u AS nbr FROM und)",
        "l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lbl FROM edges)",
    ]
    for r in range(_LPA_ROUNDS):
        ctes.append(
            f"""l{r + 1} AS MATERIALIZED (
  SELECT node, arg_max(lbl, cnt * {_LPA_KEYBASE} - lbl) AS lbl
  FROM (
    SELECT e.node, l.lbl, COUNT(*) AS cnt
    FROM edges e JOIN l{r} l ON l.node = e.nbr
    GROUP BY 1, 2
  ) GROUP BY node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, CAST(lbl AS BIGINT) AS community FROM l{_LPA_ROUNDS}"""
    )


QUERIES["graph_label_propagation"] = (graph_label_propagation, _lpa_oracle())


def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the co-purchase graph: for every
    NON-adjacent part pair with at least one shared neighbor, score the
    missing edge by Jaccard overlap of neighborhoods and by Adamic-Adar
    (common neighbors down-weighted by ln(degree) — rare shared neighbors
    count more), and emit the top-20 predicted links. The recommender-
    system classic ("customers who bought X also bought Y, soon").

    Determinism: jaccard_micro is one truncating div of exact counts;
    each Adamic-Adar term is quantized ONCE per wedge to round(1e6 /
    ln(deg_z)) and summed as BIGINT (deg_z >= 2 always: a common neighbor
    touches both endpoints, so ln never sees 1). Tie-break (score, p, q).

    Scale: wedge enumeration through the shared support-pruned edge list
    (_copurchase_edges — the part-dimension graph, orders smaller than
    the fact table); candidate mass is sum(deg_z^2) over that pruned
    graph, the same budget the triangle census pays, and existing edges
    leave via one anti-join before any scoring. Top-k is a
    TakeOrderedAndProject, never a global sort."""
    from .sketches import copurchase_edges

    und = copurchase_edges(spark, sf_dir)
    adj = und.select(F.col("u").alias("p"), F.col("v").alias("q")).union(
        und.select(F.col("v").alias("p"), F.col("u").alias("q"))
    )
    deg = adj.groupBy("p").agg(F.count("*").cast("bigint").alias("d"))
    # wedges: p - z - q with p < q, carrying z's degree for Adamic-Adar
    left = adj.select(F.col("q").alias("z"), F.col("p"))
    right = adj.select(F.col("p").alias("z"), F.col("q"))
    wedges = (
        left.join(right, "z")
        .filter(F.col("p") < F.col("q"))
        .join(deg.select(F.col("p").alias("z"), F.col("d").alias("dz")), "z")
    )
    cand = (
        wedges.groupBy("p", "q")
        .agg(
            F.count("*").cast("bigint").alias("cn"),
            F.sum(
                F.expr("CAST(ROUND(1e6 / ln(CAST(dz AS DOUBLE))) AS BIGINT)")
            ).alias("aa_micro"),
        )
        .join(und, (F.col("p") == F.col("u")) & (F.col("q") == F.col("v")), "anti")
    )
    scored = (
        cand.join(deg.select(F.col("p"), F.col("d").alias("deg_p")), "p")
        .join(deg.select(F.col("p").alias("q"), F.col("d").alias("deg_q")).hint("shuffle_hash"), "q")
        .select(
            "p",
            "q",
            "cn",
            "deg_p",
            "deg_q",
            F.expr(
                "CAST((1000000 * cn) div (deg_p + deg_q - cn) AS BIGINT)"
            ).alias("jaccard_micro"),
            "aa_micro",
        )
    )
    return scored.orderBy(
        F.col("jaccard_micro").desc(), F.col("p"), F.col("q")
    ).limit(20)


def _link_prediction_oracle() -> str:
    from .sketches import ORACLE_TRIANGLES

    und_cte = ORACLE_TRIANGLES.split("), tri AS")[0].strip()
    assert und_cte.startswith("WITH und AS (")
    und_body = und_cte[len("WITH und AS (") :]
    return (
        "WITH lp_und AS MATERIALIZED ("
        + und_body
        + """),
lp_adj AS MATERIALIZED (
  SELECT u AS p, v AS q FROM lp_und
  UNION ALL SELECT v AS p, u AS q FROM lp_und
), lp_deg AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM lp_adj GROUP BY 1
), lp_cand AS (
  SELECT l.p, r.q, CAST(COUNT(*) AS BIGINT) AS cn,
         CAST(SUM(CAST(ROUND(1e6 / ln(CAST(dz.d AS DOUBLE))) AS BIGINT))
              AS BIGINT) AS aa_micro
  FROM (SELECT q AS z, p FROM lp_adj) l
  JOIN (SELECT p AS z, q FROM lp_adj) r ON l.z = r.z
  JOIN lp_deg dz ON dz.p = l.z
  WHERE l.p < r.q
    AND NOT EXISTS (SELECT 1 FROM lp_und e WHERE e.u = l.p AND e.v = r.q)
  GROUP BY 1, 2
)
SELECT c.p, c.q, c.cn, dp.d AS deg_p, dq.d AS deg_q,
       CAST((1000000 * c.cn) // (dp.d + dq.d - c.cn) AS BIGINT)
         AS jaccard_micro,
       c.aa_micro
FROM lp_cand c
JOIN lp_deg dp ON dp.p = c.p
JOIN lp_deg dq ON dq.p = c.q
ORDER BY jaccard_micro DESC, c.p, c.q
LIMIT 20"""
    )


QUERIES["graph_link_prediction"] = (graph_link_prediction, _link_prediction_oracle())
