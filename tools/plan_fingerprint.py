"""Plan-fingerprint regression gate (PLANS.md, promoted to CI): the
operator MULTISET of each headline query's executed physical plan, pinned
to tests/plan_fingerprints.json. An unintended new Exchange (someone adds a
repartition(), a join flips broadcast->sort-merge, a codegen expression
falls back to Python eval) changes the multiset and fails the test — cheap
insurance across a 180-query registry where a single plan regression would
otherwise hide inside total wall time.

The fingerprint counts only load-bearing operator classes (shuffles,
broadcasts, join strategies, aggregates, Python-eval nodes, windows) —
not expression details — so refactors that keep the execution shape are
fingerprint-stable, while anything that changes shuffle/join/Python
structure is not.

Usage:
    python tools/plan_fingerprint.py            # print current fingerprints
    python tools/plan_fingerprint.py --update   # re-pin the JSON baseline
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Load-bearing operator classes, counted from the AQE FINAL plan. Order
# matters: earlier patterns shadow later ones (e.g. "BroadcastExchange"
# must not also count as a plain shuffle "Exchange").
_OPS: list[tuple[str, str]] = [
    ("shuffle_hash_exchange", r"Exchange hashpartitioning"),
    ("shuffle_range_exchange", r"Exchange rangepartitioning"),
    ("shuffle_single_exchange", r"Exchange SinglePartition"),
    ("shuffle_roundrobin_exchange", r"Exchange RoundRobinPartitioning"),
    ("broadcast_exchange", r"BroadcastExchange"),
    ("broadcast_hash_join", r"BroadcastHashJoin"),
    ("shuffled_hash_join", r"ShuffledHashJoin"),
    ("sort_merge_join", r"SortMergeJoin"),
    ("broadcast_nested_loop_join", r"BroadcastNestedLoopJoin"),
    ("cartesian_product", r"CartesianProduct"),
    ("hash_aggregate", r"HashAggregate"),
    ("object_hash_aggregate", r"ObjectHashAggregate"),
    ("sort_aggregate", r"SortAggregate"),
    ("take_ordered", r"TakeOrderedAndProject"),
    ("window", r"\bWindow\b"),
    ("expand", r"\bExpand\b"),
    ("generate", r"\bGenerate\b"),
    ("python_batch_eval", r"BatchEvalPython"),
    ("python_arrow_eval", r"ArrowEvalPython"),
    ("python_grouped_map", r"FlatMapGroupsInPandas"),
    ("python_map_in_arrow", r"MapInPandas|PythonMapInArrow|MapInArrow"),
]


def fingerprint(df_or_build, spark=None) -> dict[str, int]:
    """Count load-bearing operators of the executed plan — defined as the
    DETERMINISTIC WARM plan: session caches and module-level memo dicts
    are reset (common.reset_session_state), the query is built fresh, and
    then EVERY session-tracked cache (catalog domain views + memo frames)
    is force-materialized BEFORE the query executes. Rationale: a cache
    that materializes DURING the measured query races AQE — whichever
    stage fills it first decides whether sibling stages replan against
    warm InMemoryRelation statistics or cold estimates, which flipped
    users_rfm_segments between 73 and 75 hash exchanges depending on JVM
    load (reproducible in full-suite order only; VERDICT r7). Materializing
    up front makes cache statistics final before planning, so the shape is
    order-independent. (Query-local multi-consumer caches are pinned at
    the source with common.eager_cache for the same reason.)
    Passing a prebuilt DataFrame skips the reset and materialization (only
    safe for memo-free queries, e.g. the injected-repartition teeth test)."""
    from kalytical_spark.operators.common import (
        materialize_session_caches,
        reset_session_state,
    )

    if callable(df_or_build):
        reset_session_state(spark)
        df = df_or_build()
        materialize_session_caches(spark)
    else:
        df = df_or_build
        df.sparkSession.catalog.clearCache()
    df.collect()
    # count over the FULL adaptive plan string (Final AND Initial sections
    # of every nested AdaptiveSparkPlan): AQE final sections print
    # QueryStage references instead of executed subtrees (a Window inside
    # a materialized stage appears ONLY in an Initial section —
    # users_rfm_segments), so masking either side goes blind to real
    # operators. Both sections are deterministic for a fixed input, and a
    # join-strategy flip or injected shuffle moves the counts in either
    # representation — which is all the gate needs.
    plan = df._jdf.queryExecution().executedPlan().toString()
    out: dict[str, int] = {}
    for name, pat in _OPS:
        n = len(re.findall(pat, plan))
        if n:
            out[name] = n
    return out


# Headline set: the plan shapes SURVEY.md section 4 designed for, one per
# load-bearing family (star join, vocab join, LSH mine, top-k, codegen agg,
# grouped-map fold, window prefix-sum, sketch partial-agg).
def headline_queries() -> dict[str, object]:
    from kalytical_spark.registry import all_queries

    qs = all_queries()
    names = [
        "q1_pricing_summary",       # codegen-heavy scan+agg, zero joins
        "q9_product_type_profit",   # star join: single fact shuffle
        "q19_disjunctive_revenue",  # disjunction folded into ONE join
        "dag_fire_decisions",       # flagship: explode + broadcast joins
        "events_recent_topk",       # TakeOrderedAndProject
        "text_tfidf_topk",          # shuffle_hash vocab join (never broadcast)
        "dedup_minhash_lsh",        # banded LSH mine
        "sketch_hll_registers",     # partial-agg register table
        "events_cumulative_users",  # two-level prefix-sum window
        "dag_replay_decisions",     # hybrid window + grouped-map fold
        "sketch_quantile_decades",  # histogram sketch + partitioned exact anchor
        "sketch_cms_join_size",     # sketch inner-product join estimate
        "orders_market_basket",     # one-shuffle array pair expansion + top-k
        "users_rfm_segments",       # digit-partitioned NTILE (no global window)
        "text_rrf_fusion",          # two per-term windows + fused top-k
        "dedup_setsim_prefix",      # prefix postings + array_intersect verify
        "sim_maxsim_topk",          # flat codegen MaxSim: no Python eval node
        "text_maxscore_topk",       # essential-posting prune: bounded dims only
        "text_stupid_backoff",      # three shuffle_hash model joins (never broadcast)
        "graph_link_prediction",    # wedge join + anti-join + TakeOrderedAndProject
        "dedup_minhash_calibration",  # pair-bounded signature rebuild (semi-join prune)
        # r6->r7 bench-regression watch set (VERDICT r6 task 3): pinned so
        # plan drift is ruled in/out of any future wall-time movement
        "decontam_longest_run",     # n-gram hit runs: match-join + window
        "dag_critical_path",        # iterative longest-path fold
        "text_vocab_coverage",      # frequency-ranked coverage curve
    ]
    return {n: qs[n][0] for n in names if n in qs}


_PIN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plan_fingerprints.json",
)


def stable(name: str, fp: dict[str, int]) -> dict[str, int]:
    """Kept as the comparison seam (fingerprints are already hermetic —
    fingerprint() clears the session cache, so the cold plan is the
    definition and no per-query volatility carve-outs are needed)."""
    return fp


def compute_all(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    return {
        name: stable(
            name,
            fingerprint(lambda fn=fn: fn(spark, sf_dir), spark),
        )
        for name, fn in headline_queries().items()
    }


def main() -> None:
    from kalytical_spark.session import get_spark
    from tests.conftest import SF_ORACLE

    spark = get_spark("plan_fingerprint", cpus=8)
    fps = compute_all(spark, SF_ORACLE)
    print(json.dumps(fps, indent=1, sort_keys=True))
    if "--update" in sys.argv:
        with open(_PIN, "w") as fh:
            json.dump(fps, fh, indent=1, sort_keys=True)
        print(f"pinned -> {_PIN}", file=sys.stderr)


if __name__ == "__main__":
    main()
