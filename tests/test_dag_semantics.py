"""Semantic assertions for the DAG/incubation operators against the derived
fixtures — the reference's tricky rules (SURVEY.md hard-parts watch-list):
F15 routing, A3 oldest-waiting-wins, culler branch precedence, retry caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark import catalog
from kalytical_spark.operators import dag, metadata
from tests.conftest import SF_SMALL


def test_trigger_route_fire_conditions(spark):
    """fire iff triggers_on IS NULL, operator='any', or 'all' with 1 dep
    (reference dispatcher.py:41-45)."""
    rows = metadata.meta_trigger_route(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        expected = (
            r.trigger_operator is None
            or r.trigger_operator == "any"
            or (r.trigger_operator == "all" and r.n_deps == 1)
        )
        assert (r.route == "fire") == expected, r
    # roots have no deps
    for r in rows:
        if r.trigger_operator is None:
            assert r.n_deps == 0, r


def test_oldest_waiting_wins(spark):
    """Exactly one credited run per (event, pipeline); it is the min
    (create_time, obj_id) among waiting candidates (data_provider.py:216-224)."""
    credited = dag.dag_oldest_waiting_credit(spark, SF_SMALL)
    dupes = (
        credited.groupBy("exec_uuid", "pipeline_uuid")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0

    # spot-check minimality: join back to all waiting candidates
    catalog.register(spark, SF_SMALL)
    waiting = (
        spark.table("incubating_triggers")
        .filter(F.col("trigger_value") == "waiting")
        .join(spark.table("incubating_runs").select("obj_id", "create_time"), "obj_id")
        .groupBy("pipeline_uuid", "trigger_uuid")
        .agg(F.min(F.struct("create_time", "obj_id")).alias("oldest"))
    )
    joined = credited.join(waiting, ["pipeline_uuid", "trigger_uuid"]).filter(
        (F.col("oldest.create_time") != F.col("create_time"))
        | (F.col("oldest.obj_id") != F.col("obj_id"))
    )
    assert joined.count() == 0


def test_cull_branch_precedence(spark):
    """Reference elif-chain: concurrency+debounce beats age-out; fire requires
    reason='dependencies' and full satisfaction (job_culler.py:17-43)."""
    rows = dag.dag_cull_decisions(spark, SF_SMALL).collect()
    assert rows
    seen = set()
    for r in rows:
        seen.add(r.decision)
        if r.decision == "requeue":
            assert r.reason == "concurrency" and r.age_s > dag.DEBOUNCE_S
            assert r.next_retry_count == r.retry_count + 1
        elif r.decision == "fire":
            assert r.reason == "dependencies" and r.all_satisfied
        elif r.decision == "cull":
            assert r.age_s > dag.AGE_OUT_S
            # and neither earlier branch applied
            assert not (r.reason == "concurrency" and r.age_s > dag.DEBOUNCE_S)
            assert not (r.reason == "dependencies" and r.all_satisfied)
        else:
            assert r.decision == "keep"
    # the synthetic clock must exercise all four branches
    assert seen == {"requeue", "fire", "cull", "keep"}


def test_concurrency_gate(spark):
    """defer iff a live run exists and concurrency is disabled
    (dispatcher.py:70-96)."""
    rows = dag.dag_concurrency_gate(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert (r.decision == "defer") == (r.has_running and not r.concurrency), r
