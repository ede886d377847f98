"""Facade-layer tests: the section-2.10 endpoint surface, input validation,
engine registry, and retry decorator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kalytical_spark import api, dispatch
from kalytical_spark.operators import replay
from tests.conftest import SF_SMALL


def test_list_with_prefix_and_tag(spark):
    df = api.list_pipeline_configs(spark, SF_SMALL, prefix="p-", tags={"tier": "tier-1"})
    rows = df.collect()
    assert rows
    assert all(r.pipeline_uuid.startswith("p-") for r in rows)
    assert all(r.tags["tier"] == "tier-1" for r in rows)
    assert "pipeline_body" not in df.columns


def test_describe_and_body_roundtrip(spark):
    assert api.describe_pipeline(spark, SF_SMALL, "p-3").count() == 1
    body = api.fetch_pipeline_body(spark, SF_SMALL, "p-3").collect()[0]
    assert body.pipeline_body.startswith('{"steps":')
    # miss -> empty frame (the facade's 404)
    assert api.describe_pipeline(spark, SF_SMALL, "p-nope").count() == 0


def test_input_validation_rejects_hostile_patterns(spark):
    with pytest.raises(api.QueryException):
        api.list_pipeline_configs(spark, SF_SMALL, prefix="p-.*")
    with pytest.raises(api.QueryException):
        api.describe_pipeline(spark, SF_SMALL, "P-UPPER")


def test_downstream_and_delete_guard_agree(spark):
    down = {r.pipeline_uuid for r in api.downstream_pipelines(spark, SF_SMALL, "p-3").collect()}
    guard = {r.pipeline_uuid for r in api.delete_guard(spark, SF_SMALL, "p-3").collect()}
    assert down == guard


def test_event_history_defaults_and_filters(spark):
    df = api.event_history(spark, SF_SMALL, since_seconds=30 * 86400, max_records=15)
    rows = df.collect()
    assert len(rows) == 15
    times = [r.received_time for r in rows]
    assert times == sorted(times, reverse=True)
    only_fail = api.event_history(
        spark, SF_SMALL, event_subtype="failure", since_seconds=30 * 86400
    ).collect()
    assert only_fail and all(r.event_subtype == "failure" for r in only_fail)


def test_running_pipelines_paging(spark):
    rows = api.running_pipelines(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 10
    assert all(r.engine_status in ("running", "waiting", "pending") for r in rows)


def test_engine_registry_and_submission(spark):
    with pytest.raises(dispatch.EngineNotImplementedError):
        dispatch.engine_factory("K8sPodEngine")
    eng = dispatch.engine_factory("LocalLedgerEngine")
    fires = replay.dag_replay_decisions(spark, SF_SMALL)
    n_fires = fires.count()
    assert n_fires > 25
    # overflow is an error, never a silent drop of the tail
    with pytest.raises(ValueError, match="exceeds the driver-side submission limit"):
        dispatch.submit_fires(spark, fires, eng, limit=25)
    ledger = dispatch.submit_fires(spark, fires, eng, limit=n_fires)
    rows = ledger.collect()
    assert len(rows) == n_fires
    assert len({r.tracking_id for r in rows}) == n_fires  # deterministic + unique


def test_retry_decorator():
    calls = {"n": 0}

    @dispatch.retry(attempts=3)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("boom")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3

    @dispatch.retry(attempts=2)
    def always_fails():
        raise RuntimeError("nope")

    with pytest.raises(RuntimeError):
        always_fails()


def test_sys_config_roundtrip():
    cfg = api.sys_config()
    assert cfg["running_jobs_page_size"] == 10
    assert cfg["history_max_records"] == 20


def test_running_pipelines_reference_defaults(spark):
    """facade.py:86-88 contract: default status set is
    ['running', 'waiting', 'pending'] and engine_name is a filter."""
    rows = api.running_pipelines(spark, SF_SMALL, limit=1000).collect()
    statuses = {r.engine_status for r in rows}
    assert statuses <= {"running", "waiting", "pending"}
    assert "waiting" in statuses, "waiting jobs must exist (non-vacuous)"
    k8s = api.running_pipelines(spark, SF_SMALL, engine_name="K8sJobEngine", limit=1000).collect()
    assert k8s and all(r.engine == "K8sJobEngine" for r in k8s)


def test_abort_pipeline_lifecycle(spark):
    """abort_pipeline (facade.py:95-98): an aborted submission flips to
    status=aborted in the ledger; unknown tracking ids raise (the 404)."""
    eng = dispatch.engine_factory("LocalLedgerEngine")
    res = api.run_single_use(
        spark,
        {"pipeline_uuid": "p-777", "pipeline_body": '{"steps": 1}'},
        engine=eng,
    )
    assert res.engine == "LocalLedgerEngine"
    out = api.abort_pipeline(spark, eng, res.tracking_id)
    assert out == {"operation_result": True}
    rows = {r.tracking_id: r for r in eng.ledger(spark).collect()}
    assert rows[res.tracking_id].status == "aborted"
    assert rows[res.tracking_id].source_uuid == "singleuse"
    with pytest.raises(dispatch.JobNotFoundError):
        api.abort_pipeline(spark, eng, res.tracking_id)  # already aborted
    with pytest.raises(dispatch.JobNotFoundError):
        api.abort_pipeline(spark, eng, "feedfeed99")
    with pytest.raises(api.QueryException):
        api.abort_pipeline(spark, eng, "DROP TABLE;--")


def test_run_single_use_is_deterministic_and_bypasses_defs(spark):
    """run_single_use (facade.py:80-83): same body -> same exec/tracking id;
    the submitted pipeline_uuid need not exist in pipeline_defs."""
    eng = dispatch.engine_factory("LocalLedgerEngine")
    body = {"pipeline_uuid": "ephemeral-42", "pipeline_body": '{"steps": 9}'}
    r1 = api.run_single_use(spark, body, engine=eng)
    eng2 = dispatch.engine_factory("LocalLedgerEngine")
    r2 = api.run_single_use(spark, body, engine=eng2)
    assert (r1.exec_uuid, r1.tracking_id) == (r2.exec_uuid, r2.tracking_id)
    defs = api.list_pipeline_configs(spark, SF_SMALL, prefix="ephemeral").collect()
    assert defs == []
    with pytest.raises(dispatch.EngineNotImplementedError):
        api.run_single_use(spark, {"pipeline_uuid": "p-1", "engine": "K8sPodEngine"})
