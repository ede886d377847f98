"""Execution-engine abstraction (SURVEY.md UD1/UD3/UD4): the reference's
pluggable engine factory (engine.py:21-36) and retry decorator
(utils/retry.py:7-18) re-expressed for the Spark engine. Submission becomes
a decision-row append to a dispatch ledger DataFrame — the within-engine
analog of pod creation; a real deployment's foreachBatch sink would hand
these rows to spark-submit/K8s.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EngineNotImplementedError(NotImplementedError):
    """Unknown engine name in the registry (engine.py:35-36 analog)."""


class JobNotFoundError(KeyError):
    """Abort target unknown to the engine — the reference's 404 when the pod
    is already gone (engine.py:162-169)."""


def retry(attempts: int = 3, delay_s: float = 0.0):
    """Driver-side operation retry (utils/retry.py:7-18; the reference has
    no backoff — we add an optional linear delay). Executor-side retries are
    Spark's own spark.task.maxFailures."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            last: Exception | None = None
            n = max(1, attempts)
            for i in range(n):
                try:
                    return fn(*args, **kwargs)
                except Exception as exc:  # noqa: BLE001 - mirror reference semantics
                    last = exc
                    # no sleep after the FINAL attempt: nothing follows it,
                    # so the pause would only delay the re-raise
                    if delay_s and i < n - 1:
                        time.sleep(delay_s * (i + 1))
            raise last  # type: ignore[misc]

        return wrapper

    return deco


@dataclass(frozen=True)
class SubmitResult:
    pipeline_uuid: str
    exec_uuid: str
    engine: str
    tracking_id: str


class BaseEngine:
    """Strategy interface: submit/list/abort (engine.py:38-66 analog)."""

    name = "BaseEngine"

    def submit(self, spark: SparkSession, row: dict) -> SubmitResult:
        raise NotImplementedError

    def ledger(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError

    def abort(self, spark: SparkSession, tracking_id: str) -> dict:
        """DELETE /pipeline/dispatcher/abort_pipeline analog
        (facade.py:95-98 -> engine.py:162-169: delete pod by tracking id)."""
        raise NotImplementedError


class LocalLedgerEngine(BaseEngine):
    """Records submissions in an in-memory ledger; deterministic tracking ids
    (sha2 of the submission identity — the reference's uuid1()[:8] is
    nondeterministic and excluded from oracle checks, SURVEY.md C1)."""

    name = "LocalLedgerEngine"

    def __init__(self):
        self._rows: list[dict] = []

    def submit(self, spark: SparkSession, row: dict) -> SubmitResult:
        import hashlib

        ident = f"{row['pipeline_uuid']}|{row['exec_uuid']}|{row.get('retry_count', 0)}"
        tracking = hashlib.sha256(ident.encode()).hexdigest()[:10]
        rec = {
            "pipeline_uuid": row["pipeline_uuid"],
            "exec_uuid": row["exec_uuid"],
            "engine": self.name,
            "tracking_id": tracking,
            "retry_count": int(row.get("retry_count", 0)),
            "source_uuid": row.get("source_uuid", "api_call"),
            "status": "submitted",
        }
        self._rows.append(rec)
        return SubmitResult(row["pipeline_uuid"], row["exec_uuid"], self.name, tracking)

    def ledger(self, spark: SparkSession) -> DataFrame:
        schema = (
            "pipeline_uuid string, exec_uuid string, engine string, "
            "tracking_id string, retry_count int, source_uuid string, status string"
        )
        return spark.createDataFrame(self._rows, schema=schema)

    def abort(self, spark: SparkSession, tracking_id: str) -> dict:
        """Mark the submission aborted (the ledger analog of deleting the
        pod); unknown ids raise, mirroring the reference's 404."""
        for rec in self._rows:
            if rec["tracking_id"] == tracking_id and rec["status"] != "aborted":
                rec["status"] = "aborted"
                return {"operation_result": True}
        raise JobNotFoundError(tracking_id)


_REGISTRY: dict[str, type[BaseEngine]] = {
    "LocalLedgerEngine": LocalLedgerEngine,
}


def register_engine(name: str, cls: type[BaseEngine]) -> None:
    _REGISTRY[name] = cls


def engine_factory(name: str) -> BaseEngine:
    """Strategy lookup (engine.py:21-36): unknown names raise, like the
    reference's NotImplementedError branch."""
    try:
        return _REGISTRY[name]()
    except KeyError as exc:
        raise EngineNotImplementedError(f"engine not registered: {name}") from exc


def submit_fires(
    spark: SparkSession, fires: DataFrame, engine: BaseEngine, limit: int | None = None
) -> DataFrame:
    """UD4 within-engine analog: hand a fire-decision frame to an engine and
    return its ledger. Driver-side iteration is bounded (limit) — the real
    sink is foreachBatch, which keeps submission on the streaming path.

    The bound is a guardrail, not a sampler: a fire set larger than the
    limit raises instead of silently dropping the tail (dropped fires are
    lost work orders — no silent caps)."""
    n = limit if limit is not None else 1000
    if n == 0:
        # explicit 0 means "submit none, just hand back the ledger" — a
        # deliberate no-op, not an overflow (api.py's pagination documents
        # the same limit=0-means-none convention)
        return engine.ledger(spark)
    # deterministic submission set AND replay indices: an unordered
    # limit().collect() returns an arbitrary subset in arbitrary order,
    # which would make the content-addressed tracking ids differ run-to-run
    rows = (
        fires.select("pipeline_uuid", "sources", "fired_at")
        .orderBy("fired_at", "pipeline_uuid")
        .limit(n + 1)  # one past the cap: detects overflow without a count()
        .collect()
    )
    if len(rows) > n:
        raise ValueError(
            f"fire set exceeds the driver-side submission limit ({n}); "
            "refusing to silently drop fires — raise the limit or route "
            "through the streaming foreachBatch sink"
        )
    for i, r in enumerate(rows):
        engine.submit(
            spark,
            {
                "pipeline_uuid": r.pipeline_uuid,
                "exec_uuid": f"replay{i:06d}",
                "retry_count": 0,
            },
        )
    return engine.ledger(spark)
