"""Stream-source factory (S7/ST1 seam): the reference ingests lifecycle
events by polling SQS (mq_poller.py:20-33, at-most-once); the Spark engine
reads a replayable source through ``readStream``. WHICH source is a config
knob, not a code change:

* ``file``  — schema'd parquet directory stream; the hermetic test/CI
  source (and a legitimate production pattern for object-store drops).
* ``kafka`` — the broker shape: ``readStream.format("kafka")`` with the
  standard options, value bytes parsed as JSON into the canonical event
  schema. The test image carries no broker or kafka connector jar, so
  ``.load()`` is only reachable in a real deployment — but option
  construction and the value->schema mapping are pure functions, unit
  tested against batch frames (from_json is identical in both modes).

Exactly-once still comes from the checkpointed query + idempotent sink
(streaming/sinks.py); swapping the source never changes those semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import KalyticalSparkConfig, load_config


class UnknownStreamSourceError(ValueError):
    """stream_source config value outside {file, kafka}."""


def kafka_reader_options(cfg: KalyticalSparkConfig) -> dict[str, str]:
    """The option map a kafka readStream is built from — pure, so the
    broker-less test image can still pin the contract."""
    return {
        "kafka.bootstrap.servers": cfg.kafka_bootstrap_servers,
        "subscribe": cfg.kafka_topic,
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }


def parse_event_payload(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """Map a broker frame (binary ``value``) to the canonical event columns.
    Works identically on a streaming kafka frame and a batch test frame —
    which is how the mapping is tested without a broker. Malformed payloads
    (from_json's PERMISSIVE null struct) are dropped EXPLICITLY rather than
    flowing downstream as all-null rows that filters and watermarks would
    swallow invisibly; production would route this branch to a dead-letter
    sink and count it instead of discarding."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("ev")
    )
    return parsed.filter(F.col("ev").isNotNull()).select("ev.*")


def lifecycle_event_stream(
    spark: SparkSession,
    schema: T.StructType,
    path: str | None = None,
    cfg: KalyticalSparkConfig | None = None,
) -> DataFrame:
    """The engine's single entry point for the event stream. ``path`` feeds
    the file branch (tests pass a tmp dir); the kafka branch is selected by
    KALYTICAL_STREAM_SOURCE=kafka and needs no path."""
    cfg = cfg or load_config()
    if cfg.stream_source == "file":
        if path is None:
            raise ValueError("file stream source requires a path")
        return spark.readStream.schema(schema).parquet(path)
    if cfg.stream_source == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in kafka_reader_options(cfg).items():
            reader = reader.option(k, v)
        return parse_event_payload(reader.load(), schema)
    raise UnknownStreamSourceError(cfg.stream_source)
