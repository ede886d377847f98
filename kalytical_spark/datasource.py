"""Custom Python DataSource (Spark 4 datasource API): ``kalytical_ticks`` —
the deterministic schedule-tick generator behind cron origination (ST12),
exposed as a first-class connector instead of a hand-built DataFrame. This
is the UD-family extension seam a real deployment uses to wrap an internal
feed (the reference hardwires SQS in mq_poller.py; here new sources plug in
via ``spark.dataSource.register``).

Batch semantics: ticks every ``interval_s`` seconds in
``[start_epoch, end_epoch)``, split across ``num_partitions`` executor-side
range partitions — generation happens IN the partitions (scales with the
cluster, nothing driver-side), and every (option-set, partition) pair is
reproducible.

Streaming semantics: the same tick sequence as an unbounded micro-batch
source (SimpleDataSourceStreamReader): the offset is the next tick_id, each
poll emits at most ``max_ticks_per_batch`` ticks — a deterministic stand-in
for a wall-clock ticker that replays exactly under checkpoint recovery.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

TICKS_SCHEMA = T.StructType(
    [
        T.StructField("tick_id", T.LongType()),
        T.StructField("tick_epoch", T.LongType()),
    ]
)


class _Range(InputPartition):
    def __init__(self, first_id: int, last_id: int):
        self.first_id = first_id
        self.last_id = last_id  # exclusive


class TicksBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = int(options.get("start_epoch", 0))
        self.end = int(options["end_epoch"])
        self.interval = max(1, int(options.get("interval_s", 60)))
        self.num_partitions = max(1, int(options.get("num_partitions", 8)))
        self.n_ticks = max(0, -(-(self.end - self.start) // self.interval))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.n_ticks // self.num_partitions) or 1
        return [
            _Range(i, min(i + per, self.n_ticks))
            for i in range(0, self.n_ticks, per)
        ] or [_Range(0, 0)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for tick_id in range(partition.first_id, partition.last_id):
            yield tick_id, self.start + tick_id * self.interval


class TicksStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.start = int(options.get("start_epoch", 0))
        self.interval = max(1, int(options.get("interval_s", 60)))
        self.batch = max(1, int(options.get("max_ticks_per_batch", 10)))
        self.limit = int(options.get("end_epoch", 0))  # 0 = unbounded

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def _last_id(self) -> int | None:
        if not self.limit:
            return None
        return -(-(self.limit - self.start) // self.interval)

    def read(self, start: dict):
        first = int(start["next_id"])
        last = first + self.batch
        cap = self._last_id()
        if cap is not None:
            last = min(last, cap)
        rows = [
            (tick_id, self.start + tick_id * self.interval)
            for tick_id in range(first, last)
        ]
        return iter(rows), {"next_id": max(first, last)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for checkpoint recovery
        return iter(
            (tick_id, self.start + tick_id * self.interval)
            for tick_id in range(int(start["next_id"]), int(end["next_id"]))
        )


class KalyticalTicksDataSource(DataSource):
    """spark.read.format("kalytical_ticks").option(...) — register first via
    register_datasources(spark)."""

    @classmethod
    def name(cls) -> str:
        return "kalytical_ticks"

    def schema(self):
        return TICKS_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return TicksBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return TicksStreamReader(self.options)


def register_datasources(spark) -> None:
    spark.dataSource.register(KalyticalTicksDataSource)
