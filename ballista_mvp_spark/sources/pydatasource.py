"""Custom Python DataSource — the user-defined-table-provider surface.

The reference's catalog is built on DataFusion's pluggable TableProvider:
every scan node (ListingTableScanNode, datafusion.proto:99-115) is one
implementation of a provider interface users can extend. Spark 4's Python
DataSource API is the same extension point: implement
``DataSource``/``DataSourceReader``, register with
``spark.dataSource.register``, and ``spark.read.format(name)`` plans the
custom source like any built-in one — with partitions handed to executors
for parallel reads.

``SyntheticEventsDataSource`` generates a deterministic seeded event
stream (same shape as the testdata `events` table) with one partition
per ``n_partitions`` — each partition seeds its own RNG, so the read is
embarrassingly parallel and reproducible: the 100 TB pattern for
load-testing a pipeline without storing 100 TB.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
)
_TYPES = ("signup", "view", "click", "purchase", "error")


class _EventsPartition(InputPartition):
    def __init__(self, index: int, rows: int, seed: int):
        self.index = index
        self.rows = rows
        self.seed = seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_partitions = int(options.get("partitions", 4))
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [
            _EventsPartition(i, self.rows_per_partition, self.seed + i)
            for i in range(self.n_partitions)
        ]

    def read(self, partition: _EventsPartition):
        # executes ON THE EXECUTOR: per-partition RNG → deterministic,
        # parallel, no driver-side materialization
        import datetime
        import random

        rng = random.Random(partition.seed)
        base = datetime.datetime(2024, 1, 1)
        start_id = partition.index * partition.rows
        for i in range(partition.rows):
            ts = base + datetime.timedelta(seconds=rng.randint(0, 30 * 24 * 3600))
            yield (
                start_id + i,
                ts,
                rng.randint(0, 149),
                _TYPES[rng.randint(0, len(_TYPES) - 1)],
                round(rng.uniform(0.0, 100.0), 2),
            )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming reader over the same generator: the offset
    is the global row counter, each batch emits ``batch_rows`` rows from
    a seeded RNG keyed by the batch's start offset — deterministic
    replay from any checkpointed offset, which is exactly the
    exactly-once contract a custom streaming source must honor (Spark
    re-reads an offset range after failure and must see the same rows)."""

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start: dict):
        rows = list(self._gen(start["offset"], self.batch_rows))
        return iter(rows), {"offset": start["offset"] + self.batch_rows}

    def readBetweenOffsets(self, start: dict, end: dict):
        # failure replay: regenerate the identical range
        return iter(self._gen(start["offset"], end["offset"] - start["offset"]))

    def _gen(self, start_offset: int, n: int):
        import datetime
        import random

        rng = random.Random(self.seed + start_offset)
        base = datetime.datetime(2024, 1, 1)
        for i in range(n):
            ts = base + datetime.timedelta(seconds=rng.randint(0, 30 * 24 * 3600))
            yield (
                start_offset + i,
                ts,
                rng.randint(0, 149),
                _TYPES[rng.randint(0, len(_TYPES) - 1)],
                round(rng.uniform(0.0, 100.0), 2),
            )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
