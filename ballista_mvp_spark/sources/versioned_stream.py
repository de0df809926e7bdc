"""Versioned tables as a Spark data source — batch AND streaming.

Closes the incremental-pipeline loop around sources/versioned.py: the
exactly-once ``foreach_batch_sink`` writes commits in, this source reads
commits out. ``spark.read.format("versioned_table")`` scans the latest
snapshot; ``spark.readStream.format("versioned_table")`` turns the
commit log into a micro-batch stream whose OFFSETS ARE VERSION NUMBERS —
the Delta Lake streaming-source pattern (reference analogue: the
pluggable TableProvider surface, datafusion.proto:99-115, which this
extends to a continuously-committed table).

Semantics: each micro-batch carries the change-feed rows of the commits
in ``(start_version, end_version]`` — inserts for added files, deletes
for files an overwrite retired — tagged ``_change_type`` /
``_commit_version`` exactly like ``versioned.read_changes``. Offsets are
checkpointed by Spark; replay of a committed range re-reads the same
immutable files, so the source is deterministic and exactly-once
composable (the same contract the synthetic stream in pydatasource.py
honors with seeded RNG, here honored by immutability).

Scale shape: planning is manifest set-difference (O(files) metadata);
one InputPartition per changed file, so a micro-batch's parallelism is
the number of files it touches and executors stream Arrow RecordBatches
straight out of parquet — no driver materialization (this is the
partition-parallel ``DataSourceStreamReader``, not the driver-side
``SimpleDataSourceStreamReader``).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from . import versioned as V

_CHANGE_COLS = [
    StructField("_change_type", StringType(), False),
    StructField("_commit_version", IntegerType(), False),
]


class _FilePartition(InputPartition):
    def __init__(self, abs_path: str, kind: str, version: int):
        self.abs_path = abs_path
        self.kind = kind
        self.version = version


def _table_schema(path: str) -> StructType:
    """Arrow schema of the latest snapshot's NEWEST live file (footer-only
    read), converted to Spark types — under additive evolution the newest
    commit's schema is the widest, and older files' missing columns pad
    to typed nulls at read time."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import from_arrow_schema

    vs = V._versions(path)
    if not vs:
        raise FileNotFoundError(f"no committed version at {path}")
    files = V._read_manifest(path, vs[-1])["files"]
    if not files:
        raise FileNotFoundError(f"version {vs[-1]} at {path} has no files")
    arrow = pq.ParquetFile(os.path.join(path, files[-1])).schema_arrow
    base = from_arrow_schema(arrow)
    # every data column must plan nullable: files that PREDATE a column
    # pad it with nulls, whatever the newest file's footer claims
    return StructType(
        [StructField(f.name, f.dataType, True) for f in base.fields]
    )


def _read_file_batches(partition: _FilePartition, data_fields: list):
    """Executor-side: stream Arrow RecordBatches from the parquet file,
    appending the constant change columns; project/pad to the planned
    schema so additive column evolution stays consistent batch-wide."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_type

    pf = pq.ParquetFile(partition.abs_path)
    names = set(pf.schema_arrow.names)
    types = {f.name: to_arrow_type(f.dataType) for f in data_fields}
    for batch in pf.iter_batches():
        cols = []
        for f in data_fields:
            if f.name in names:
                # cast to the PLANNED type: older files may predate a
                # widened column (additive evolution keeps this cheap)
                cols.append(batch.column(f.name).cast(types[f.name]))
            else:
                cols.append(pa.nulls(batch.num_rows, type=types[f.name]))
        cols.append(pa.array([partition.kind] * batch.num_rows, pa.string()))
        cols.append(
            pa.array([partition.version] * batch.num_rows, pa.int32())
        )
        yield pa.RecordBatch.from_arrays(
            cols,
            names=[f.name for f in data_fields]
            + ["_change_type", "_commit_version"],
        )


class VersionedSnapshotReader(DataSourceReader):
    """Batch scan of one snapshot (latest, or options.version): one
    partition per live manifest file. Rows carry the same change columns
    as the stream (``_change_type='insert'``, ``_commit_version`` = the
    snapshot version) so batch and streaming reads share one schema —
    drop them with ``.drop('_change_type', '_commit_version')`` when the
    plain table is wanted."""

    def __init__(self, options: dict, data_schema: StructType):
        self.path = options["path"]
        self.version = int(options["version"]) if "version" in options else None
        self.data_fields = list(data_schema.fields)

    def partitions(self):
        vs = V._versions(self.path)
        v = self.version if self.version is not None else vs[-1]
        if v not in vs:
            raise FileNotFoundError(f"version {v} not in {vs} at {self.path}")
        return [
            _FilePartition(os.path.join(self.path, f), "insert", v)
            for f in V._read_manifest(self.path, v)["files"]
        ]

    def read(self, partition: _FilePartition):
        yield from _read_file_batches(partition, self.data_fields)


class VersionedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, data_schema: StructType):
        self.path = options["path"]
        self.from_version = int(options.get("from_version", 0))
        self.data_fields = list(data_schema.fields)

    def initialOffset(self) -> dict:
        return {"version": self.from_version}

    def latestOffset(self) -> dict:
        vs = V._versions(self.path)
        return {"version": vs[-1] if vs else self.from_version}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        vs = V._versions(self.path)
        prev = set(V._read_manifest(self.path, lo)["files"]) if lo else set()
        parts: list[_FilePartition] = []
        for v in vs:
            if not (lo < v <= hi):
                continue
            cur = set(V._read_manifest(self.path, v)["files"])
            for rel_set, kind in (
                (cur - prev, "insert"),
                (prev - cur, "delete"),
            ):
                parts.extend(
                    _FilePartition(os.path.join(self.path, f), kind, v)
                    for f in sorted(rel_set)
                )
            prev = cur
        return parts

    def read(self, partition: _FilePartition):
        yield from _read_file_batches(partition, self.data_fields)

    def commit(self, end: dict) -> None:
        # nothing to clean up: data files are immutable; retention is
        # vacuum's job, gated by keep_last exactly like Delta CDF
        pass


class VersionedTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def schema(self):
        base = _table_schema(self.options["path"])
        return StructType(list(base.fields) + _CHANGE_COLS)

    def reader(self, schema: StructType) -> DataSourceReader:
        data = StructType(
            [f for f in schema.fields if f.name not in ("_change_type", "_commit_version")]
        )
        return VersionedSnapshotReader(self.options, data)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        data = StructType(
            [f for f in schema.fields if f.name not in ("_change_type", "_commit_version")]
        )
        return VersionedStreamReader(self.options, data)


def register(spark) -> None:
    spark.dataSource.register(VersionedTableDataSource)
