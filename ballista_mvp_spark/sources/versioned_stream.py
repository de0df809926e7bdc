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

import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
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
    files = None
    for v in reversed(vs):  # empty head (truncate) → nearest schema-carrier
        files = V._read_manifest(path, v)["files"]
        if files:
            break
    if not files:
        raise FileNotFoundError(f"no version at {path} carries a schema")
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


class _WroteFile(WriterCommitMessage):
    """One executor task's receipt: which file it wrote (table-root
    relative; None for an empty partition) and how many rows."""

    def __init__(self, rel_path: str | None, rows: int):
        self.rel_path = rel_path
        self.rows = rows


class _VersionedWriteBase:
    """Executor-side write shared by the batch and streaming writers:
    each partition writes ONE parquet file into a staging commit dir and
    returns its receipt. Only files named in receipts ever enter a
    manifest — outputs of failed or speculative tasks are invisible
    orphans (vacuum reclaims them), the same write-data-then-link
    contract as write_versioned, here expressed through Spark's
    commit-coordinator (receipts == WriterCommitMessages). Local-FS
    file APIs; an object-store port swaps them for fsspec calls, the
    protocol is unchanged."""

    def __init__(self, options: dict, schema: StructType):
        self.path = options["path"]
        self.schema = schema
        self.stats_cols = [
            c.strip()
            for c in options.get("stats_cols", "").split(",")
            if c.strip()
        ]
        self.token = uuid.uuid4().hex[:12]
        self.commit_rel = os.path.join(V._DATA_DIR, f"commit-w-{self.token}")

    def write(self, iterator) -> _WroteFile:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        arrow_schema = pa.schema(
            [(f.name, to_arrow_type(f.dataType)) for f in self.schema.fields]
        )
        rows = [tuple(r) for r in iterator]
        if not rows:
            return _WroteFile(None, 0)
        cols = list(zip(*rows))
        table = pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
            schema=arrow_schema,
        )
        cdir = os.path.join(self.path, self.commit_rel)
        os.makedirs(cdir, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(cdir, fname))
        return _WroteFile(os.path.join(self.commit_rel, fname), len(rows))

    def abort(self, messages) -> None:
        # Spark constructs a FRESH writer object for the commit/abort
        # call (python_streaming_sink_runner instantiates per
        # invocation), so self.commit_rel's random token differs from
        # the executor writers' — the reliable handles on the staged
        # files are the task receipts themselves. Remove exactly those;
        # receipts of failed tasks never existed, and anything a crashed
        # executor left behind stays an orphan for vacuum's aged sweep.
        import shutil

        for rel in self._added(messages):
            try:
                os.remove(os.path.join(self.path, rel))
            except OSError:
                pass
        # same-process batch writer: the staging dir token IS ours
        shutil.rmtree(os.path.join(self.path, self.commit_rel), ignore_errors=True)

    def _added(self, messages) -> list[str]:
        return [m.rel_path for m in messages if m is not None and m.rel_path]


class VersionedTableWriter(_VersionedWriteBase, DataSourceWriter):
    """Batch write: ``df.write.format("versioned_table").option("path",
    t).mode("append"|"overwrite").save()`` — one new table version per
    save, the overwrite's predecessor staying time-travelable."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        super().__init__(options, schema)
        self.overwrite = overwrite

    def commit(self, messages) -> None:
        V.commit_files(
            self.path,
            self._added(messages),
            mode="overwrite" if self.overwrite else "append",
            stats_cols=self.stats_cols or None,
        )


class VersionedTableStreamWriter(_VersionedWriteBase, DataSourceStreamWriter):
    """Streaming write: ``df.writeStream.format("versioned_table")`` —
    each micro-batch commits one batch-id-stamped version; a replayed
    batch id found in the manifest log is skipped (its re-written
    staging files stay invisible orphans), so at-least-once replay +
    idempotent commit = exactly-once table contents, the same contract
    as foreach_batch_sink without leaving the DataFrame API."""

    def commit(self, messages, batchId: int) -> None:
        if batchId in V.committed_batch_ids(self.path):
            return  # replay of a committed batch: drop it
        V.commit_files(
            self.path,
            self._added(messages),
            mode="append",
            batch_id=batchId,
            stats_cols=self.stats_cols or None,
        )

    def abort(self, messages, batchId: int) -> None:  # type: ignore[override]
        _VersionedWriteBase.abort(self, messages)


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

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return VersionedTableWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return VersionedTableStreamWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(VersionedTableDataSource)
