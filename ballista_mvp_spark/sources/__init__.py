"""Source/scan layer — SURVEY.md §2.2.

The reference scans CSV/Parquet/Avro listing tables with projection/limit
pushdown, pruning predicates, and Hive-style partition columns
(reference: ballista/core/proto/datafusion.proto:87-115, 1144-1171;
partition cols :106,1153 with per-file values :1315-1321). Spark's
readers provide all of that; this module pins the reference's scan
options to reader configuration and adds the listing-table conveniences
(directory of files, explicit schema, partition discovery).

Sinks: the reference has NONE (results are fetched shuffle files,
SURVEY.md §2.2) — ``write_table`` below is the documented free extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """ParquetScanExecNode (datafusion.proto:1144-1161): multi-file scan;
    projection/limit pushdown and row-group pruning are Catalyst-automatic
    (verified in tests/test_plans.py)."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    if merge_schema:
        r = r.option("mergeSchema", "true")
    return r.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = False,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = "\\",
    compression: str | None = None,
) -> DataFrame:
    """CsvScanExecNode (datafusion.proto:1163-1167: has_header, delimiter,
    quote, optional escape) + CsvFormat options (:1102-1109)."""
    r = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("quote", quote)
        .option("escape", escape)
    )
    if schema:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    if compression:
        r = r.option("compression", compression)
    return r.csv(path)


# spark-sql_2.13-4.1.2.jar bundles the Avro classes but not the
# DataSourceRegister short-name entry, so `format("avro")` fails while the
# fully-qualified provider works. Try the short name first (correct on a
# standard deployment), then the FQCN.
_AVRO_PROVIDERS = ("avro", "org.apache.spark.sql.avro.AvroFileFormat")


def _is_source_missing(e: Exception) -> bool:
    return "Failed to find data source" in str(e) or "DATA_SOURCE_NOT_FOUND" in str(e)


def read_avro(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """AvroScanExecNode (datafusion.proto:1169-1171)."""
    err: Exception | None = None
    for provider in _AVRO_PROVIDERS:
        r = spark.read
        if schema:
            r = r.schema(schema)
        for k, v in (options or {}).items():
            r = r.option(k, v)
        try:
            return r.format(provider).load(path)
        except Exception as e:  # noqa: BLE001
            if not _is_source_missing(e):
                raise
            err = e
    raise NotImplementedError(
        "Avro scan requires the spark-avro classes on the classpath "
        "(org.apache.spark:spark-avro)"
    ) from err


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro sink (free extension, used by the round-trip test)."""
    err: Exception | None = None
    for provider in _AVRO_PROVIDERS:
        try:
            df.write.mode(mode).format(provider).save(path)
            return
        except Exception as e:  # noqa: BLE001
            if not _is_source_missing(e):
                raise
            err = e
    raise NotImplementedError("spark-avro classes not on the classpath") from err


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Free extension (no JSON scan in the reference proto)."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.json(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", schema: str | None = None
) -> DataFrame:
    """XML scan (free extension — spark-xml was merged into Spark 4 as a
    built-in source). Schema inference scans the files once; pass an
    explicit ``schema`` at scale to skip that pass. Row-granular
    parallelism: one row element per record, files split as text."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema:
        r = r.schema(schema)
    return r.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (round-trip complement of read_xml)."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-bytes ingestion (binaryFile source): one row per file with
    (path, modificationTime, length, content binary) — the ingestion
    leg of the multimodal pipeline (operators/multimodal.py consumes the
    ``content`` column). Spark lists files in parallel and never splits
    a blob, so partition count tracks file count; at 100 TB pack small
    media into larger archive rows first (e.g. the versioned-table
    sink) — a billion 4 KB files is a listing problem, not a read
    problem."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """ORC scan (free extension — the reference scans parquet/csv/avro,
    datafusion.proto:1147-1171; ORC is the remaining big columnar warehouse
    format and is built into Spark). Predicate pushdown and column pruning
    work as for parquet (native vectorized reader)."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.orc(path)


def read_partitioned(
    spark: SparkSession,
    base_path: str,
    file_format: str = "parquet",
    schema: str | None = None,
) -> DataFrame:
    """Hive-style partitioned listing table (table_partition_cols,
    datafusion.proto:106,1153): dir layout ``base/col=value/...`` —
    Spark discovers partition columns and prunes partitions on filter
    (verified in tests/test_sources.py)."""
    r = spark.read.option("basePath", base_path)
    if schema:
        r = r.schema(schema)
    return r.format(file_format).load(base_path)


def write_table(
    df: DataFrame,
    path: str,
    file_format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> None:
    """Sink (free extension — reference has no write path). partition_by
    gives Hive layout for partition pruning; bucketing co-locates future
    joins on the bucket key without a shuffle (100 TB pattern)."""
    w = df.write.mode(mode).format(file_format)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        raise ValueError(
            "bucketed sinks need a catalog table name — use "
            "write_bucketed_table(df, name, n, cols, path=...)"
        )
    w.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    file_format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed sink — the 100 TB co-located-join pattern (free extension;
    the reference has no write path at all).

    Spark bucketing hash-partitions file layout by ``bucket_cols`` into
    ``n_buckets`` files per write task and records the spec in the session
    catalog; a later join or aggregation on the bucket key reads both
    sides pre-partitioned and skips the shuffle entirely (verified in
    tests/test_sources_types.py: SortMergeJoin with zero Exchange).
    ``sort_cols`` additionally sorts within buckets, removing the
    sort step of a sort-merge join. At 100 TB, bucketing the fact tables
    on the join key once at ingest amortizes every subsequent
    fact-fact join."""
    w = df.write.mode(mode).format(file_format).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucketing spec
    only survives via the catalog — a plain ``read.parquet`` of the same
    files loses it and re-shuffles)."""
    return spark.table(table)


def write_sorted_layout(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    file_format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Range-clustered sorted write — the data-layout half of scan speed
    at 100 TB (the single-axis analogue of OPTIMIZE ... ZORDER): rows are
    range-partitioned on ``sort_cols`` (sampled bounds, no single-
    partition stage) and sorted within each output file, so every file
    covers a near-disjoint key range. Parquet footer min/max stats then
    let any later range/point predicate on the sort key skip whole files
    and row groups instead of scanning the corpus — the difference
    between reading 100 TB and reading the one affected key range.
    Disjointness of per-file ranges is asserted in
    tests/test_sources_types.py."""
    cols = [F.col(c) for c in sort_cols]
    d = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    d.sortWithinPartitions(*cols).write.mode(mode).format(file_format).save(path)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    file_format: str = "parquet",
) -> tuple[int, int]:
    """Small-file compaction: rewrite a table directory into
    ~target_file_mb files. The operational tail of every incremental
    pipeline at scale — streaming/micro-batch sinks and per-partition
    writers accrete thousands of KB-sized files per day, and scan-task
    scheduling overhead (one task per file below maxPartitionBytes)
    eventually dwarfs the I/O itself. Rewrites via coalesce (narrow — no
    shuffle; merges existing partitions) into a temp dir, then swaps.
    Returns (files_before, files_after)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    def _data_files(p):
        return [
            f
            for f in _glob.glob(_os.path.join(p, "**", "*"), recursive=True)
            if _os.path.isfile(f)
            and not _os.path.basename(f).startswith(("_", "."))
        ]

    before = _data_files(path)
    total_mb = sum(_os.path.getsize(f) for f in before) / 1e6
    n_out = max(1, round(total_mb / target_file_mb))
    # Hive-partitioned layouts (key=value subdirs) must be rewritten with
    # partitionBy or the compaction would silently flatten the directory
    # tree (partition dirs become plain data columns, pruning lost).
    part_cols: list[str] = []
    p = path
    while True:
        subdirs = [
            d
            for d in _os.listdir(p)
            if _os.path.isdir(_os.path.join(p, d)) and "=" in d
        ]
        if not subdirs:
            break
        part_cols.append(subdirs[0].split("=", 1)[0])
        p = _os.path.join(p, subdirs[0])
    df = spark.read.format(file_format).load(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    w = df.coalesce(n_out).write.mode("overwrite").format(file_format)
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.save(tmp)
    # Rename-aside swap: a crash at any point leaves the full table in
    # either `path` or `bak` (never only in the tmp sibling).
    bak = path.rstrip("/") + "._compact_bak"
    if _os.path.exists(bak):
        _shutil.rmtree(bak)
    _os.rename(path, bak)
    _os.rename(tmp, path)
    _shutil.rmtree(bak)
    return len(before), len(_data_files(path))


def zorder_key(cols: list, bits: int = 16) -> "Column":
    """Z-order (Morton) key over numeric columns: each column is min-max
    rank-scaled to `bits` bits (percent_rank over the column — computed
    by the caller via zorder_write, which avoids a per-row global rank at
    scale by sampling bounds) and the bit positions are interleaved with
    JVM-side shift/or expressions. Rows close in EVERY dimension land
    close in the 1-D sort order, so parquet min/max footer stats prune
    files for predicates on ANY clustered column — the multi-column
    generalization of write_sorted_layout.

    bits * len(cols) must fit in a signed long: shiftleft positions >= 64
    would wrap silently and corrupt the Morton order."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: bits({bits}) * len(cols)({n}) = {bits * n} > 63 "
            "would overflow the interleaved long; lower bits (e.g. "
            f"bits={63 // n})"
        )
    interleaved = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1))
            interleaved = interleaved.bitwiseOR(
                F.shiftleft(bit, b * n + i).cast("long")
            )
    return interleaved


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    bits: int = 12,
    file_format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered write: scale each cluster column to [0, 2^bits)
    using GLOBAL min/max (one tiny agg, broadcast back — NOT a global
    rank), compute the Morton key, range-partition + sort on it, drop the
    helper key. At 100 TB: one scan + one range shuffle, same cost shape
    as write_sorted_layout, but point/range predicates on any of the
    clustered columns skip files via footer stats."""
    aggs = []
    for c in cluster_cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    bounds = df.agg(*aggs)
    scaled_df = df.join(F.broadcast(bounds))
    scale = float(2**bits - 1)
    scaled = [
        (
            (F.col(c) - F.col(f"_mn_{c}"))
            / F.greatest(F.col(f"_mx_{c}") - F.col(f"_mn_{c}"), F.lit(1e-12))
            * scale
        )
        for c in cluster_cols
    ]
    keyed = scaled_df.withColumn("_zkey", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_mn_{c}" for c in cluster_cols], *[f"_mx_{c}" for c in cluster_cols])
        .write.mode(mode)
        .format(file_format)
        .save(path)
    )


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """MERGE (upsert) into a parquet table without a transaction log:
    source rows replace target rows with the same key, new keys append.
    Unpartitioned: rewrite = target ⟕anti source ∪ source. Partitioned:
    only the partitions the source touches are read, merged, and
    rewritten via dynamic partition overwrite — cost O(touched
    partitions), not O(table), the same discipline as the streaming
    incremental sink (with Delta/Iceberg this function IS `MERGE INTO`).
    Invariant the caller owns (same as Hive/Delta partitioned merges):
    the partition value of a key must not change between target and
    source — otherwise the old row lives in a partition the merge never
    reads, and the key is duplicated.
    The merged batch is materialized driver-free before the overwrite
    (self-read-overwrite guard: parquet reads are lazy, so writing over
    the directory being read requires a barrier — a localCheckpoint)."""
    # SQL MERGE rejects a source with duplicate keys ("multiple source
    # rows matched"); we take the permissive path: exactly one arbitrary
    # source row per key wins (callers wanting a specific winner dedupe
    # upstream, e.g. max-by-timestamp). Without this, every source
    # duplicate would be appended after the anti-join removed the target
    # row.
    source = source.dropDuplicates(key_cols)
    tgt = spark.read.parquet(target_path)
    if partition_col is not None:
        touched = source.select(partition_col).distinct()
        tgt = tgt.join(F.broadcast(touched), partition_col, "left_semi")
    merged = tgt.join(source, key_cols, "left_anti").unionByName(source)
    merged = merged.localCheckpoint(eager=True)
    w = merged.write.mode("overwrite")
    if partition_col is not None:
        w = w.option("partitionOverwriteMode", "dynamic").partitionBy(partition_col)
    w.parquet(target_path)
