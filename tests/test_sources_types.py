"""Source-layer (CSV/partitioned/Avro-gating) + type-mapping tests.

Scratch files live under the repo (.scratch/, gitignored) — the test
environment forbids writes outside /root/repo.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ballista_mvp_spark import sources, types
from ballista_mvp_spark.plans import plan_facts
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture(scope="module")
def scratch():
    os.makedirs(SCRATCH, exist_ok=True)
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_csv_roundtrip_with_delimiter(spark, scratch):
    """CsvScanExecNode parity: header flag + custom delimiter
    (datafusion.proto:1163-1167); reference demo uses '|' .tbl files."""
    nation = load_table(spark, SF_SMALL, "nation")
    path = os.path.join(scratch, "nation_csv")
    nation.coalesce(1).write.mode("overwrite").option("sep", "|").option("header", "true").csv(path)
    back = sources.read_csv(
        spark,
        path,
        schema="n_nationkey int, n_name string, n_regionkey int",
        header=True,
        delimiter="|",
    )
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in nation.collect()
    )


def test_partitioned_scan_prunes(spark, scratch):
    """Hive partition columns (datafusion.proto:106,1153): write orders
    partitioned by status, read back, check partition pruning on filter."""
    orders = load_table(spark, SF_SMALL, "orders")
    path = os.path.join(scratch, "orders_part")
    sources.write_table(orders, path, partition_by=["o_orderstatus"])
    back = sources.read_partitioned(spark, path)
    assert "o_orderstatus" in back.columns
    assert back.count() == orders.count()
    filtered = back.filter(F.col("o_orderstatus") == "O")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the source, not post-filter all rows
    assert "PartitionFilters" in plan or filtered.count() == orders.filter(
        F.col("o_orderstatus") == "O"
    ).count()


def test_avro_roundtrip(spark, scratch):
    """Avro scan (AvroScanExecNode, datafusion.proto:1169-1171): the
    container's spark-sql jar bundles the Avro classes without the
    short-name registration, so read_avro resolves the FQCN provider.
    Round-trip: write nation as avro, read back, values identical."""
    nation = load_table(spark, SF_SMALL, "nation")
    path = os.path.join(scratch, "nation_avro")
    sources.write_avro(nation.select("n_nationkey", "n_name", "n_regionkey"), path)
    back = sources.read_avro(spark, path)
    assert back.count() == nation.count()
    got = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in back.collect()}
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
    assert got == want
    # engine DDL path resolves avro too
    from ballista_mvp_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.create_external_table("nation_avro_t", path, "avro")
    assert spark.sql("SELECT count(*) AS n FROM nation_avro_t").head().n == nation.count()


def test_unsigned_widening():
    assert types.arrow_to_spark("UINT8") == T.ShortType()
    assert types.arrow_to_spark("UINT16") == T.IntegerType()
    assert types.arrow_to_spark("UINT32") == T.LongType()
    assert types.arrow_to_spark("UINT64") == T.DecimalType(20, 0)


def test_timestamp_and_time_rules():
    assert types.arrow_to_spark("TIMESTAMP", timezone="UTC") == T.TimestampType()
    assert types.arrow_to_spark("TIMESTAMP") == T.TimestampNTZType()
    assert types.arrow_to_spark("TIME64") == T.LongType()


def test_decimal_and_nested():
    assert types.arrow_to_spark("DECIMAL", precision=15, scale=2) == T.DecimalType(15, 2)
    with pytest.raises(ValueError, match="38"):
        types.arrow_to_spark("DECIMAL", precision=76, scale=0)
    arr = types.arrow_to_spark("LIST", element=T.FloatType())
    assert arr == T.ArrayType(T.FloatType())
    with pytest.raises(ValueError, match="UNION"):
        types.arrow_to_spark("UNION")


def test_schema_from_fields():
    sch = types.schema_from_fields(
        [("id", "INT64", False), ("name", "UTF8", True), ("bal", "FLOAT64", True)]
    )
    assert sch.simpleString() == "struct<id:bigint,name:string,bal:double>"


def test_plan_facts_digest(spark):
    from ballista_mvp_spark.queries.tpch import q3

    df = q3(spark, SF_SMALL)
    df.collect()  # broadcast is a runtime (AQE) decision under the
    # shipped policy (SCALE.md r9) — digest the final adaptive plan
    facts = plan_facts(df)
    assert facts.broadcast_joins >= 1
    assert facts.pushed_filters, "expected pushed filters on the lineitem scan"
    assert facts.has_take_ordered


def test_bucketed_join_skips_shuffle(spark, scratch):
    """Bucketed sink round-trip: two tables bucketed on the join key join
    with a SortMergeJoin and ZERO Exchange operators — the 100 TB
    co-located fact-join pattern."""
    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    sources.write_bucketed_table(
        orders, "orders_b", 4, ["o_orderkey"], sort_cols=["o_orderkey"],
        path=os.path.join(scratch, "orders_b"),
    )
    sources.write_bucketed_table(
        li, "lineitem_b", 4, ["l_orderkey"], sort_cols=["l_orderkey"],
        path=os.path.join(scratch, "lineitem_b"),
    )
    ob = sources.read_bucketed_table(spark, "orders_b")
    lb = sources.read_bucketed_table(spark, "lineitem_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_dynamic_partition_pruning_on_partitioned_fact(spark, scratch):
    """Dynamic partition pruning: a hive-partitioned fact joined on its
    partition column to a selectively-filtered dim must scan ONLY the
    partitions the dim's filter survives — Spark injects a
    `dynamicpruningexpression` subquery/broadcast-reuse filter into the
    fact scan's PartitionFilters at runtime. At 100 TB this is the
    difference between reading one month and reading the whole table
    when the pruning value is only known after the dim filter runs."""
    orders = load_table(spark, SF_SMALL, "orders")
    fact = orders.withColumn("o_month", F.month("o_orderdate"))
    path = os.path.join(scratch, "orders_dpp")
    sources.write_table(fact, path, partition_by=["o_month"])
    back = sources.read_partitioned(spark, path)
    dim = spark.createDataFrame(
        [(m, f"m{m:02d}") for m in range(1, 13)], "m int, label string"
    ).filter(F.col("label") == "m03")
    joined = back.join(dim, back.o_month == dim.m).select("o_orderkey", "o_month")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expect = orders.filter(F.month("o_orderdate") == 3).count()
    assert joined.count() == expect


def test_schema_evolution_merge_on_read(spark, scratch):
    """Schema evolution: a corpus directory written over time where later
    batches add columns must read back as one table (mergeSchema) with
    nulls for the pre-evolution rows — and filters on the original
    columns must still push down to the scan. At 100 TB you never
    rewrite old shards to add a column."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    path = os.path.join(scratch, "evolving")
    docs.filter(F.col("doc_id") < 50).write.mode("overwrite").parquet(path)
    docs.filter(F.col("doc_id") >= 50).withColumn(
        "quality", F.lit(0.5)
    ).write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(back.columns) == {"doc_id", "text", "quality"}
    assert back.count() == docs.count()
    old = back.filter(F.col("doc_id") < 50)
    assert old.filter(F.col("quality").isNull()).count() == old.count()
    filtered = back.filter(F.col("doc_id") >= 50)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThanOrEqual(doc_id,50)" in plan


def test_corrupt_file_handling_modes(spark, scratch):
    """A 100 TB directory WILL contain a truncated/garbage file
    eventually. Default: the scan fails loudly (no silent data loss).
    With spark.sql.files.ignoreCorruptFiles: the scan completes with
    the healthy files' rows — the explicit opt-in degraded mode."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    path = os.path.join(scratch, "with_corrupt")
    docs.write.mode("overwrite").parquet(path)
    n_good = docs.count()
    with open(os.path.join(path, "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a real parquet footer")
    with pytest.raises(Exception):
        spark.read.parquet(path).count()
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        assert spark.read.parquet(path).count() == n_good
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_zstd_compression_roundtrip_and_size(spark, scratch):
    """Codec choice is a first-order cost lever at 100 TB: zstd trades
    a little CPU for materially smaller files than snappy (Spark's
    default). Round-trip correctness + the size ordering must hold on
    the compressible documents table; the codec is recorded per column
    chunk so readers need no configuration."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    p_snappy = os.path.join(scratch, "c_snappy")
    p_zstd = os.path.join(scratch, "c_zstd")
    docs.coalesce(1).write.mode("overwrite").option("compression", "snappy").parquet(p_snappy)
    docs.coalesce(1).write.mode("overwrite").option("compression", "zstd").parquet(p_zstd)
    assert spark.read.parquet(p_zstd).count() == docs.count()
    back = spark.read.parquet(p_zstd).orderBy("doc_id").collect()
    orig = docs.orderBy("doc_id").collect()
    assert back == orig

    def dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert dir_bytes(p_zstd) < dir_bytes(p_snappy)


def test_jsonl_roundtrip_documents(spark, scratch):
    """JSONL (newline-delimited JSON — the de-facto training-corpus
    interchange format) round trip: write_table(format='json') emits one
    JSON object per line; read_json scans it back, schema pinned (no
    inference pass at scale)."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text", "lang")
    path = os.path.join(scratch, "docs_jsonl")
    sources.write_table(docs, path, file_format="json")
    # raw file content is genuinely newline-delimited JSON objects
    import glob, json

    part = sorted(glob.glob(os.path.join(path, "part-*")))[0]
    with open(part) as fh:
        first = fh.readline()
    assert json.loads(first)["doc_id"] is not None
    back = sources.read_json(spark, path, schema="doc_id bigint, text string, lang string")
    assert back.count() == docs.count()
    a = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    b = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    assert a == b


def test_orc_roundtrip_with_pushdown(spark, scratch):
    """ORC round trip via the generic sink (write_table(format='orc')) +
    read_orc; filter pushdown reaches the ORC scan like parquet."""
    nation = load_table(spark, SF_SMALL, "nation")
    path = os.path.join(scratch, "nation_orc")
    sources.write_table(nation, path, file_format="orc")
    back = sources.read_orc(spark, path)
    assert sorted(back.columns) == sorted(nation.columns)
    assert back.count() == nation.count()
    a = sorted(map(tuple, nation.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    plan = back.filter(F.col("n_regionkey") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_regionkey" in plan


def test_sorted_layout_files_are_range_disjoint(spark, scratch):
    """write_sorted_layout range-partitions + sorts, so parquet footer
    min/max stats per FILE are pairwise disjoint on the sort key — the
    property that lets a 100 TB scan with a key predicate skip whole
    files. Asserted directly from the parquet metadata."""
    import glob

    import pyarrow.parquet as pq

    events = load_table(spark, SF_SMALL, "events")
    path = os.path.join(scratch, "events_sorted")
    sources.write_sorted_layout(events, path, ["user_id"], n_files=4)
    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["user_id"]
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) >= 2
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # ranges never interleave (boundary key may repeat)
    # values survive the rewrite
    back = sources.read_parquet(spark, path)
    assert back.count() == events.count()


def test_compact_table_reduces_files_preserves_rows(spark, tmp_path):
    """Fragmented write (64 files) → compact → few files, identical data."""
    from ballista_mvp_spark.sources import compact_table

    p = str(tmp_path / "frag")
    df = load_table(spark, SF_SMALL, "lineitem")
    expected = df.count()
    df.repartition(64).write.parquet(p)
    before, after = compact_table(spark, p, target_file_mb=256)
    assert before >= 64
    assert after < before and after <= 4
    out = spark.read.parquet(p)
    assert out.count() == expected
    assert set(out.columns) == set(df.columns)


def test_compact_table_preserves_hive_partition_layout(spark, tmp_path):
    """Compacting a hive-partitioned table must keep the key=value dirs
    (flattening them would turn partition pruning off silently)."""
    import os

    from ballista_mvp_spark.sources import compact_table

    p = str(tmp_path / "part_frag")
    df = load_table(spark, SF_SMALL, "customer")
    expected = df.count()
    df.repartition(16).write.partitionBy("c_nationkey").parquet(p)
    before, after = compact_table(spark, p, target_file_mb=256)
    assert after < before
    # layout survives: partition dirs still present, no data files at root
    subdirs = [d for d in os.listdir(p) if d.startswith("c_nationkey=")]
    assert len(subdirs) == 25
    out = spark.read.parquet(p)
    assert out.count() == expected
    assert set(out.columns) == set(df.columns)
    # partition pruning still works on the compacted table
    one = out.where("c_nationkey = 7")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == df.where("c_nationkey = 7").count()
    assert "PartitionFilters: [isnotnull(c_nationkey" in plan


def test_zorder_key_rejects_long_overflow(spark):
    """bits * len(cols) > 63 would shift past the sign bit and corrupt
    the Morton order — must raise, not wrap."""
    import pytest as _pytest

    from ballista_mvp_spark.sources import zorder_key

    cols = [F.col(c) for c in ("a", "b", "c", "d")]
    with _pytest.raises(ValueError, match="overflow"):
        zorder_key(cols, bits=16)
    # 4 cols at bits<=15 is fine
    assert zorder_key(cols, bits=15) is not None


def test_merge_upsert_deduplicates_source_batch(spark, tmp_path):
    """A source batch carrying the same key twice must yield ONE row for
    that key after the merge (SQL MERGE would reject; we take one
    arbitrary winner), never duplicates."""
    from ballista_mvp_spark.sources import merge_upsert

    p = str(tmp_path / "merge_dup")
    spark.createDataFrame(
        [(1, "old"), (2, "keep")], "k int, v string"
    ).write.parquet(p)
    source = spark.createDataFrame(
        [(1, "new_a"), (1, "new_b"), (3, "ins")], "k int, v string"
    )
    merge_upsert(spark, p, source, ["k"])
    out = spark.read.parquet(p)
    rows = {r.k: r.v for r in out.collect()}
    assert out.count() == 3  # exactly one row per key — no dup appended
    assert rows[2] == "keep"
    assert rows[1] in {"new_a", "new_b"}
    assert rows[3] == "ins"


def test_python_datasource_parallel_deterministic(spark):
    """Custom Python DataSource (the user-defined TableProvider surface):
    registered format plans like a built-in, reads run per-partition on
    executors, and seeded generation is reproducible."""
    from ballista_mvp_spark.sources import pydatasource

    pydatasource.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("partitions", 4)
        .option("rows_per_partition", 500)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 2000
    assert dict(df.dtypes)["ts"] == "timestamp"
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, (
        spark.read.format("synthetic_events")
        .option("partitions", 4)
        .option("rows_per_partition", 500)
        .load()
        .collect()
    )))
    assert a == b
    # the custom source composes with ordinary relational ops
    agg = df.groupBy("event_type").count()
    assert agg.count() == 5


def test_python_datasource_streaming_reader(spark, tmp_path):
    """The same custom source as a STREAMING format: offset-keyed seeded
    batches drain through a real streaming query; deterministic replay
    from an offset is the exactly-once contract."""
    from ballista_mvp_spark.sources import pydatasource

    pydatasource.register(spark)
    df = (
        spark.readStream.format("synthetic_events")
        .option("batch_rows", 200)
        .load()
    )
    assert df.isStreaming
    q = (
        df.writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline and spark.table("pyds_stream").count() < 400:
            time.sleep(1)
        got = spark.table("pyds_stream")
        assert got.count() >= 400  # at least two micro-batches drained
        first = {tuple(r) for r in got.where("event_id < 200").collect()}
    finally:
        q.stop()
    # deterministic replay: regenerating offset range [0, 200) yields the same rows
    reader = pydatasource.SyntheticEventsStreamReader({"batch_rows": 200})
    regen = {tuple(r) for r in reader.readBetweenOffsets({"offset": 0}, {"offset": 200})}
    assert {t[0] for t in first} == {t[0] for t in regen}


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order clustering vs 1-D sort: after clustering lineitem on
    (l_orderkey, l_suppkey), parquet footer min/max stats prune files for
    a point predicate on EITHER column; a 1-D l_orderkey sort leaves
    l_suppkey ranges covering ~every file."""
    import glob

    import pyarrow.parquet as pq

    from ballista_mvp_spark.sources import write_sorted_layout, zorder_write

    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "sorted")
    zorder_write(li, zpath, ["l_orderkey", "l_suppkey"], n_files=8)
    write_sorted_layout(li, spath, ["l_orderkey"], n_files=8)

    def files_covering(path, col, value):
        hits, total = 0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            total += 1
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(
                    [md.schema.column(i).name for i in range(md.num_columns)].index(col)
                ).statistics
                if st.min <= value <= st.max:
                    hits += 1
                    break
        return hits, total

    probe = li.agg(F.expr("percentile_approx(l_suppkey, 0.5)")).collect()[0][0]
    z_hits, z_total = files_covering(zpath, "l_suppkey", probe)
    s_hits, s_total = files_covering(spath, "l_suppkey", probe)
    assert z_total == 8 and s_total == 8
    # 1-D sort can't prune the second dimension; z-order must
    assert z_hits < s_hits, (z_hits, s_hits)
    # data integrity: same rows back
    assert spark.read.parquet(zpath).count() == li.count()
    # first dimension still prunes (interleaving trades per-dim sharpness
    # for balance, and the range sampler adds variance — assert strict
    # pruning, not a fixed fraction)
    zo_hits, _ = files_covering(zpath, "l_orderkey", 10)
    assert zo_hits < 8, zo_hits


def test_merge_upsert_partitioned_touches_only_affected_partitions(spark, tmp_path):
    """MERGE semantics: updated keys replaced, new keys appended,
    untouched rows intact — and with a partition column, files in
    untouched partitions are not rewritten."""
    import glob
    import os

    from ballista_mvp_spark.sources import merge_upsert

    p = str(tmp_path / "cust")
    cust = load_table(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    cust.write.partitionBy("c_nationkey").parquet(p)
    before = {f: os.path.getmtime(f) for f in glob.glob(f"{p}/*/part-*.parquet")}
    n0 = cust.count()

    upd_key = cust.where("c_nationkey = 0").select("c_custkey").first().c_custkey
    source = spark.createDataFrame(
        [(upd_key, "UPDATED", 999.0, 0), (10**9, "BRAND_NEW", 1.0, 0)],
        "c_custkey long, c_name string, c_acctbal double, c_nationkey long",
    )
    merge_upsert(spark, p, source, ["c_custkey"], partition_col="c_nationkey")

    out = spark.read.parquet(p)
    assert out.count() == n0 + 1
    got = {r.c_custkey: (r.c_name, r.c_acctbal)
           for r in out.where(f"c_custkey in ({upd_key}, 1000000000)").collect()}
    assert got[upd_key] == ("UPDATED", 999.0)
    assert got[10**9] == ("BRAND_NEW", 1.0)
    untouched = [
        f for f in glob.glob(f"{p}/*/part-*.parquet")
        if "c_nationkey=0" not in f and f in before
    ]
    assert untouched, "expected surviving files in untouched partitions"
    assert all(os.path.getmtime(f) == before[f] for f in untouched)


def test_jsonl_corrupt_record_modes(spark, tmp_path):
    """Malformed-input contract for JSONL ingestion: PERMISSIVE captures
    bad lines in _corrupt_record (pipeline quarantine pattern),
    DROPMALFORMED silently drops them, FAILFAST raises — the three
    dispositions a 100 TB ingest job chooses between."""
    import pytest as _pytest

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok"}\n'
        '{"doc_id": 3, "text": 12, "trailing\n'
    )
    schema = "doc_id long, text string, _corrupt_record string"
    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = perm.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 2
    good = {r.doc_id for r in rows if r._corrupt_record is None}
    assert good == {1, 2}

    dropped = (
        spark.read.schema("doc_id long, text string")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert {r.doc_id for r in dropped.collect()} == {1, 2}

    with _pytest.raises(Exception):
        spark.read.schema("doc_id long, text string").option(
            "mode", "FAILFAST"
        ).json(str(p)).collect()


def test_xml_roundtrip_documents(spark, scratch):
    """XML round trip (spark-xml became a Spark 4 built-in): write with
    row/root tags, read back with a PINNED schema (no inference scan at
    scale) — values and row count must survive exactly."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    path = os.path.join(scratch, "docs_xml")
    sources.write_xml(docs, path, row_tag="doc", root_tag="docs")
    back = sources.read_xml(
        spark, path, row_tag="doc", schema="doc_id bigint, lang string, n_chars bigint"
    )
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.select("doc_id", "lang", "n_chars").collect()))
    assert a == b


def test_binary_files_ingestion(spark, scratch):
    """binaryFile ingestion: one row per blob with exact bytes + length —
    the multimodal ingestion leg (content feeds operators/multimodal).
    pathGlobFilter prunes non-matching files at listing time."""
    blobs = {"a.img": b"\x89IMG\x00\x01", "b.img": b"\xffBLOB", "skip.txt": b"nope"}
    bdir = os.path.join(scratch, "blobs")
    os.makedirs(bdir, exist_ok=True)
    for name, data in blobs.items():
        with open(os.path.join(bdir, name), "wb") as fh:
            fh.write(data)
    df = sources.read_binary_files(spark, bdir, glob="*.img")
    got = {os.path.basename(r.path): bytes(r.content) for r in df.collect()}
    assert got == {"a.img": blobs["a.img"], "b.img": blobs["b.img"]}
    assert {r.length for r in df.collect()} == {6, 5}


def test_binary_ingestion_to_phash_dedup_end_to_end(spark, scratch):
    """The full multimodal ingestion path: blobs on disk → binaryFile
    source → MEDIA_SCHEMA adapter → perceptual-hash near-dup pairs.
    Two planted byte-identical blobs must pair; the unrelated blob must
    not. Payload bytes never shuffle — only (id, signature) rows."""
    from ballista_mvp_spark.operators import multimodal as M

    bdir = os.path.join(scratch, "media_blobs")
    os.makedirs(bdir, exist_ok=True)
    dup = bytes(range(100, 163)) * 4
    blobs = {"x1.img": dup, "x2.img": dup,
             "y.img": bytes((i * 37 + 11) % 256 for i in range(256))}
    for name, data in blobs.items():
        with open(os.path.join(bdir, name), "wb") as fh:
            fh.write(data)
    media = M.media_from_binary_files(sources.read_binary_files(spark, bdir, glob="*.img"))
    rows = media.collect()
    assert {bytes(r.payload) for r in rows} == set(blobs.values())
    assert all(r.meta.n_bytes == len(bytes(r.payload)) for r in rows)
    ids = {os.path.basename(r.meta.source): r.media_id for r in rows}
    pairs = {(min(a, b), max(a, b)) for a, b in
             ((r.a, r.b) for r in M.phash_dup_pairs(media, max_hamming=0).collect())}
    want = (min(ids["x1.img"], ids["x2.img"]), max(ids["x1.img"], ids["x2.img"]))
    assert pairs == {want}
