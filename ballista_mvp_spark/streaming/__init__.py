"""Structured Streaming operators (extension surface — the reference has
no streaming constructs at all, SURVEY.md §2.10/§1.1; this is the
BASELINE.json north-star streaming path).

Patterns covered:
- tumbling-window aggregation with event-time semantics + watermark
  (run_tumbling_batchfile: parquet-driven for synchronous certification
  against the batch oracle; the same plan runs unchanged on kafka/socket
  sources in production),
- the memory-sink drain idiom for deterministic testing.

Scale notes: streaming state is (window, key)-partitioned by Spark's
state store; watermark bounds state size. Complete-mode memory sink is
test-only — production sinks are foreachBatch/parquet/kafka.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_agg(events: DataFrame, window_len: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window rollup — works on both batch and
    streaming DataFrames (identical plan declaration)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_len), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .select(
            F.date_format(F.col("window.start"), TS_FMT).alias("hour"),
            "event_type",
            "n",
            "sum_v",
        )
    )


def run_tumbling_batchfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the tumbling agg through the STREAMING engine over the events
    parquet, drain synchronously into a memory sink, return the final
    table (complete mode → all windows present, matching the batch
    oracle)."""
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # the streaming file source wants a directory: point it at sf_dir with
    # a glob that selects only the events file
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict((f.name, f.dataType.simpleString()) for f in schema).get("ts") == "bigint":
        src = src.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    agg = tumbling_agg(src)
    qname = f"tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname).orderBy("hour", "event_type")
