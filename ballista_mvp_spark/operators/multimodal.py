"""Multimodal (image/audio/video) column plumbing.

BASELINE.json north star: treat media as opaque `binary` payload columns
with a typed metadata struct, and run decode / feature-extraction /
resize / frame-sampling as Arrow-batched Pandas functions over
``mapInPandas``. The container ships no image/audio libraries, so the
actual codec step is STUBBED (clearly marked below); everything Spark
cares about — schema, partitioning, UDF signatures, Arrow batch shape —
is real and tested.

Scale notes: media rows are large (MBs); the loader keeps payloads out of
shuffles by carrying only (id, metadata) through joins and re-attaching
payloads at the end (broadcast of ids, or a final co-partitioned join).
`featurize` is mapInPandas (no shuffle at all): at 100 TB it runs as a
pure scan→transform pipeline with Arrow batching.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents table (deterministic fake
    payloads: the utf-8 bytes of the text). Real pipelines read payloads
    with ``spark.read.format('binaryFile')`` — same schema contract."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def media_from_binary_files(blobs: DataFrame) -> DataFrame:
    """Adapt the binaryFile source schema (path, modificationTime,
    length, content) to MEDIA_SCHEMA — the real ingestion leg
    (sources.read_binary_files → this → featurize/perceptual_hash).
    media_id is xxhash64(path): stable across runs, no driver-side id
    assignment, collision odds ~n²/2⁶⁴."""
    return blobs.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col("length").cast("long").alias("n_bytes"),
            F.col("path").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """REAL DECODE STUB — image codecs are not in this container.

    Contract: payload bytes → decoded tensor (H, W, C). Plug Pillow/
    torchvision here in a full deployment.
    """
    raise NotImplementedError("image decode requires a codec library (e.g. Pillow)")


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_entropy_proxy", T.DoubleType(), True),
        T.StructField("head_hex", T.StringType(), True),
    ]
)


def featurize(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Feature extraction over media payloads via ``mapInPandas`` —
    Arrow-batched, per-partition streaming, zero shuffle.

    The featurizer below is a deterministic stand-in (byte statistics)
    for a real decoder+model; swap `_features_of` for a decode_image →
    embed pipeline without touching the Spark plumbing."""

    def _features_of(payload: bytes) -> tuple[int, float, float, str]:
        if payload is None:
            return 0, 0.0, 0.0, ""
        n = len(payload)
        if n == 0:
            return 0, 0.0, 0.0, ""
        mean = sum(payload) / n
        distinct = len(set(payload))
        return n, round(mean, 6), round(distinct / 256.0, 6), payload[:4].hex()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_features_of)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": feats.map(lambda f: f[0]),
                    "byte_mean": feats.map(lambda f: f[1]),
                    "byte_entropy_proxy": feats.map(lambda f: f[2]),
                    "head_hex": feats.map(lambda f: f[3]),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def featurize_arrow(media: DataFrame) -> DataFrame:
    """`featurize` on the FASTEST Python path: ``mapInArrow`` hands the
    worker raw Arrow RecordBatches — no Arrow→pandas conversion at all —
    and the length/mean stats vectorize with numpy directly over the
    Arrow binary buffer (one frombuffer + add.reduceat over the value
    offsets, O(total bytes) with zero per-row Python for the hot
    numerics). Produces bit-identical rows to `featurize` (asserted in
    tests); use this shape when the per-batch work is numeric and the
    pandas round-trip shows up in profiles."""
    import numpy as np
    import pyarrow as pa

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids = rb.column(rb.schema.get_field_index("media_id"))
            payload = rb.column(rb.schema.get_field_index("payload"))
            combined = payload.combine_chunks() if hasattr(payload, "combine_chunks") else payload
            offs = np.frombuffer(combined.buffers()[1], dtype=np.int32)[
                combined.offset : combined.offset + len(combined) + 1
            ]
            data = np.frombuffer(combined.buffers()[2], dtype=np.uint8)
            lens = (offs[1:] - offs[:-1]).astype(np.int64)
            # segment sums via one prefix-sum pass: sums[i] =
            # csum[offs[i+1]] - csum[offs[i]]. Unlike np.add.reduceat this
            # has NO edge cases — a zero-length or trailing-empty payload
            # (whose start offset equals len(data), an IndexError under
            # reduceat) simply yields 0
            csum = np.concatenate(
                ([0], np.cumsum(data.astype(np.int64), dtype=np.int64))
            )
            sums = csum[offs[1:]] - csum[offs[:-1]]
            means = np.where(lens > 0, np.round(sums / np.maximum(lens, 1), 6), 0.0)
            ent, heads = [], []
            for i in range(len(combined)):
                b = data[offs[i] : offs[i + 1]].tobytes()
                if not b:
                    ent.append(0.0)
                    heads.append("")
                else:
                    ent.append(round(len(set(b)) / 256.0, 6))
                    heads.append(b[:4].hex())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.to_pylist(), type=pa.int64()),
                    pa.array(lens, type=pa.int64()),
                    pa.array(means, type=pa.float64()),
                    pa.array(ent, type=pa.float64()),
                    pa.array(heads, type=pa.string()),
                ],
                names=["media_id", "n_bytes", "byte_mean", "byte_entropy_proxy", "head_hex"],
            )

    return media.mapInArrow(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling PLUMBING: explode a per-media frame index list
    (deterministic from n_bytes as a stand-in for decoded frame count) —
    shows the row-multiplying pattern video pipelines need, with the
    decode itself stubbed behind decode_image."""
    n_frames = (F.col("meta.n_bytes") / 100 + 1).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )


def perceptual_hash(media: DataFrame) -> DataFrame:
    """63-bit average-hash perceptual signature per media row — the
    image-near-dup primitive (pHash family). The DECODE step is the
    deterministic byte fake (first 63 payload bytes as grayscale
    pixels) — in production, plug the real decode into the same
    Arrow-batched pandas_udf and the rest of the pipeline (banding,
    pairing, survivor pick) is unchanged, because it only ever sees the
    64-bit signature column.

    Bit i is set iff pixel_i > mean(pixels): near-identical payloads
    land within a few Hamming bits, unrelated ones near 32."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ahash(payload: pd.Series) -> pd.Series:
        def one(b) -> int:
            if b is None:
                return 0
            px = np.frombuffer(bytes(b[:63]).ljust(63, b"\0"), dtype=np.uint8)
            bits = px > px.mean()
            return int(np.packbits(np.append(bits, False)).view(">u8")[0]) >> 1

        return payload.map(one)

    return media.select(F.col("media_id").alias("_id"), _ahash("payload").alias("sh"))


def phash_dup_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Media near-dup pairs: perceptual average-hash + the shared
    Hamming band join (dedup.hamming_band_pairs). Payload bytes never
    shuffle — only (id, 8-byte signature) rows."""
    from .dedup import hamming_band_pairs

    return hamming_band_pairs(perceptual_hash(media).persist(), max_hamming)
