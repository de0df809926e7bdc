"""Multimodal plumbing + text-operator unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_mvp_spark.operators import multimodal as M
from ballista_mvp_spark.operators import text as TX
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL


def test_featurize_matches_python(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    media = M.media_from_documents(docs)
    feats = {r.media_id: r for r in M.featurize(media).collect()}
    for row in docs.collect():
        payload = row.text.encode("utf-8")
        f = feats[row.doc_id]
        assert f.n_bytes == len(payload)
        assert abs(f.byte_mean - round(sum(payload) / len(payload), 6)) < 1e-9
        assert f.head_hex == payload[:4].hex()


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")


def test_media_schema_contract(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    media = M.media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    assert media.schema["meta"].dataType.simpleString() == (
        "struct<mime:string,n_bytes:bigint,source:string>"
    )


def test_frame_sample_plan(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    media = M.media_from_documents(docs)
    plan = M.frame_sample_plan(media, every_n=10)
    for r in plan.groupBy("media_id").agg(F.max("frame_idx").alias("mx")).collect():
        assert r.mx % 10 == 0


def test_predict_lang_on_crafted_text(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in a house"),
            (2, "der hund ist nicht mit der katze"),
            (3, "le chat est un animal pour la maison"),
            (4, "xyzzy qwerty plugh"),
        ],
        "id long, text string",
    )
    got = {r.id: r.p for r in df.select("id", TX.predict_lang(F.col("text")).alias("p")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")], "id long, text string"
    )
    fps = [r.fp for r in df.select(TX.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]
