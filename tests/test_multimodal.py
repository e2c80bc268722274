"""Multimodal plumbing tests: schemas, batching, deterministic stub
decode, frame-sample fan-out. (Codec step is a documented stub — these
tests pin the Spark-side contract that a real codec drops into.)"""

from __future__ import annotations

import hashlib

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from credit_ocr_backend_spark.operators.multimodal import (  # noqa: E402
    N_FEATURES,
    decode_stub,
    media_features,
    synthesize_media,
    video_frame_samples,
)
from credit_ocr_backend_spark.plans.session import get_spark  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    return get_spark("multimodal-tests", parallelism=4)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text {i} ü{'x' * i}") for i in range(12)],
        "doc_id long, text string",
    )
    return synthesize_media(docs, "doc_id", "text")


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,"
        "meta:struct<width:int,height:int,sample_rate:int,"
        "duration_ms:int,codec:string>>"
    )
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_feature_stage(media):
    feats = media_features(media).collect()
    assert len(feats) == 12
    for row in feats:
        assert row["decode_ok"]
        assert len(row["features"]) == N_FEATURES
        assert all(0.0 <= f <= 1.0 for f in row["features"])
    # deterministic: digest-derived, reproducible locally
    by_id = {r["media_id"]: r for r in feats}
    payload = "payload text 3 ü" + "x" * 3
    expected = decode_stub(payload.encode("utf-8"), by_id[3]["kind"])
    assert [round(f, 6) for f in by_id[3]["features"]] == expected
    assert by_id[3]["sha256"] == hashlib.sha256(payload.encode("utf-8")).hexdigest()


def test_frame_samples(media):
    frames = video_frame_samples(media, n_frames=4)
    rows = frames.collect()
    video_ids = {r["media_id"] for r in rows}
    assert video_ids == {2, 5, 8, 11}  # doc_id % 3 == 2
    per_id = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per_id)
    # frame digests deterministic
    raw = ("payload text 2 ü" + "x" * 2).encode("utf-8")
    step = max(len(raw) // 4, 1)
    expected0 = hashlib.sha256(raw[0:step]).hexdigest()
    got = {(r["media_id"], r["frame_idx"]): r["frame_sha256"] for r in rows}
    assert got[(2, 0)] == expected0
