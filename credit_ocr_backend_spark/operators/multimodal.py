"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode / feature-extract / resize /
frame-sample stages.

The Spark-side plumbing — schemas, batching, partition sizing, UDF
signatures — is real and tested; the *codec* step is STUBBED because
this container has no image/audio libraries: ``decode_stub`` derives a
deterministic fake raster/waveform from the payload bytes (documented
NotImplementedError escape hatch for the real codecs). Swapping in
Pillow/torchaudio later changes exactly one function per modality.

Scale notes: media payloads are the same heavy-blob problem as giant
html — the stages below expect the caller to have routed oversized
payloads to round-robin partitions (plans.pipeline._defuse_skew
pattern) and keep ``arrow.maxRecordsPerBatch`` small so one batch of
multi-MB blobs can't OOM an executor. Feature vectors come back as
fixed-width arrays (columnar, prunable), never as Python objects.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, Iterator, List

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int,height:int,sample_rate:int,duration_ms:int,codec:string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "features array<float>, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_idx int, frame_sha256 string"
)

N_FEATURES = 16

_REAL_CODECS = False  # flip when PIL/av/torchaudio are installed


def decode_stub(payload: bytes, kind: str) -> List[float]:
    """Deterministic fake decode: a 16-dim feature vector derived from
    the payload digest. REPLACE with a real codec (PIL for images,
    pyav for video, soundfile for audio) when available."""
    if _REAL_CODECS:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/av/soundfile — "
            "not present in this environment"
        )
    digest = hashlib.sha256(kind.encode("utf-8") + payload).digest()
    return [round(b / 255.0, 6) for b in digest[:N_FEATURES]]


def make_feature_stage():
    """mapInPandas stage: (media_id, kind, payload, meta) →
    IMAGE_FEATURES_SCHEMA. Per-payload failures isolate to the row."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[Dict[str, Any]] = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                row: Dict[str, Any] = {
                    "media_id": int(media_id),
                    "kind": kind,
                    "n_bytes": len(raw),
                    "sha256": hashlib.sha256(raw).hexdigest(),
                    "features": None,
                    "decode_ok": False,
                }
                try:
                    row["features"] = decode_stub(raw, kind)
                    row["decode_ok"] = True
                except Exception:
                    pass
                rows.append(row)
            yield pd.DataFrame(rows)

    return extract


def make_frame_sample_stage(n_frames: int = 4):
    """mapInPandas stage: sample ``n_frames`` deterministic frames per
    video payload (stub: digests of payload slices — the slicing and
    fan-out shape is exactly what a real keyframe sampler produces)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None:
                    continue
                raw = bytes(payload)
                step = max(len(raw) // n_frames, 1)
                for idx in range(n_frames):
                    chunk = raw[idx * step: (idx + 1) * step]
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": idx,
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_sha256"]
            )

    return sample


def media_features(media: DataFrame) -> DataFrame:
    """media table → per-item features (Arrow-batched)."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        make_feature_stage(), schema=IMAGE_FEATURES_SCHEMA
    )


def video_frame_samples(media: DataFrame, n_frames: int = 4) -> DataFrame:
    return media.select("media_id", "kind", "payload").mapInPandas(
        make_frame_sample_stage(n_frames), schema=FRAME_SAMPLE_SCHEMA
    )


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic media table from a text corpus (test/bench input):
    payload = utf-8 bytes, kind cycles image/audio/video, meta typed."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length(text_col) * 10).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )
