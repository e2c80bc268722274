"""Multimodal plumbing + codec tests: schemas, batching, REAL stdlib
PNG/BMP/WAV decoding (round 5), the deterministic fingerprint fallback
for formats with no in-container codec, and frame-sample fan-out."""

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
        # synthetic text payloads carry no codec magic: decode_ok is
        # honestly False (round 5) and the fingerprint fallback flows
        assert row["decode_ok"] is False
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


# ---------------------------------------------------------------------------
# Round 5: REAL stdlib codecs (PNG / BMP / WAV)
# ---------------------------------------------------------------------------


def _png_with_filters(img, filters):
    """Independent PNG writer that applies a CHOSEN filter type per row
    (forward direction of spec §9) — exercises every unfilter branch of
    the decoder, which the filter-0-only encode_png cannot."""
    import struct
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    bpp = c
    scan = b""
    prev = np.zeros(w * c, dtype=np.int32)
    for y, ftype in zip(range(h), filters):
        row = img[y].reshape(-1).astype(np.int32)
        if ftype == 0:
            enc = row
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            enc = (row - left) & 0xFF
        elif ftype == 2:
            enc = (row - prev) & 0xFF
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            enc = (row - ((left + prev) >> 1)) & 0xFF
        elif ftype == 4:
            enc = row.copy()
            for x in range(len(row)):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                pp = a + b - cc
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (row[x] - pred) & 0xFF
        scan += bytes([ftype]) + bytes(enc.astype(np.uint8))
        prev = row

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    color = {1: 0, 3: 2, 4: 6}[c]
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b""))


def test_png_roundtrip_all_channels_and_filters():
    import numpy as np

    from credit_ocr_backend_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(3)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, (7, 5, c), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == (7, 5, c)
        assert (out == img).all(), f"channels={c}"
    # every filter type through the independent writer
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    out = decode_png(_png_with_filters(img, [0, 1, 2, 3, 4]))
    assert (out == img).all()


def test_bmp_decode():
    import struct

    import numpy as np

    from credit_ocr_backend_spark.operators.multimodal import decode_bmp

    img = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    stride = (3 * 3 + 3) & ~3  # 12 bytes: 9 + 3 pad
    pix = b""
    for y in range(2, -1, -1):  # bottom-up storage
        row = img[y][:, ::-1].tobytes()  # RGB → BGR
        pix += row + b"\x00" * (stride - len(row))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, 3, 3, 1, 24, 0, len(pix),
                            2835, 2835, 0, 0))
    out = decode_bmp(header + pix)
    assert (out == img).all()


def test_wav_decode_real_pcm():
    import io
    import math
    import struct
    import wave

    from credit_ocr_backend_spark.operators.multimodal import decode_wav

    buf = io.BytesIO()
    rate, dur_s, amp = 16000, 0.5, 12000
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * 440 * t / rate)))
            for t in range(int(rate * dur_s))
        )
        w.writeframes(frames)
    meta = decode_wav(buf.getvalue())
    assert meta["channels"] == 1 and meta["sample_rate"] == rate
    assert meta["duration_ms"] == 500
    # sine RMS = amp/√2; normalized by 2^15
    expect = amp / (2 ** 0.5) / 32768.0
    assert abs(meta["rms"] - expect) < 0.01
    assert len(meta["envelope"]) == 12 and all(abs(e - expect) < 0.02 for e in meta["envelope"])


def test_resize_nearest():
    import numpy as np

    from credit_ocr_backend_spark.operators.multimodal import resize_nearest

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(img, 2, 2)
    assert (out == np.array([[0, 2], [8, 10]])).all()


def test_feature_stage_real_decode_and_fallback(spark):
    import numpy as np

    from credit_ocr_backend_spark.operators import multimodal as MM

    img = np.full((4, 4, 3), 128, dtype=np.uint8)
    png = MM.encode_png(img)
    rows = [
        (1, "image", bytearray(png)),
        (2, "image", bytearray(b"\xff\xd8\xff\xe0 fake jpeg bytes")),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r["media_id"]: r for r in MM.media_features(media).collect()}
    ok = out[1]
    assert ok["decode_ok"] is True
    # mean gray 128/255, zero std, all mass in the middle histogram bin
    assert abs(ok["features"][3] - 128 / 255) < 1e-4
    assert ok["features"][4] == 0.0
    fb = out[2]
    assert fb["decode_ok"] is False
    expect = [round(b / 255.0, 6) for b in __import__("hashlib").sha256(
        b"image" + bytes(rows[1][2])).digest()[:16]]
    # features land as float32 in the schema — compare with tolerance
    assert all(abs(a - b) < 1e-6 for a, b in zip(fb["features"], expect))


def test_corpus_payloads_never_decode():
    """Guard for the multimodal_pipeline oracle's decode_ok=false
    literal: no testdata document text may decode under a stdlib
    codec. If a corpus-generator change ever violates this, the
    failure shows up HERE with a clear message instead of as an
    oracle hash mismatch."""
    import duckdb

    from credit_ocr_backend_spark.operators.multimodal import decode_features

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM read_parquet("
        "'/root/testdata/sf0.01/documents.parquet') WHERE text IS NOT NULL"
    ).fetchall()
    assert rows
    for doc_id, text in rows:
        payload = text.encode("utf-8")
        try:
            decode_features(payload, "image")
        except Exception:
            continue
        raise AssertionError(
            f"doc_id={doc_id}: corpus text decoded under a stdlib codec — "
            "update the multimodal_pipeline oracle's decode_ok expectation"
        )


def test_png_rejects_zero_dims_and_bounded_inflate():
    import struct
    import zlib

    import numpy as np

    from credit_ocr_backend_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # zero-dimension IHDR with empty IDAT must raise, not NaN-poison
    zero = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b""))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(zero)

    # decompression bomb: 2x2 IHDR, IDAT inflating to 64 MB — must be
    # rejected by the BOUNDED inflate (never allocating the 64 MB)
    bomb = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * (64 << 20), 9))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bomb)

    # sanity: a real image still round-trips after the hardening
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert (decode_png(encode_png(img)) == img).all()


def test_png_consistent_bomb_hits_absolute_ceiling():
    """ADVICE r5 (medium): a CONSISTENT bomb — huge declared dims whose
    tiny compressed-zeros IDAT really inflates that far — must hit the
    absolute raster ceiling before allocating, not sail past the
    IHDR-derived bound."""
    import struct
    import zlib

    import pytest

    from credit_ocr_backend_spark.operators.multimodal import decode_png

    w = h = 16384  # RGBA: 16384*16384*4 ≈ 1 GiB raster, ~1 MB compressed
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # stream zero rows through one compressobj WITHOUT materializing the
    # 1 GiB plaintext: the test itself must not allocate the bomb
    co = zlib.compressobj(9)
    row = b"\x00" * (w * 4 + 1)
    parts = []
    for _ in range(h):
        parts.append(co.compress(row))
    parts.append(co.flush())
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"".join(parts))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="ceiling"):
        decode_png(payload)


def test_bmp_rejects_zero_and_negative_width():
    """ADVICE r5 (low): width=0 (or negative) with height>0 must raise
    instead of producing an empty raster whose mean/std NaN-poison the
    features with decode_ok=true."""
    import struct

    import pytest

    from credit_ocr_backend_spark.operators.multimodal import decode_bmp

    def bmp(width, height):
        dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
        off = 14 + 40
        hdr = b"BM" + struct.pack("<IHHI", off, 0, 0, off)
        return hdr + dib

    for width, height in ((0, 3), (-2, 3), (2, 0)):
        with pytest.raises(ValueError, match="dimensions"):
            decode_bmp(bmp(width, height))
