"""Multimodal plumbing: binary payload columns through Arrow-batched
mapInPandas — schema, batch shape, fan-out, and the stub gating."""

from __future__ import annotations

import pytest

from idh_etl_demo_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    image_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x10" * 300, None, "mem://a"),
        (2, "image", b"\xff" + b"\x00" * 99 + b"\x3f", None, "mem://b"),
        (3, "video", b"abc" * 1000, None, "mem://c"),
        (4, "image", b"", None, "mem://d"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_without_decoder(media):
    out = attach_media_metadata(media).select("media_id", "media_bytes", "media_md5")
    got = {r.media_id: (r.media_bytes, r.media_md5) for r in out.collect()}
    assert got[1][0] == 300
    assert got[3][0] == 3000
    assert got[4][0] == 0
    assert len(got[1][1]) == 32  # md5 hex


def test_image_features_fake_kernel(media):
    out = image_features(media.filter("media_type = 'image'"), fake=True)
    assert out.schema.fieldNames() == ["media_id", "width", "height", "mean_intensity"]
    got = {r.media_id: r for r in out.collect()}
    # deterministic fake: width = 1 + first_byte % 64, height = 1 + last_byte % 64
    assert got[1].width == 1 + 0x10 % 64 and got[1].height == 1 + 0x10 % 64
    assert got[2].width == 1 + 0xFF % 64 and got[2].height == 1 + 0x3F % 64
    assert got[4].width == 0 and got[4].height == 0


def test_real_kernel_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|image decoding"):
        image_features(media, fake=False).collect()


def test_frame_sampling_fanout(media):
    frames = sample_frames(media.filter("media_id = 3"), every_n_bytes=1024, fake=True)
    rows = frames.collect()
    assert len(rows) == 3  # 3000 bytes / 1024 → 3 frames
    assert [r.frame_no for r in rows] == [0, 1, 2]
    assert sum(len(r.frame_bytes) for r in rows) == 3000


# ---------------------------------------------------------------------------
# Real PPM decode path (stdlib netpbm P6 parser — no Pillow needed)
# ---------------------------------------------------------------------------


def _ppm(w, h, raster, maxval=255, header=None):
    head = header if header is not None else f"P6\n{w} {h}\n{maxval}\n".encode()
    return head + raster


def test_ppm_decode_basic():
    from idh_etl_demo_spark.operators.multimodal import _decode_image_real

    raster = bytes(range(2 * 1 * 3))  # 0..5
    w, h, mean = _decode_image_real(_ppm(2, 1, raster))
    assert (w, h) == (2, 1)
    assert mean == sum(raster) / 6 / 255


def test_ppm_decode_comments_and_whitespace():
    from idh_etl_demo_spark.operators.multimodal import _decode_image_real

    raster = b"\xff" * 3
    head = b"P6 # a comment\n# full-line comment\n 1\t1 \n255\n"
    w, h, mean = _decode_image_real(head + raster)
    assert (w, h, mean) == (1, 1, 1.0)


def test_ppm_decode_maxval_normalization():
    from idh_etl_demo_spark.operators.multimodal import _decode_image_real

    raster = bytes([100] * 3)
    _, _, mean = _decode_image_real(_ppm(1, 1, raster, maxval=100))
    assert mean == 1.0


def test_ppm_truncated_raster_raises():
    from idh_etl_demo_spark.operators.multimodal import _decode_image_real

    with pytest.raises(ValueError, match="truncated PPM raster"):
        _decode_image_real(_ppm(2, 2, b"\x00" * 5))


def test_ppm_wide_maxval_unsupported():
    from idh_etl_demo_spark.operators.multimodal import _decode_image_real

    with pytest.raises(NotImplementedError, match="maxval"):
        _decode_image_real(_ppm(1, 1, b"\x00" * 6, maxval=65535))


def test_ppm_spark_path_real_kernel(spark):
    """fake=False end-to-end through mapInPandas on valid PPM payloads."""
    payloads = [
        (1, "image", _ppm(2, 2, bytes(range(12))), None, None),
        (2, "image", _ppm(1, 3, bytes([200] * 9)), None, None),
    ]
    df = spark.createDataFrame(payloads, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(df, fake=False).collect()}
    assert (got[1].width, got[1].height) == (2, 2)
    assert got[1].mean_intensity == sum(range(12)) / 12 / 255
    assert (got[2].width, got[2].height) == (1, 3)
    assert got[2].mean_intensity == 200 / 255


# ---------------------------------------------------------------------------
# Real WAV decode path (stdlib `wave` RIFF parser)
# ---------------------------------------------------------------------------


def _wav(rate, nch, width, frames):
    import io
    import wave as wavmod

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_wav_decode_8bit_mono():
    import math

    from idh_etl_demo_spark.operators.multimodal import _decode_wav

    frames = bytes([0, 128, 255, 64])
    rate, nch, n, rms = _decode_wav(_wav(8000, 1, 1, frames))
    assert (rate, nch, n) == (8000, 1, 4)
    # unsigned 8-bit is centered at 128 before squaring (silence → 0.0)
    assert rms == math.sqrt(sum((b - 128) ** 2 for b in frames) / 4) / 128.0
    assert _decode_wav(_wav(8000, 1, 1, bytes([128] * 8)))[3] == 0.0


def test_wav_decode_16bit_stereo():
    import math
    import struct

    from idh_etl_demo_spark.operators.multimodal import _decode_wav

    samples = (-32768, 32767, 0, 1000)  # 2 stereo frames
    frames = struct.pack("<4h", *samples)
    rate, nch, n, rms = _decode_wav(_wav(44100, 2, 2, frames))
    assert (rate, nch, n) == (44100, 2, 2)  # n_samples = frames per channel
    assert rms == math.sqrt(sum(s * s for s in samples) / 4) / 32768.0


def test_wav_malformed_raises():
    import pytest as _pytest

    from idh_etl_demo_spark.operators.multimodal import _decode_wav

    with _pytest.raises(Exception):  # wave.Error: not a RIFF file
        _decode_wav(b"NOT A WAVE FILE AT ALL................")


def test_wav_spark_path(spark):
    from idh_etl_demo_spark.operators.multimodal import audio_features

    payloads = [
        (1, "audio", _wav(8000, 1, 1, bytes([100] * 8)), None, None),
        (2, "audio", _wav(16000, 1, 1, bytes([128] * 4)), None, None),
    ]
    df = spark.createDataFrame(payloads, MEDIA_SCHEMA)
    got = {r.media_id: r for r in audio_features(df).collect()}
    assert (got[1].sample_rate, got[1].n_samples) == (8000, 8)
    assert got[1].rms == 28 / 128  # |100 - 128| / 128 after centering
    assert (got[2].sample_rate, got[2].n_samples) == (16000, 4)
    assert got[2].rms == 0.0  # 0x80 samples ARE digital silence


# ---------------------------------------------------------------------------
# Real PPM nearest-neighbor resize
# ---------------------------------------------------------------------------


def test_ppm_resize_downsample():
    from idh_etl_demo_spark.operators.multimodal import (
        _decode_image_real,
        _resize_ppm_nn,
    )

    # 2x2 image: pixels P00 P10 / P01 P11
    raster = bytes([10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42])
    out = _resize_ppm_nn(_ppm(2, 2, raster), 1, 1)
    # NN to 1x1 keeps pixel (0,0)
    assert out == b"P6\n1 1\n255\n" + bytes([10, 11, 12])
    w, h, mean = _decode_image_real(out)  # roundtrip: output is valid PPM
    assert (w, h) == (1, 1)
    assert mean == (10 + 11 + 12) / 3 / 255


def test_ppm_resize_upsample_replicates():
    from idh_etl_demo_spark.operators.multimodal import _resize_ppm_nn

    raster = bytes([1, 2, 3, 4, 5, 6])  # 2x1
    out = _resize_ppm_nn(_ppm(2, 1, raster), 4, 1)
    # x=0,1 -> sx=0; x=2,3 -> sx=1
    assert out == b"P6\n4 1\n255\n" + bytes([1, 2, 3, 1, 2, 3, 4, 5, 6, 4, 5, 6])


def test_ppm_resize_identity():
    from idh_etl_demo_spark.operators.multimodal import _resize_ppm_nn

    raster = bytes(range(18))  # 3x2
    assert _resize_ppm_nn(_ppm(3, 2, raster), 3, 2) == _ppm(3, 2, raster)


def test_ppm_resize_spark_path(spark):
    from idh_etl_demo_spark.operators.multimodal import (
        image_features,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, "image", _ppm(3, 2, bytes(range(18))), None, None)], MEDIA_SCHEMA
    )
    resized = resize_images(df, out_w=2, out_h=1)
    feats = {r.media_id: r for r in image_features(resized, fake=False).collect()}
    assert (feats[1].width, feats[1].height) == (2, 1)
    # sx for x=0,1 at w=3: 0, 1 -> src bytes [0:3] and [3:6]
    assert feats[1].mean_intensity == sum(range(6)) / 6 / 255


def test_signature_null_payloads_stay_out_of_dedup_groups(spark):
    """Missing/empty payloads must produce NULL signatures, not the
    (0, 0, 0) sentinel: ahash=0 / fingerprint=0 are legitimate values
    (flat image, non-increasing clip), so a sentinel would join real
    dedup candidate groups (round-7 ADVICE)."""
    import io
    import wave as wavmod

    from idh_etl_demo_spark.operators.multimodal import (
        audio_fingerprint,
        image_ahash,
    )

    img = spark.createDataFrame(
        [
            (1, "image", _ppm(2, 2, bytes([9] * 12)), None, None),  # flat -> ahash 0
            (2, "image", None, None, None),
            (3, "image", b"", None, None),
        ],
        MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in image_ahash(img).collect()}
    assert got[1].ahash == 0 and got[1].width == 2
    for mid in (2, 3):
        assert got[mid].ahash is None
        assert got[mid].width is None and got[mid].height is None

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([77] * 24))  # constant clip -> fingerprint 0
    aud = spark.createDataFrame(
        [
            (1, "audio", buf.getvalue(), None, None),
            (2, "audio", None, None, None),
            (3, "audio", b"", None, None),
        ],
        MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in audio_fingerprint(aud).collect()}
    assert got[1].fingerprint == 0 and got[1].n_samples == 24
    for mid in (2, 3):
        assert got[mid].fingerprint is None and got[mid].n_samples is None
