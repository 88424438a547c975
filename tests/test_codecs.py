"""Pure-numpy PPM/WAV codecs: roundtrips, malformed-input errors, and the
real decode path through the multimodal feature stage."""

import numpy as np
import pytest

from xema_ray.functions.codecs import (
    MediaDecodeError,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)


def test_ppm_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_with_comment_header():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    raw = b"P6\n# a comment\n2 2\n255\n" + img.tobytes()
    assert decode_ppm(raw).shape == (2, 2, 3)


@pytest.mark.parametrize("bad", [
    b"P5\n2 2\n255\n" + b"\0" * 12,          # wrong magic
    b"P6\n2 2\n65535\n" + b"\0" * 24,        # 16-bit maxval unsupported
    b"P6\n4 4\n255\n" + b"\0" * 10,          # truncated raster
])
def test_ppm_malformed(bad):
    with pytest.raises(MediaDecodeError):
        decode_ppm(bad)


def test_wav_roundtrip_mono_and_stereo():
    rate = 8000
    t = np.arange(800) / rate
    mono = np.sin(2 * np.pi * 440 * t)
    r, samples = decode_wav(encode_wav(rate, mono))
    assert r == rate and samples.shape == (800, 1)
    assert np.allclose(samples[:, 0], mono, atol=2 / 32768)

    stereo = np.stack([mono, -mono], axis=1)
    r2, s2 = decode_wav(encode_wav(rate, stereo))
    assert s2.shape == (800, 2)
    assert np.allclose(s2, stereo, atol=2 / 32768)


def test_wav_8bit():
    raw = encode_wav(8000, np.zeros(10))
    # patch to 8-bit by re-encoding manually: decode rejects compressed fmt
    r, s = decode_wav(raw)
    assert s.dtype == np.float32


@pytest.mark.parametrize("bad", [
    b"RIFX" + b"\0" * 40,
    b"RIFF" + b"\0\0\0\0" + b"AVI " + b"\0" * 40,
])
def test_wav_malformed(bad):
    with pytest.raises(MediaDecodeError):
        decode_wav(bad)


def test_extractor_real_decode_differs_from_stub_bytes():
    """The ppm/wav features must come from DECODED signal, not raw bytes:
    re-encoding the same image with an extra header comment changes the
    bytes but not the pixels — features must be identical."""
    import pyarrow as pa

    from xema_ray.stages.multimodal import MediaFeatureExtractor

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    p1 = encode_ppm(img)
    p2 = b"P6\n# same pixels, different bytes\n16 16\n255\n" + img.tobytes()
    tbl = pa.table({
        "media_id": ["a", "b"],
        "payload": pa.array([p1, p2], type=pa.binary()),
        "mime": ["image/x-portable-pixmap"] * 2,
    })
    out = MediaFeatureExtractor(decode_stub=False)(tbl)
    f = out["features"].to_pylist()
    assert f[0] == f[1]


@pytest.mark.parametrize("bad", [
    b"P6\n-1 -1\n255\n" + b"\0" * 3,          # negative dims
    b"RIFF\x28\x00\x00\x00WAVEfmt \x04\x00\x00\x00\x01\x00\x00\x00data\x00\x00\x00\x00",  # short fmt
])
def test_malformed_media_raise_decode_error(bad):
    with pytest.raises(MediaDecodeError):
        (decode_ppm if bad[:2] == b"P6" else decode_wav)(bad)


def test_wav_zero_channels_raises():
    import struct as st

    fmt = st.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    raw = (b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
           + b"fmt " + st.pack("<I", len(fmt)) + fmt
           + b"data" + st.pack("<I", 0))
    with pytest.raises(MediaDecodeError):
        decode_wav(raw)


def test_extractor_on_error_null_keeps_streaming():
    """code-review r2 batch 4: one corrupt payload in a batch must not
    abort the stage when on_error='null' — it becomes a null feature row."""
    import pyarrow as pa

    from xema_ray.stages.multimodal import MediaFeatureExtractor

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    tbl = pa.table({
        "media_id": ["good", "bad", "null"],
        "payload": pa.array([encode_ppm(img), b"P6\n4 4\n255\n\0\0", None],
                            type=pa.binary()),
        "mime": ["image/x-portable-pixmap"] * 3,
    })
    with pytest.raises(MediaDecodeError):
        MediaFeatureExtractor(decode_stub=False)(tbl)
    out = MediaFeatureExtractor(decode_stub=False, on_error="null")(tbl)
    f = out["features"].to_pylist()
    assert len(f[0]) == 64
    assert f[1] is None            # corrupt payload -> null features
    assert f[2] is not None        # null payload stays zero-vector, not error
