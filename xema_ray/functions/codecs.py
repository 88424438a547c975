"""Pure-numpy media codecs — the REAL decode path for the multimodal
stage in an environment without image/audio libraries.

Two self-contained formats:

* **PPM (P6)** — binary Portable PixMap: ``P6 <w> <h> <maxval>`` header
  (ASCII, ``#`` comments allowed) followed by h·w·3 raw bytes.
* **WAV (PCM)** — RIFF container with ``fmt `` (PCM, 8/16-bit) and
  ``data`` chunks.

Both are decoded with ``struct``/numpy only — no external dependency —
and both have encoders so tests and the synthetic media generator can
produce real payloads deterministically.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaDecodeError(ValueError):
    pass


# ----------------------------------------------------------------------
# PPM (P6)
# ----------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM → ``(h, w, 3)`` uint8 array."""
    if not payload.startswith(b"P6"):
        raise MediaDecodeError("not a P6 PPM payload")
    pos = 2
    fields = []
    while len(fields) < 3:
        # skip whitespace and '#' comments
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise MediaDecodeError("unterminated PPM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise MediaDecodeError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if w < 0 or h < 0:
        raise MediaDecodeError(f"invalid PPM dimensions {w}x{h}")
    if maxval != 255:
        raise MediaDecodeError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raster = payload[pos:pos + need]
    if len(raster) != need:
        raise MediaDecodeError(
            f"PPM raster truncated: need {need} bytes, have {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# ----------------------------------------------------------------------
# WAV (RIFF/PCM)
# ----------------------------------------------------------------------


def decode_wav(payload: bytes):
    """PCM WAV → ``(sample_rate, (n_frames, channels) float32 in [-1, 1])``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise MediaDecodeError(f"fmt chunk truncated ({len(fmt)} bytes)")
    audio_format, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_format != 1:
        raise MediaDecodeError(f"unsupported WAV format code {audio_format}")
    if channels == 0:
        raise MediaDecodeError("WAV declares zero channels")
    if bits == 16:
        if len(data) % 2:
            data = data[:-1]  # truncated trailing byte
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise MediaDecodeError(f"unsupported WAV bit depth {bits}")
    n = len(samples) // channels
    return rate, samples[: n * channels].reshape(n, channels)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """``(n_frames, channels)`` float in [-1, 1] → 16-bit PCM WAV bytes."""
    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2").tobytes()
    channels = samples.shape[1]
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
