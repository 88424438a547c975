"""Pure-numpy media codecs — the REAL decode path for the multimodal
stage in an environment without image/audio libraries.

Three self-contained formats:

* **PPM (P6)** — binary Portable PixMap: ``P6 <w> <h> <maxval>`` header
  (ASCII, ``#`` comments allowed) followed by h·w·3 raw bytes.
* **PNG** — full spec subset: 8-bit depth, color types 0/2/3/4/6
  (palette expanded via PLTE), all five scanline filters, CRC-checked
  chunks; inflate via stdlib ``zlib``.
* **WAV (PCM)** — RIFF container with ``fmt `` (PCM, 8/16-bit) and
  ``data`` chunks.

All are decoded with ``struct``/``zlib``/numpy only — no external
dependency — and all have encoders so tests and the synthetic media generator can
produce real payloads deterministically.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaDecodeError(ValueError):
    pass


def _decode_guard(fn):
    """Corrupt streams raise all sorts of parse errors (int() on header
    garbage, zlib.error, struct.error, numpy reshape) — normalize every
    one to :class:`MediaDecodeError` so stream-level ``on_error="null"``
    policies catch a SINGLE type (r3: a malformed-header PPM leaked a
    raw ValueError past the Thumbnailer's null policy)."""
    import functools
    import zlib

    @functools.wraps(fn)
    def wrapped(payload, *a, **kw):
        try:
            return fn(payload, *a, **kw)
        except MediaDecodeError:
            raise
        except (ValueError, zlib.error, struct.error, IndexError,
                TypeError, OverflowError) as e:
            raise MediaDecodeError(
                f"{fn.__name__}: corrupt stream ({type(e).__name__}: {e})"
            ) from e

    return wrapped


# ----------------------------------------------------------------------
# PPM (P6)
# ----------------------------------------------------------------------


@_decode_guard
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
# PNG (stdlib zlib + numpy defiltering — no external image library)
# ----------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type (PNG spec §11.2.2); palette (3) handled via PLTE
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


@_decode_guard
def decode_png(payload: bytes, check_crc: bool = True) -> np.ndarray:
    """PNG → ``(h, w, channels)`` uint8 array.

    Pure stdlib ``zlib`` + numpy: supports bit depth 8, color types
    0/2/3/4/6 (palette expanded to RGB), non-interlaced, all five scanline
    filters (None/Sub/Up/Average/Paeth).  Raises
    :class:`MediaDecodeError` on malformed structure, bad CRC, or
    unsupported features — the corrupt-stream policy hook for
    ``on_error="null"`` upstream.
    """
    import zlib

    if payload[:8] != _PNG_SIG:
        raise MediaDecodeError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise MediaDecodeError("PNG chunk truncated")
        if check_crc:
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + length:pos + 12 + length].ljust(4, b"\0"))
            if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
                raise MediaDecodeError(
                    f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13:
        raise MediaDecodeError("PNG missing/short IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise MediaDecodeError(f"unsupported PNG bit depth {depth}")
    if color not in _PNG_CHANNELS:
        raise MediaDecodeError(f"unsupported PNG color type {color}")
    if comp != 0 or filt != 0:
        raise MediaDecodeError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise MediaDecodeError("interlaced PNG not supported")
    if not idat:
        raise MediaDecodeError("PNG missing IDAT")
    ch = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise MediaDecodeError(
            f"PNG raster size mismatch: expect {h * (stride + 1)}, got {len(raw)}")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = lines[:, 0]
    data = lines[:, 1:].astype(np.int32)  # headroom for filter arithmetic
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        row = data[y]
        if f == 0:  # None
            recon = row
        elif f == 1:  # Sub — prefix sum per byte lane, vectorized mod 256
            recon = row.reshape(-1, ch).cumsum(axis=0).reshape(-1) & 0xFF
        elif f == 2:  # Up
            recon = (row + prev) & 0xFF
        elif f == 3:  # Average — left-dependent, per-pixel walk
            recon = row.copy()
            for x in range(stride):
                left = recon[x - ch] if x >= ch else 0
                recon[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            recon = row.copy()
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                recon[x] = (row[x] + pred) & 0xFF
        else:
            raise MediaDecodeError(f"invalid PNG filter type {f}")
        recon = np.asarray(recon, dtype=np.int32)
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(h, w, ch)
    if color == 3:  # palette → RGB
        if plte is None or len(plte) % 3:
            raise MediaDecodeError("palette PNG missing/invalid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if idx.max(initial=0) >= len(pal):
            raise MediaDecodeError("PNG palette index out of range")
        img = pal[idx]
    return img


def encode_png(arr: np.ndarray) -> bytes:
    """``(h, w)`` or ``(h, w, {1,2,3,4})`` uint8 → PNG bytes (filter 0)."""
    import zlib

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError("encode_png expects (h, w, {1,2,3,4}) uint8")
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raster = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * ch)], axis=1
    ).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raster, 6)) + chunk(b"IEND", b""))


# ----------------------------------------------------------------------
# WAV (RIFF/PCM)
# ----------------------------------------------------------------------


@_decode_guard
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


# ----------------------------------------------------------------------
# PPMV — a self-contained video container for the sandbox: length-prefixed
# P6 PPM frames behind a tiny header.  Real decode + frame sampling with
# zero external dependencies (no mp4/h264 libs here); the Ray-side
# plumbing (binary column, small batches, frame-sample stage) is the same
# a production video pipeline needs.
# ----------------------------------------------------------------------

_PPMV_MAGIC = b"PPMV"


def encode_ppmv(frames, fps: int = 10) -> bytes:
    """List of ``(h, w, 3)`` uint8 frames → PPMV bytes."""
    if not frames:
        raise ValueError("encode_ppmv needs at least one frame")
    parts = [_PPMV_MAGIC, struct.pack("<II", len(frames), fps)]
    for f in frames:
        blob = encode_ppm(f)
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


@_decode_guard
def decode_ppmv_header(payload: bytes):
    """(n_frames, fps) without touching frame data."""
    if payload[:4] != _PPMV_MAGIC or len(payload) < 12:
        raise MediaDecodeError("not a PPMV payload")
    n, fps = struct.unpack("<II", payload[4:12])
    return n, fps


def iter_ppmv_frames(payload: bytes):
    """Yield ``(frame_index, (h, w, 3) uint8)`` lazily — frame sampling
    can skip-decode by seeking over the length prefixes."""
    n, _fps = decode_ppmv_header(payload)
    pos = 12
    for i in range(n):
        if pos + 4 > len(payload):
            raise MediaDecodeError(f"PPMV truncated at frame {i}")
        (ln,) = struct.unpack("<I", payload[pos:pos + 4])
        pos += 4
        blob = payload[pos:pos + ln]
        if len(blob) != ln:
            raise MediaDecodeError(f"PPMV frame {i} truncated")
        pos += ln
        yield i, decode_ppm(blob)


@_decode_guard
def sample_ppmv_frames(payload: bytes, every_k: int = 2):
    """Every k-th frame decoded; others are SKIPPED by seeking (the
    frame-sample primitive — decode cost scales with sampled frames)."""
    n, _fps = decode_ppmv_header(payload)
    pos = 12
    out = []
    for i in range(n):
        if pos + 4 > len(payload):
            raise MediaDecodeError(f"PPMV truncated at frame {i}")
        (ln,) = struct.unpack("<I", payload[pos:pos + 4])
        pos += 4
        if i % every_k == 0:
            blob = payload[pos:pos + ln]
            if len(blob) != ln:
                raise MediaDecodeError(f"PPMV frame {i} truncated")
            out.append((i, decode_ppm(blob)))
        pos += ln
    return out


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (H, W, C) -> (out_h, out_w, C).

    Index map ``src = (dst * in + in // 2) // out`` (pixel-center
    sampling in pure integer math — deterministic on every platform).
    """
    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h, dtype=np.int64) * h + h // 2) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w + w // 2) // out_w
    return arr[rows][:, cols]


def resize_box(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box (area-average) downscale (H, W, C) -> (out_h, out_w, C) in
    EXACT integer arithmetic: output pixel (r, c) is the floor-mean of
    the source block ``rows [r*h//out_h, (r+1)*h//out_h) × cols
    [c*w//out_w, (c+1)*w//out_w)`` — computed with one 2-D cumulative
    sum (no Python per-pixel loop), reproducible bit-for-bit anywhere.
    """
    h, w = arr.shape[0], arr.shape[1]
    if out_h > h or out_w > w:
        return resize_nearest(arr, out_h, out_w)
    a = arr.astype(np.int64)
    cs = a.cumsum(axis=0).cumsum(axis=1)
    cs = np.pad(cs, [(1, 0), (1, 0)] + [(0, 0)] * (a.ndim - 2))
    re = (np.arange(out_h + 1, dtype=np.int64) * h) // out_h
    ce = (np.arange(out_w + 1, dtype=np.int64) * w) // out_w
    blk = (cs[re[1:]][:, ce[1:]] - cs[re[:-1]][:, ce[1:]]
           - cs[re[1:]][:, ce[:-1]] + cs[re[:-1]][:, ce[:-1]])
    cnt = ((re[1:] - re[:-1])[:, None] * (ce[1:] - ce[:-1])[None, :])
    cnt = cnt.reshape(cnt.shape + (1,) * (a.ndim - 2))
    return (blk // cnt).astype(arr.dtype)
