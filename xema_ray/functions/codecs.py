"""Pure-numpy media codecs — the REAL decode path for the multimodal
stage in an environment without image/audio libraries.

Four self-contained formats (plus the PPMV video container below):

* **PPM (P6)** — binary Portable PixMap: ``P6 <w> <h> <maxval>`` header
  (ASCII, ``#`` comments allowed) followed by h·w·3 raw bytes.
* **PNG** — full spec subset: 8-bit depth, color types 0/2/3/4/6
  (palette expanded via PLTE), all five scanline filters, CRC-checked
  chunks; inflate via stdlib ``zlib``.
* **JPEG** — baseline sequential DCT (ITU-T T.81): huffman entropy
  decode from in-stream tables, dequantization, batched 8x8 IDCT,
  generic sampling factors (4:4:4/4:2:2/4:2:0), restart markers;
  encoder with the spec's Annex K example tables.
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


# ----------------------------------------------------------------------
# JPEG — baseline sequential AND progressive DCT (public JFIF /
# ITU-T T.81 spec), stdlib+numpy only: huffman entropy coding, dequant,
# 8x8 DCT/IDCT.  The decoder reads quant/huffman tables FROM the stream
# (any baseline/progressive encoder's output decodes, not just ours);
# the encoder writes the spec's Annex K example tables.  DCT/IDCT run
# batched over all blocks of an image via np.einsum (fixed summation
# order — no BLAS dispatch), so decode is deterministic across nodes.
# Supported: 8-bit baseline (SOF0/SOF1), 8-bit progressive (SOF2, r5 —
# spectral selection + successive approximation, DC/AC first and
# refinement scans, EOB runs), 1 or 3 components, sampling factors 1-2
# (4:4:4/4:2:2/4:2:0), restart markers.  Rejected with
# MediaDecodeError: arithmetic coding, 12-bit, hierarchical — the
# corrupt/unsupported stream hook for on_error="null" upstream.
# ----------------------------------------------------------------------


def _jpeg_zigzag() -> np.ndarray:
    """Zigzag scan order: position k in the scan -> row-major index."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()
        order += [r * 8 + c for r, c in diag]
    return np.array(order, dtype=np.int64)


_JZZ = _jpeg_zigzag()
_JUNZZ = np.argsort(_JZZ)  # row-major index -> zigzag position

# Annex K example quantization tables (row-major)
_JQ_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_JQ_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K typical huffman tables: (bits[1..16], values)
_JH_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
_JH_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
_JH_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_JH_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _jpeg_dct_matrix() -> np.ndarray:
    k = np.arange(8, dtype=np.float64)[:, None]
    n = np.arange(8, dtype=np.float64)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2.0)
    return m


_JDCT_M = _jpeg_dct_matrix()


def _jpeg_quality_tables(quality: int):
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qy = np.clip((_JQ_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((_JQ_CHROMA * scale + 50) // 100, 1, 255)
    return qy, qc


def _huff_encode_table(bits, values):
    """symbol -> (code, length) dict from a (bits, values) spec."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_lut(bits, values):
    """Full 16-bit-prefix lookup: two arrays (symbol int16, length uint8).
    length 0 marks an invalid prefix."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = values[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, length: int):
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.cnt += length
        while self.cnt >= 8:
            self.cnt -= 8
            b = (self.buf >> self.cnt) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.buf &= (1 << self.cnt) - 1

    def flush(self):
        if self.cnt:
            pad = 8 - self.cnt
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _jpeg_magnitude(v: int):
    """(category size, extra-bits value) for a DC diff / AC coefficient."""
    a = -v if v < 0 else v
    size = int(a).bit_length()
    if v < 0:
        v += (1 << size) - 1
    return size, v


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane -> (n_blocks, 8, 8) row-major blocks."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(bh, 8, bw, 8).swapaxes(1, 2).reshape(-1, 8, 8)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad up to (mh, mw)."""
    return np.pad(plane, ((0, mh - plane.shape[0]), (0, mw - plane.shape[1])),
                  mode="edge")


def _jpeg_plan(arr: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: planes -> DCT -> quantized zigzag
    blocks in the padded MCU grid.  Returns ``(gray, comps, comp_blocks,
    qy, qc, h, w, mcols, mrows)`` where ``comp_blocks`` rows are
    ``(ch, cv, bw_, zz)``."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w, 3) or (h, w) uint8")
    h, w = arr.shape[0], arr.shape[1]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    samp = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}.get(subsampling)
    if samp is None:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hs, vs = (1, 1) if gray else samp
    qy, qc = _jpeg_quality_tables(quality)

    # --- planes -------------------------------------------------------
    if gray:
        comps = [(1, 1, 1, 0, arr.astype(np.float64))]
    else:
        ycc = _rgb_to_ycbcr(arr)
        # chroma box-downsample by the sampling factors (exact mean)
        cpl = []
        for ci in (1, 2):
            p = ycc[..., ci]
            if hs > 1 or vs > 1:
                ph = _pad_to(p, -(-h // vs) * vs, -(-w // hs) * hs)
                p = ph.reshape(ph.shape[0] // vs, vs,
                               ph.shape[1] // hs, hs).mean(axis=(1, 3))
                p = np.round(p)
            cpl.append(p)
        comps = [(1, hs, vs, 0, ycc[..., 0]),
                 (2, 1, 1, 1, cpl[0]), (3, 1, 1, 1, cpl[1])]
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcols, mrows = -(-w // mcu_w), -(-h // mcu_h)

    # --- per-component quantized zigzag blocks in MCU order ------------
    comp_blocks = []
    for (_cid, ch, cv, qid, plane) in comps:
        bw_, bh_ = mcols * ch, mrows * cv
        plane = _pad_to(plane, bh_ * 8, bw_ * 8)
        blocks = _plane_blocks(plane) - 128.0  # (bh_*bw_, 8, 8) row-major
        f = np.einsum("ij,bjk,lk->bil", _JDCT_M, blocks, _JDCT_M)
        q = (qy if qid == 0 else qc).reshape(8, 8).astype(np.float64)
        coef = np.round(f / q).astype(np.int64)
        zz = coef.reshape(-1, 64)[:, _JZZ]
        comp_blocks.append((ch, cv, bw_, zz))
    return gray, comps, comp_blocks, qy, qc, h, w, mcols, mrows


def _jpeg_headers(gray, comps, qy, qc, h, w, sof_marker: int,
                  restart_interval: int = 0,
                  huff_specs=None) -> bytearray:
    """SOI..DHT header bytes shared by the sequential and progressive
    encoders (the scan headers + entropy data follow)."""

    def marker(code: int, body: bytes) -> bytes:
        return struct.pack(">HH", code, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")  # SOI
    out += marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += marker(0xFFDB, b"\x00" + bytes(qy[_JZZ].astype(np.uint8)))
    if not gray:
        out += marker(0xFFDB, b"\x01" + bytes(qc[_JZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for (cid, ch, cv, qid, _p) in comps:
        sof += bytes([cid, (ch << 4) | cv, qid])
    out += marker(sof_marker, sof)
    if huff_specs is None:
        huff_specs = ((0, 0, _JH_DC_LUMA), (1, 0, _JH_AC_LUMA),
                      (0, 1, _JH_DC_CHROMA), (1, 1, _JH_AC_CHROMA))
    for tc, th, (bits, vals) in huff_specs:
        if gray and th == 1:
            continue
        out += marker(0xFFC4, bytes([(tc << 4) | th]) + bytes(bits)
                      + bytes(vals))
    if restart_interval:
        out += marker(0xFFDD, struct.pack(">H", restart_interval))
    return out


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """``(h, w, 3)`` RGB or ``(h, w)`` grayscale uint8 -> baseline JFIF
    bytes.  ``subsampling``: '444', '422' or '420' (3-component only)."""
    gray, comps, comp_blocks, qy, qc, h, w, mcols, mrows = \
        _jpeg_plan(arr, quality, subsampling)

    # --- entropy coding -------------------------------------------------
    enc_dc = [_huff_encode_table(*_JH_DC_LUMA),
              _huff_encode_table(*_JH_DC_CHROMA)]
    enc_ac = [_huff_encode_table(*_JH_AC_LUMA),
              _huff_encode_table(*_JH_AC_CHROMA)]
    bwio = _JpegBitWriter()
    prev_dc = [0] * len(comps)
    segments = []
    mcu_in_seg = 0
    for mr in range(mrows):
        for mc in range(mcols):
            if restart_interval and mcu_in_seg == restart_interval:
                bwio.flush()
                segments.append(bytes(bwio.out))
                bwio = _JpegBitWriter()
                prev_dc = [0] * len(comps)
                mcu_in_seg = 0
            for ci, (ch, cv, bw_, zz) in enumerate(comp_blocks):
                tid = 0 if ci == 0 else 1
                dct, act = enc_dc[tid], enc_ac[tid]
                for v in range(cv):
                    for hh in range(ch):
                        bi = (mr * cv + v) * bw_ + (mc * ch + hh)
                        blk = zz[bi]
                        diff = int(blk[0]) - prev_dc[ci]
                        prev_dc[ci] = int(blk[0])
                        size, bitsv = _jpeg_magnitude(diff)
                        code, ln = dct[size]
                        bwio.write(code, ln)
                        if size:
                            bwio.write(bitsv, size)
                        nz = np.flatnonzero(blk[1:])
                        run = 0
                        last = 0
                        for p in nz:
                            run = int(p) - last
                            last = int(p) + 1
                            while run > 15:
                                code, ln = act[0xF0]
                                bwio.write(code, ln)
                                run -= 16
                            size, bitsv = _jpeg_magnitude(int(blk[1 + p]))
                            code, ln = act[(run << 4) | size]
                            bwio.write(code, ln)
                            bwio.write(bitsv, size)
                        if last < 63:
                            code, ln = act[0x00]  # EOB
                            bwio.write(code, ln)
            mcu_in_seg += 1
    bwio.flush()
    segments.append(bytes(bwio.out))
    scan = bytearray()
    for i, seg in enumerate(segments):
        scan += seg
        if i < len(segments) - 1:
            scan += bytes([0xFF, 0xD0 + (i % 8)])

    # --- headers --------------------------------------------------------
    out = _jpeg_headers(gray, comps, qy, qc, h, w, 0xFFC0,
                        restart_interval)
    sos = bytes([len(comps)])
    for ci, (cid, *_rest) in enumerate(comps):
        tid = 0 if ci == 0 else 1
        sos += bytes([cid, (tid << 4) | tid])
    sos += b"\x00\x3F\x00"
    out += struct.pack(">HH", 0xFFDA, len(sos) + 2) + sos
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _jpeg_default_prog_scans(gray: bool):
    """libjpeg-style default progressive scan script:
    (component indices, Ss, Se, Ah, Al)."""
    if gray:
        return [([0], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0)]
    return [([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0)]


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsampling: str = "444",
                            scans=None) -> bytes:
    """``(h, w, 3)`` RGB or ``(h, w)`` grayscale uint8 -> PROGRESSIVE
    (SOF2) JFIF bytes: spectral selection + successive approximation
    with a libjpeg-style default scan script (r4 verdict item 7).

    Same quantized coefficients as :func:`encode_jpeg` at the same
    quality/subsampling, so the decoded pixels are BIT-IDENTICAL to the
    baseline encoding's decode — the differential the tests pin.  EOB
    runs are emitted with length 1 only (symbol 0x00), which keeps the
    spec's Annex K example AC tables sufficient (they carry no EOBn>1
    symbols); the decoder handles general EOB runs.

    ``scans``: optional explicit script as a list of
    ``(component_indices, Ss, Se, Ah, Al)`` tuples; successive
    approximation must refine one bit at a time (Ah == Al + 1).
    """
    gray, comps, comp_blocks, qy, qc, h, w, mcols, mrows = \
        _jpeg_plan(arr, quality, subsampling)
    if scans is None:
        scans = _jpeg_default_prog_scans(gray)

    enc_dc = [_huff_encode_table(*_JH_DC_LUMA),
              _huff_encode_table(*_JH_DC_CHROMA)]
    enc_ac = [_huff_encode_table(*_JH_AC_LUMA),
              _huff_encode_table(*_JH_AC_CHROMA)]

    def used_grid(ci):
        ch, cv, _bw_, _zz = comp_blocks[ci]
        max_h = max(c[0] for c in comp_blocks)
        max_v = max(c[1] for c in comp_blocks)
        return (-(-w * ch // (8 * max_h)), -(-h * cv // (8 * max_v)))

    out = _jpeg_headers(gray, comps, qy, qc, h, w, 0xFFC2)

    for (cis, ss, se, ah, al) in scans:
        if ss == 0 and se != 0:
            raise ValueError("a scan may not mix DC and AC bands")
        if ah not in (0, al + 1):
            raise ValueError("successive approximation must step by 1 bit")
        bwio = _JpegBitWriter()
        if ss == 0:
            interleaved = len(cis) > 1
            prev_dc = [0] * len(cis)
            if interleaved:
                for mcu in range(mrows * mcols):
                    mr, mc = divmod(mcu, mcols)
                    for si, ci in enumerate(cis):
                        ch, cv, bw_, zz = comp_blocks[ci]
                        tid = 0 if ci == 0 else 1
                        for v in range(cv):
                            for hh in range(ch):
                                bi = (mr * cv + v) * bw_ + (mc * ch + hh)
                                dc = int(zz[bi][0]) >> al  # arithmetic
                                if ah == 0:
                                    diff = dc - prev_dc[si]
                                    prev_dc[si] = dc
                                    size, bits = _jpeg_magnitude(diff)
                                    code, ln = enc_dc[tid][size]
                                    bwio.write(code, ln)
                                    if size:
                                        bwio.write(bits, size)
                                else:
                                    bwio.write(dc & 1, 1)
            else:
                ci = cis[0]
                ch, cv, bw_, zz = comp_blocks[ci]
                tid = 0 if ci == 0 else 1
                uw, uh = used_grid(ci)
                for u in range(uw * uh):
                    br, bc = divmod(u, uw)
                    dc = int(zz[br * bw_ + bc][0]) >> al
                    if ah == 0:
                        diff = dc - prev_dc[0]
                        prev_dc[0] = dc
                        size, bits = _jpeg_magnitude(diff)
                        code, ln = enc_dc[tid][size]
                        bwio.write(code, ln)
                        if size:
                            bwio.write(bits, size)
                    else:
                        bwio.write(dc & 1, 1)
        else:
            if len(cis) != 1:
                raise ValueError("AC scans must be single-component")
            ci = cis[0]
            ch, cv, bw_, zz = comp_blocks[ci]
            act = enc_ac[0 if ci == 0 else 1]
            uw, uh = used_grid(ci)
            for u in range(uw * uh):
                br, bc = divmod(u, uw)
                blk = zz[br * bw_ + bc]
                if ah == 0:
                    # AC first scan: code sign * (|c| >> al), single EOBs
                    run = 0
                    emitted_to = ss - 1
                    for k in range(ss, se + 1):
                        c = int(blk[k])
                        v = (abs(c) >> al)
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = act[0xF0]
                            bwio.write(code, ln)
                            run -= 16
                        if c < 0:
                            v = -v
                        size, bits = _jpeg_magnitude(v)
                        code, ln = act[(run << 4) | size]
                        bwio.write(code, ln)
                        bwio.write(bits, size)
                        run = 0
                        emitted_to = k
                    if emitted_to < se:
                        code, ln = act[0x00]  # EOB (run length 1)
                        bwio.write(code, ln)
                else:
                    # AC refinement scan (T.81 G.1.2.3): newly-significant
                    # coefficients code (run << 4) | 1 + a sign bit; the
                    # already-nonzero ones emit one correction bit each,
                    # buffered and flushed after the next coded symbol
                    p_absv = [abs(int(blk[k])) >> al for k in
                              range(ss, se + 1)]
                    eob = -1  # index of last NEWLY-significant coeff
                    for j, v in enumerate(p_absv):
                        if v == 1:
                            eob = j
                    run = 0
                    pending: list = []
                    for j, v in enumerate(p_absv):
                        c = int(blk[ss + j])
                        if v == 0:
                            run += 1
                            continue
                        # ZRL fires at ANY nonzero while newly-
                        # significant coeffs remain (j <= eob) — the
                        # buffered correction bits flushed here are
                        # exactly the ones the decoder's skip walk
                        # consumes before its 16th zero (libjpeg order)
                        while run > 15 and j <= eob:
                            code, ln = act[0xF0]
                            bwio.write(code, ln)
                            run -= 16
                            for b in pending:
                                bwio.write(b, 1)
                            pending = []
                        if v > 1:
                            pending.append(v & 1)
                            continue
                        # newly significant (v == 1)
                        code, ln = act[(run << 4) | 1]
                        bwio.write(code, ln)
                        bwio.write(1 if c > 0 else 0, 1)
                        for b in pending:
                            bwio.write(b, 1)
                        pending = []
                        run = 0
                    if run > 0 or pending or eob < len(p_absv) - 1:
                        code, ln = act[0x00]  # EOB (run length 1)
                        bwio.write(code, ln)
                        for b in pending:
                            bwio.write(b, 1)
        bwio.flush()
        sos = bytes([len(cis)])
        for ci in cis:
            cid = comps[ci][0]
            tid = 0 if ci == 0 else 1
            sos += bytes([cid, (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += struct.pack(">HH", 0xFFDA, len(sos) + 2) + sos
        out += bytes(bwio.out)
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """Bit reader over one unstuffed entropy segment; reads past the end
    return 0-bits (spec padding) but more than 8 bytes of overrun means
    the scan was truncated."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.cnt = 0

    def _fill(self, n: int):
        while self.cnt < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            if self.pos >= len(self.data) + 8:
                raise MediaDecodeError("JPEG scan truncated")
            self.pos += 1
            self.buf = (self.buf << 8) | b
            self.cnt += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.buf >> (self.cnt - 16)) & 0xFFFF

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.cnt -= n
        v = (self.buf >> self.cnt) & ((1 << n) - 1)
        self.buf &= (1 << self.cnt) - 1
        return v


def _jpeg_extend(v: int, size: int) -> int:
    if size and v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _split_entropy(data: bytes, start: int):
    """Split one scan's entropy-coded data on restart markers, unstuff
    0xFF00.  Returns ``(segments, end_pos)`` where ``end_pos`` is the
    offset of the terminating marker's 0xFF (or len(data))."""
    segs = []
    seg0 = start
    p = start
    nd = len(data)
    while True:
        ff = data.find(b"\xFF", p)
        if ff < 0 or ff + 1 >= nd:
            segs.append(data[seg0:nd])
            end = nd
            break
        nxt = data[ff + 1]
        if nxt == 0x00:
            p = ff + 2
            continue
        if nxt == 0xFF:  # fill byte before a marker
            p = ff + 1
            continue
        if 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(data[seg0:ff])
            seg0 = ff + 2
            p = ff + 2
            continue
        segs.append(data[seg0:ff])  # EOI or next marker ends the scan
        end = ff
        break
    return [s.replace(b"\xFF\x00", b"\xFF") for s in segs], end


def _jpeg_reconstruct(coef, comp_meta, h, w, mcols, mrows,
                      max_h, max_v):
    """Dequant + batched IDCT per component, assemble, upsample, crop —
    the shared tail of the sequential and progressive decoders.
    ``comp_meta``: [(ch, cv, qtab zigzag)] aligned with ``coef``."""
    planes = []
    for ci, (ch, cv, q) in enumerate(comp_meta):
        dq = (coef[ci] * q[None, :])[:, _JUNZZ].reshape(-1, 8, 8) \
            .astype(np.float64)
        blocks = np.einsum("ji,bjk,kl->bil", _JDCT_M, dq, _JDCT_M) + 128.0
        bw_, bh_ = mcols * ch, mrows * cv
        plane = blocks.reshape(bh_, bw_, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh_ * 8, bw_ * 8)
        if ch != max_h or cv != max_v:
            if max_h % ch or max_v % cv:
                raise MediaDecodeError("non-integral sampling ratio")
            plane = np.repeat(np.repeat(plane, max_v // cv, axis=0),
                              max_h // ch, axis=1)
        planes.append(plane[:h, :w])
    out = np.clip(np.round(np.stack(planes, axis=-1)), 0, 255)
    if len(planes) == 1:
        return out[:, :, 0].astype(np.uint8)
    if len(planes) != 3:
        raise MediaDecodeError(f"unsupported component count {len(planes)}")
    y, cb, cr = out[..., 0], out[..., 1] - 128.0, out[..., 2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136286 * cb - 0.714136286 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _jpeg_decode_sequential(scan, order, coef, bws, mcols, mrows):
    """Baseline entropy decode of the single interleaved scan into the
    zigzag coefficient arrays (unchanged r4 logic)."""
    segs, restart = scan["segs"], scan["restart"]
    n_mcu = mrows * mcols
    mcu = 0
    for seg in segs:
        rd = _JpegBitReader(seg)
        prev_dc = [0] * len(order)
        limit = min(n_mcu, mcu + restart) if restart else n_mcu
        while mcu < limit:
            mr, mc = divmod(mcu, mcols)
            for ci, (_cid, ch, cv, _q, (dsym, dln), (asym, aln)) \
                    in enumerate(order):
                for v in range(cv):
                    for hh in range(ch):
                        vec = coef[ci][(mr * cv + v) * bws[ci]
                                       + (mc * ch + hh)]
                        pk = rd.peek16()
                        ln_ = int(dln[pk])
                        if ln_ == 0:
                            raise MediaDecodeError("bad huffman code (DC)")
                        rd.take(ln_)
                        size = int(dsym[pk])
                        diff = _jpeg_extend(rd.take(size), size)
                        prev_dc[ci] += diff
                        vec[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            pk = rd.peek16()
                            ln_ = int(aln[pk])
                            if ln_ == 0:
                                raise MediaDecodeError(
                                    "bad huffman code (AC)")
                            rd.take(ln_)
                            rs = int(asym[pk])
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise MediaDecodeError(
                                    "AC coefficient index overflow")
                            vec[k] = _jpeg_extend(rd.take(size), size)
                            k += 1
            mcu += 1
        if mcu >= n_mcu:
            break
    if mcu < n_mcu:
        raise MediaDecodeError(
            f"JPEG scan ended after {mcu}/{n_mcu} MCUs")


def _huff_read(rd, sym, ln, what: str) -> int:
    pk = rd.peek16()
    ln_ = int(ln[pk])
    if ln_ == 0:
        raise MediaDecodeError(f"bad huffman code ({what})")
    rd.take(ln_)
    return int(sym[pk])


def _jpeg_decode_progressive_scan(scan, comps_meta, coef, bws,
                                  mcols, mrows, max_h, max_v, h, w):
    """Decode ONE progressive scan (T.81 G.2) into the coefficient
    arrays.  ``scan['comps']``: list of (ci, dc_lut|None, ac_lut|None);
    DC scans (Ss=0) may be interleaved; AC scans are single-component
    over the component's OWN block grid (used blocks only)."""
    comps_s = scan["comps"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    segs, restart = scan["segs"], scan["restart"]
    if ss == 0:
        if se != 0:
            raise MediaDecodeError(
                "progressive scan mixes DC and AC bands")
        dc_scan = True
    else:
        if len(comps_s) != 1:
            raise MediaDecodeError("interleaved AC progressive scan")
        if not 1 <= ss <= se <= 63:
            raise MediaDecodeError("bad spectral selection band")
        dc_scan = False

    def used_grid(ci):
        ch, cv, _ = comps_meta[ci]
        cw = -(-w * ch // (8 * max_h))   # ceil(comp_width / 8)
        chh = -(-h * cv // (8 * max_v))
        return cw, chh

    interleaved = dc_scan and len(comps_s) > 1
    if interleaved:
        units = mrows * mcols
    else:
        ci0 = comps_s[0][0]
        uw, uh = used_grid(ci0)
        units = uw * uh

    p1 = 1 << al
    unit = 0
    for seg in segs:
        rd = _JpegBitReader(seg)
        prev_dc = [0] * len(comps_s)
        eobrun = 0
        limit = min(units, unit + restart) if restart else units
        while unit < limit:
            if dc_scan:
                if interleaved:
                    mr, mc = divmod(unit, mcols)
                    for si, (ci, dlut, _alut) in enumerate(comps_s):
                        ch, cv, _ = comps_meta[ci]
                        for v in range(cv):
                            for hh in range(ch):
                                vec = coef[ci][(mr * cv + v) * bws[ci]
                                               + (mc * ch + hh)]
                                if ah == 0:
                                    size = _huff_read(rd, *dlut, "DC")
                                    prev_dc[si] += _jpeg_extend(
                                        rd.take(size), size)
                                    vec[0] = prev_dc[si] << al
                                elif rd.take(1):
                                    vec[0] |= p1
                else:
                    ci, dlut, _alut = comps_s[0]
                    uw, _uh = used_grid(ci)
                    br, bc = divmod(unit, uw)
                    vec = coef[ci][br * bws[ci] + bc]
                    if ah == 0:
                        size = _huff_read(rd, *dlut, "DC")
                        prev_dc[0] += _jpeg_extend(rd.take(size), size)
                        vec[0] = prev_dc[0] << al
                    elif rd.take(1):
                        vec[0] |= p1
            else:
                ci, _dlut, alut = comps_s[0]
                uw, _uh = used_grid(ci)
                br, bc = divmod(unit, uw)
                vec = coef[ci][br * bws[ci] + bc]
                if ah == 0:
                    # AC first scan (with EOB runs)
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            rs = _huff_read(rd, *alut, "AC")
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1 + \
                                    (rd.take(r) if r else 0)
                                break
                            k += r
                            if k > se:
                                raise MediaDecodeError(
                                    "AC band index overflow")
                            vec[k] = _jpeg_extend(rd.take(s), s) << al
                            k += 1
                else:
                    # AC refinement scan (T.81 G.1.2.3 / libjpeg shape)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _huff_read(rd, *alut, "AC refine")
                            r, s = rs >> 4, rs & 0xF
                            newval = 0
                            if s == 0:
                                if r < 15:
                                    # includes the CURRENT block: its
                                    # band remainder still refines below
                                    eobrun = (1 << r) + \
                                        (rd.take(r) if r else 0)
                                    break
                                # ZRL: skip 16 zero-history coeffs
                            else:
                                if s != 1:
                                    raise MediaDecodeError(
                                        "bad refinement size")
                                newval = p1 if rd.take(1) else -p1
                            while k <= se:
                                v0 = vec[k]
                                if v0 != 0:
                                    if rd.take(1) and not (v0 & p1):
                                        vec[k] = v0 + (p1 if v0 > 0
                                                       else -p1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval:
                                if k > se:
                                    raise MediaDecodeError(
                                        "refinement placement overflow")
                                vec[k] = newval
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            v0 = vec[k]
                            if v0 != 0 and rd.take(1) and not (v0 & p1):
                                vec[k] = v0 + (p1 if v0 > 0 else -p1)
                            k += 1
                        eobrun -= 1
            unit += 1
        if unit >= units:
            break
    if unit < units:
        raise MediaDecodeError(
            f"progressive scan ended after {unit}/{units} units")


@_decode_guard
def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF -> ``(h, w, 3)`` uint8 (or ``(h, w)`` grayscale).  Baseline
    sequential (SOF0/SOF1) and progressive (SOF2: spectral selection +
    successive approximation, EOB runs, restarts)."""
    if payload[:2] != b"\xFF\xD8":
        raise MediaDecodeError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict = {}
    hufs: dict = {}
    sof = None
    progressive = False
    restart = 0
    scans: list = []
    nd = len(payload)
    while pos + 2 <= nd:
        if payload[pos] != 0xFF:
            raise MediaDecodeError("JPEG marker desync")
        m = payload[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xD9:  # EOI
            break
        if pos + 4 > nd:
            raise MediaDecodeError("JPEG segment truncated")
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise MediaDecodeError("JPEG segment truncated")
        if m == 0xDB:  # DQT (possibly several tables per segment)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq != 0:
                    raise MediaDecodeError("16-bit quant tables unsupported")
                if len(b) < 65:
                    raise MediaDecodeError("DQT truncated")
                qtabs[tq] = np.frombuffer(b[1:65], np.uint8) \
                    .astype(np.int64)  # zigzag order
                b = b[65:]
        elif m == 0xC4:  # DHT
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0xF
                if len(b) < 17:
                    raise MediaDecodeError("DHT truncated")
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17:17 + n])
                if len(vals) != n:
                    raise MediaDecodeError("DHT values truncated")
                hufs[(tc, th)] = _huff_decode_lut(bits, vals)
                b = b[17 + n:]
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential), SOF2 (prog)
            if sof is not None:
                raise MediaDecodeError("multiple SOF markers")
            progressive = m == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise MediaDecodeError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, sf, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, sf >> 4, sf & 0xF, tq))
            sof = (h, w, comps)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(
                "only baseline or progressive DCT JPEG is supported "
                f"(SOF marker 0xFF{m:02X})")
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:  # SOS
            if sof is None:
                raise MediaDecodeError("SOS before SOF")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise MediaDecodeError("SOS truncated")
            scomps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                       body[2 + 2 * i] & 0xF) for i in range(ns)]
            ss_, se_, a_ = body[1 + 2 * ns:4 + 2 * ns]
            segs, end = _split_entropy(payload, pos + 2 + ln)
            scans.append({"scomps": scomps, "ss": ss_, "se": se_,
                          "ah": a_ >> 4, "al": a_ & 0xF, "segs": segs,
                          "restart": restart,
                          "hufs": dict(hufs)})
            pos = end
            continue
        pos += 2 + ln
    if sof is None or not scans:
        raise MediaDecodeError("JPEG missing SOF/SOS")
    h, w, comps = sof
    if h == 0 or w == 0:
        raise MediaDecodeError("JPEG zero dimensions")
    for (_cid, ch, cv, _tq) in comps:
        if ch not in (1, 2, 4) or cv not in (1, 2, 4):
            raise MediaDecodeError(f"unsupported sampling {ch}x{cv}")

    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcols, mrows = -(-w // (8 * max_h)), -(-h // (8 * max_v))
    cid_to_ci = {cid: i for i, (cid, _ch, _cv, _tq) in enumerate(comps)}
    comps_meta = []
    coef = []
    bws = []
    for (_cid, ch, cv, tq) in comps:
        if tq not in qtabs:
            raise MediaDecodeError(f"missing quant table {tq}")
        comps_meta.append((ch, cv, qtabs[tq]))
        bw_, bh_ = mcols * ch, mrows * cv
        coef.append(np.zeros((bh_ * bw_, 64), dtype=np.int64))
        bws.append(bw_)

    if not progressive:
        if len(scans) != 1:
            raise MediaDecodeError(
                "multi-scan sequential JPEG is unsupported")
        scan = scans[0]
        order = []
        for (cid, dtab, atab) in scan["scomps"]:
            if cid not in cid_to_ci:
                raise MediaDecodeError(
                    f"SOS references unknown component {cid}")
            ci = cid_to_ci[cid]
            ch, cv, q = comps_meta[ci]
            hfs = scan["hufs"]
            if (0, dtab) not in hfs or (1, atab) not in hfs:
                raise MediaDecodeError("missing huffman table")
            order.append((cid, ch, cv, q, hfs[(0, dtab)],
                          hfs[(1, atab)]))
        _jpeg_decode_sequential(scan, order, coef, bws, mcols, mrows)
    else:
        for scan in scans:
            comps_s = []
            for (cid, dtab, atab) in scan["scomps"]:
                if cid not in cid_to_ci:
                    raise MediaDecodeError(
                        f"SOS references unknown component {cid}")
                ci = cid_to_ci[cid]
                hfs = scan["hufs"]
                dc_lut = ac_lut = None
                if scan["ss"] == 0 and scan["ah"] == 0:
                    if (0, dtab) not in hfs:
                        raise MediaDecodeError("missing huffman table")
                    dc_lut = hfs[(0, dtab)]
                if scan["ss"] > 0:
                    if (1, atab) not in hfs:
                        raise MediaDecodeError("missing huffman table")
                    ac_lut = hfs[(1, atab)]
                comps_s.append((ci, dc_lut, ac_lut))
            scan["comps"] = comps_s
            _jpeg_decode_progressive_scan(scan, comps_meta, coef, bws,
                                          mcols, mrows, max_h, max_v,
                                          h, w)

    return _jpeg_reconstruct(coef, comps_meta, h, w, mcols, mrows,
                             max_h, max_v)
