"""Multimodal column stages — image/audio/video as opaque ``binary``
columns with typed metadata.

Decode is REAL for the self-contained formats this environment can parse
without external libraries: **PPM (P6) images**, **PNG images** (stdlib
zlib + numpy defiltering), **baseline AND progressive JPEG** (huffman +
dequant + IDCT per the public ITU-T T.81 spec; progressive scans with
spectral selection + successive approximation, r5) and **PCM WAV audio**
(pure-numpy codecs in :mod:`xema_ray.functions.codecs`).  Other mimes
(mp4 — codecs not present in this sandbox) fall back to a
deterministic byte-derived stub when ``decode_stub=True`` (default) or
raise ``NotImplementedError`` when ``decode_stub=False``.  Everything
Ray-side is real and tested: schema (binary + metadata), small
``batch_size`` for wide binary rows, actor-pool stage shape with
per-actor codec init, and the fixed-width ``list<float>`` output layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthetic_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic media rows: real PPM, PNG and baseline JPEG images,
    PCM WAV clips and PPMV video clips — ALL decoded by real codecs
    (video frames are SAMPLED; JPEG alternates 4:4:4 and 4:2:0
    subsampling to exercise the generic MCU path)."""
    from xema_ray.functions.codecs import encode_ppm, encode_wav

    rng = np.random.default_rng(seed)
    payloads, mimes, widths, heights, durations = [], [], [], [], []
    for i in range(n):
        kind = i % 5
        if kind == 0:  # real PPM gradient image
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_ppm(img))
            mimes.append("image/x-portable-pixmap")
            widths.append(w); heights.append(h); durations.append(0)
        elif kind == 3:  # real PNG image (zlib+numpy codec)
            from xema_ray.functions.codecs import encode_png

            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_png(img))
            mimes.append("image/png")
            widths.append(w); heights.append(h); durations.append(0)
        elif kind == 4:  # real PPMV video clip (length-prefixed PPM frames)
            from xema_ray.functions.codecs import encode_ppmv

            w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            n_frames = int(rng.integers(4, 12))
            frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                      for _ in range(n_frames)]
            payloads.append(encode_ppmv(frames, fps=10))
            mimes.append("video/x-ppmv")
            widths.append(w); heights.append(h)
            durations.append(int(1000 * n_frames / 10))
        elif kind == 1:  # real PCM WAV sine clip
            rate = 8000
            t = np.arange(int(rng.integers(400, 2000))) / rate
            tone = np.sin(2 * np.pi * float(rng.integers(100, 1000)) * t)
            payloads.append(encode_wav(rate, tone))
            mimes.append("audio/wav")
            widths.append(0); heights.append(0)
            durations.append(int(1000 * len(t) / rate))
        else:  # real JPEG (our own T.81 codec); every third one is
            # PROGRESSIVE (SOF2, r5) — same quantized coefficients, so
            # decoded pixels and the pinned th_sum oracle are unchanged
            from xema_ray.functions.codecs import (encode_jpeg,
                                                   encode_jpeg_progressive)

            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            ss = "420" if (i // 5) % 2 else "444"
            enc = encode_jpeg_progressive if (i // 5) % 3 == 2 \
                else encode_jpeg
            payloads.append(enc(img, quality=85, subsampling=ss))
            mimes.append("image/jpeg")
            widths.append(w); heights.append(h); durations.append(0)
    return pa.table({
        "media_id": pa.array([f"m-{i:08d}" for i in range(n)], type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(mimes, type=pa.string()),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "duration_ms": pa.array(durations, type=pa.int32()),
    })


class MediaFeatureExtractor:
    """Actor-pool stage: decode → feature-extract → fixed-width embedding.

    Real deployments load the codec/model in ``__init__`` (once per actor);
    here the stub derives a deterministic 64-dim feature from payload bytes
    so the plumbing (schema, batch size, actor signature, output layout) is
    fully exercised.  Use small ``batch_size`` (≤256) — payloads are wide.
    """

    FEATURE_DIM = 64

    def __init__(self, decode_stub: bool = True, on_error: str = "raise"):
        # codec dispatch table built once per actor (a real deployment
        # loads its model/codec handles here the same way)
        from xema_ray.functions import codecs

        self.decode_stub = decode_stub
        # "raise" fails the batch on a malformed payload; "null" emits a
        # null feature row and keeps streaming — at corpus scale one corrupt
        # blob must not abort the job
        self.on_error = on_error
        self.codecs = codecs

    def _decode(self, payload: bytes, mime: str) -> np.ndarray:
        if mime == "image/x-portable-pixmap":
            # REAL image decode: pixels as float signal
            return self.codecs.decode_ppm(payload).astype(np.float32).reshape(-1)
        if mime == "image/png":
            # REAL image decode (stdlib zlib + numpy defiltering)
            return self.codecs.decode_png(payload).astype(np.float32).reshape(-1)
        if mime == "image/jpeg":
            # REAL image decode (baseline T.81: huffman+dequant+IDCT)
            return self.codecs.decode_jpeg(payload).astype(
                np.float32).reshape(-1)
        if mime == "video/x-ppmv":
            # REAL video decode with frame SAMPLING: every 2nd frame is
            # decoded (skip-seek over the others), mean-pooled per pixel
            sampled = self.codecs.sample_ppmv_frames(payload, every_k=2)
            if not sampled:
                raise self.codecs.MediaDecodeError("PPMV with no frames")
            pooled = np.mean([f.astype(np.float32)
                              for _, f in sampled], axis=0)
            return pooled.reshape(-1)
        if mime == "audio/wav":
            # REAL audio decode: mono-mixed samples
            _, samples = self.codecs.decode_wav(payload)
            return samples.mean(axis=1).astype(np.float32)
        if not self.decode_stub:
            raise NotImplementedError(
                f"no codec for {mime!r} in this environment (mp4 "
                "libraries absent); run with decode_stub=True"
            )
        arr = np.frombuffer(payload[: 64 * 64], dtype=np.uint8)
        return arr.astype(np.float32)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from xema_ray.functions.codecs import MediaDecodeError

        feats = np.zeros((tbl.num_rows, self.FEATURE_DIM), dtype=np.float32)
        failed = np.zeros(tbl.num_rows, dtype=bool)
        payloads = tbl["payload"].to_pylist()
        mimes = tbl["mime"].to_pylist()
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            if p is None:
                continue
            try:
                raw = self._decode(p, m)
            except MediaDecodeError:
                if self.on_error != "null":
                    raise
                failed[i] = True
                continue
            # stub "feature": per-chunk means, L2-normalized
            chunks = raw[: (len(raw) // self.FEATURE_DIM) * self.FEATURE_DIM]
            if len(chunks) == 0:
                continue
            f = chunks.reshape(self.FEATURE_DIM, -1).mean(axis=1)
            norm = np.linalg.norm(f)
            feats[i] = f / norm if norm else f
        flat = pa.array(feats.reshape(-1), type=pa.float32())
        offsets = pa.array(np.arange(0, (tbl.num_rows + 1) * self.FEATURE_DIM,
                                     self.FEATURE_DIM, dtype=np.int32))
        feat_col = pa.ListArray.from_arrays(
            offsets, flat, mask=pa.array(failed) if failed.any() else None)
        return tbl.select(["media_id", "mime"]).append_column("features", feat_col)


def extract_features(ds, batch_size: int = 256, concurrency=(1, 4),
                     decode_stub: bool = True, on_error: str = "raise"):
    """Feature-extraction pipeline stage; small batches for wide binary rows.

    ``on_error="null"`` marks undecodable payloads with a null feature row
    instead of failing the batch (count them downstream with an
    ``is_null(features)`` aggregate)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode_stub": decode_stub, "on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class Thumbnailer:
    """Actor-pool stage: decode → RESIZE → re-encode thumbnails for the
    image-bearing rows (PPM / PNG / baseline JPEG images; for PPMV
    video, the FIRST sampled frame).  Non-visual or codec-less rows
    (wav, mp4) pass through with a null thumbnail.

    The resize is the exact-integer box average
    (:func:`xema_ray.functions.codecs.resize_box`) — bit-reproducible on
    any node, so the thumbnail checksum is a stable content fingerprint.
    Output columns: ``thumb`` (PPM bytes | null), ``th_w``/``th_h``,
    ``th_sum`` (int64 pixel sum | null).
    """

    def __init__(self, out_w: int = 8, out_h: int = 8,
                 on_error: str = "raise"):
        from xema_ray.functions import codecs

        self.codecs = codecs
        self.out_w = out_w
        self.out_h = out_h
        self.on_error = on_error

    def _image(self, payload: bytes, mime: str):
        if mime == "image/x-portable-pixmap":
            return self.codecs.decode_ppm(payload)
        if mime == "image/png":
            return self.codecs.decode_png(payload)
        if mime == "image/jpeg":
            img = self.codecs.decode_jpeg(payload)
            if img.ndim == 2:  # grayscale -> 3-channel for PPM re-encode
                img = np.repeat(img[:, :, None], 3, axis=2)
            return img
        if mime == "video/x-ppmv":
            sampled = self.codecs.sample_ppmv_frames(payload, every_k=2)
            if not sampled:
                raise self.codecs.MediaDecodeError("PPMV with no frames")
            return sampled[0][1]
        return None

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from xema_ray.functions.codecs import MediaDecodeError, encode_ppm, \
            resize_box

        thumbs, sums = [], []
        for p, m in zip(tbl["payload"].to_pylist(),
                        tbl["mime"].to_pylist()):
            img = None
            if p is not None:
                try:
                    img = self._image(p, m)
                except MediaDecodeError:
                    if self.on_error != "null":
                        raise
                    img = None
            if img is None:
                thumbs.append(None)
                sums.append(None)
                continue
            th = resize_box(img, self.out_h, self.out_w)
            thumbs.append(encode_ppm(th))
            sums.append(int(th.astype(np.int64).sum()))
        return tbl.select(["media_id", "mime"]) \
            .append_column("thumb", pa.array(thumbs, pa.binary())) \
            .append_column("th_w", pa.array(
                [self.out_w if t is not None else None for t in thumbs],
                pa.int32())) \
            .append_column("th_h", pa.array(
                [self.out_h if t is not None else None for t in thumbs],
                pa.int32())) \
            .append_column("th_sum", pa.array(sums, pa.int64()))


def thumbnails(ds, out_w: int = 8, out_h: int = 8, batch_size: int = 256,
               concurrency=(1, 4), on_error: str = "raise"):
    """Thumbnail pipeline stage; small batches — payload rows are wide."""
    return ds.map_batches(
        Thumbnailer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h,
                               "on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
