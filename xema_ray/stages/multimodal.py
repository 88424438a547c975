"""Multimodal column stages — image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): ``decode_stub=True`` (default) produces deterministic fake
features derived from the payload bytes; ``decode_stub=False`` raises
``NotImplementedError`` at the decode site.  Everything Ray-side is real and
tested: schema (binary + metadata struct), small ``batch_size`` for wide
binary rows, actor-pool stage shape with per-actor model/codec init, and the
feature output layout (fixed-width ``list<float>``).
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
    """Deterministic fake media rows (binary payload + metadata)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    mimes = rng.choice(["image/jpeg", "image/png", "audio/wav"], size=n)
    return pa.table({
        "media_id": pa.array([f"m-{i:08d}" for i in range(n)], type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(mimes, type=pa.string()),
        "width": pa.array(rng.integers(16, 2048, size=n, dtype=np.int32)),
        "height": pa.array(rng.integers(16, 2048, size=n, dtype=np.int32)),
        "duration_ms": pa.array(rng.integers(0, 60000, size=n, dtype=np.int32)),
    })


class MediaFeatureExtractor:
    """Actor-pool stage: decode → feature-extract → fixed-width embedding.

    Real deployments load the codec/model in ``__init__`` (once per actor);
    here the stub derives a deterministic 64-dim feature from payload bytes
    so the plumbing (schema, batch size, actor signature, output layout) is
    fully exercised.  Use small ``batch_size`` (≤256) — payloads are wide.
    """

    FEATURE_DIM = 64

    def __init__(self, decode_stub: bool = True):
        self.decode_stub = decode_stub
        # model/codec init would happen here, once per actor

    def _decode(self, payload: bytes, mime: str) -> np.ndarray:
        if not self.decode_stub:
            raise NotImplementedError(
                "real decode requires an image/audio library not present in "
                "this environment; run with decode_stub=True"
            )
        arr = np.frombuffer(payload[: 64 * 64], dtype=np.uint8)
        return arr.astype(np.float32)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        feats = np.zeros((tbl.num_rows, self.FEATURE_DIM), dtype=np.float32)
        payloads = tbl["payload"].to_pylist()
        mimes = tbl["mime"].to_pylist()
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            if p is None:
                continue
            raw = self._decode(p, m)
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
        feat_col = pa.ListArray.from_arrays(offsets, flat)
        return tbl.select(["media_id", "mime"]).append_column("features", feat_col)


def extract_features(ds, batch_size: int = 256, concurrency=(1, 4),
                     decode_stub: bool = True):
    """Feature-extraction pipeline stage; small batches for wide binary rows."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode_stub": decode_stub},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
