"""Integer resize kernels + Thumbnailer stage (multimodal r3)."""

import numpy as np
import pyarrow as pa
import pytest


def test_resize_box_exact_block_means():
    from xema_ray.functions.codecs import resize_box

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(13, 29, 3), dtype=np.uint8)
    t = resize_box(img, 8, 8)
    assert t.shape == (8, 8, 3) and t.dtype == np.uint8
    h, w = img.shape[:2]
    for r in range(8):
        for c in range(8):
            r0, r1 = (r * h) // 8, ((r + 1) * h) // 8
            c0, c1 = (c * w) // 8, ((c + 1) * w) // 8
            blk = img[r0:r1, c0:c1].astype(np.int64)
            want = blk.reshape(-1, 3).sum(0) // ((r1 - r0) * (c1 - c0))
            assert (t[r, c] == want).all()


def test_resize_box_identity_and_upscale_fallback():
    from xema_ray.functions.codecs import resize_box, resize_nearest

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (resize_box(img, 4, 6) == img).all()
    up = resize_box(img, 8, 12)
    assert up.shape == (8, 12, 3)
    assert (up == resize_nearest(img, 8, 12)).all()


def test_resize_nearest_centers():
    from xema_ray.functions.codecs import resize_nearest

    img = np.zeros((10, 10, 3), dtype=np.uint8)
    img[7:, 7:] = 255
    t = resize_nearest(img, 2, 2)
    assert (t[0, 0] == 0).all() and (t[1, 1] == 255).all()


def _media_ds(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


def test_thumbnailer_images_video_and_passthrough(ray_session):
    from xema_ray.functions.codecs import (decode_ppm, encode_png,
                                           encode_ppm, encode_ppmv,
                                           resize_box)
    from xema_ray.stages.multimodal import thumbnails

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(17, 11, 3), dtype=np.uint8)
    frames = [rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
              for _ in range(5)]
    tbl = pa.table({
        "media_id": pa.array(["p", "g", "v", "w"], pa.string()),
        "payload": pa.array([encode_ppm(img), encode_png(img),
                             encode_ppmv(frames), b"RIFFnotawav"],
                            pa.binary()),
        "mime": pa.array(["image/x-portable-pixmap", "image/png",
                          "video/x-ppmv", "audio/wav"], pa.string()),
    })
    out = pa.concat_tables(
        [b for b in thumbnails(_media_ds(tbl), out_w=4, out_h=4)
         .iter_batches(batch_format="pyarrow")])
    got = {r["media_id"]: r for r in out.to_pylist()}
    want = resize_box(img, 4, 4)
    assert decode_ppm(got["p"]["thumb"]).tolist() == want.tolist()
    assert decode_ppm(got["g"]["thumb"]).tolist() == want.tolist()
    # video thumbnail = first SAMPLED frame (index 0)
    assert decode_ppm(got["v"]["thumb"]).tolist() == \
        resize_box(frames[0], 4, 4).tolist()
    # non-visual mime passes through null
    assert got["w"]["thumb"] is None and got["w"]["th_sum"] is None
    assert got["p"]["th_sum"] == int(want.astype(np.int64).sum())


def test_thumbnailer_corrupt_policy(ray_session):
    from xema_ray.stages.multimodal import thumbnails

    tbl = pa.table({
        "media_id": pa.array(["bad"], pa.string()),
        "payload": pa.array([b"P6 nope"], pa.binary()),
        "mime": pa.array(["image/x-portable-pixmap"], pa.string()),
    })
    out = pa.concat_tables(
        [b for b in thumbnails(_media_ds(tbl), on_error="null")
         .iter_batches(batch_format="pyarrow")])
    assert out["thumb"].to_pylist() == [None]
    with pytest.raises(Exception):
        pa.concat_tables(
            [b for b in thumbnails(_media_ds(tbl), on_error="raise")
             .iter_batches(batch_format="pyarrow")])
