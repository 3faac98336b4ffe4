"""Native data runtime (C++ via ctypes) vs numpy reference."""

import numpy as np
import pytest

from myconvnet_tpu.data import native_loader as nl


def test_native_builds_and_loads():
    assert nl.native_available(), "g++ build of libmcn_data.so failed"


def test_shuffle_indices_is_permutation_and_deterministic():
    a = nl.shuffle_indices(42, 1000)
    b = nl.shuffle_indices(42, 1000)
    c = nl.shuffle_indices(43, 1000)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))
    # actually shuffled
    assert (a != np.arange(1000)).mean() > 0.9


def test_gather_batch_matches_numpy():
    rng = np.random.RandomState(0)
    pool = rng.randint(0, 256, (100, 8, 8, 3), dtype=np.uint8)
    idx = rng.randint(0, 100, 32).astype(np.int64)
    out = nl.gather_batch(pool, idx)
    np.testing.assert_array_equal(out, pool[idx])
    assert out.flags.c_contiguous


def test_gather_batch_noncontiguous_falls_back():
    rng = np.random.RandomState(1)
    pool = rng.randint(0, 256, (50, 8, 8, 4), dtype=np.uint8)[..., :3]
    idx = np.asarray([0, 5, 7], np.int64)
    out = nl.gather_batch(pool, idx)
    np.testing.assert_array_equal(out, pool[idx])


def test_normalize_u8_host_matches_numpy():
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = nl.normalize_u8_host(imgs, mean, std)
    expect = (imgs.astype(np.float32) / 255.0 - np.asarray(
        mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(out, expect, rtol=1e-6, atol=1e-6)


def test_array_source_uses_gather():
    from myconvnet_tpu.data.pipeline import ArraySource
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (20, 4, 4, 3), dtype=np.uint8)
    labels = np.arange(20, dtype=np.int32)
    src = ArraySource(imgs, labels)
    x, y = src.get_batch(np.asarray([3, 1, 19]))
    np.testing.assert_array_equal(x, imgs[[3, 1, 19]])
    np.testing.assert_array_equal(y, [3, 1, 19])


def test_native_jpeg_decode_matches_pil():
    """Native libjpeg decode+cover-resize vs the PIL reference path on
    synthetic JPEGs (same compressed data, both bilinear cover-resize:
    small tolerance for IDCT/rounding differences)."""
    import io

    from PIL import Image

    from myconvnet_tpu.data import native_loader as nl

    if not nl.native_jpeg_available():
        pytest.skip("native jpeg not built")
    rng = np.random.RandomState(0)
    blobs = []
    for i in range(6):
        h, w = rng.randint(40, 90), rng.randint(40, 90)
        # smooth image: JPEG-friendly, keeps decoder outputs comparable
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(yy * 255 / h), (xx * 255 / w),
                        ((yy + xx) * 255 / (h + w))], -1).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=92)
        blobs.append(buf.getvalue())
    out = nl.decode_jpeg_batch(blobs, (32, 32))
    assert out.shape == (6, 32, 32, 3) and out.dtype == np.uint8
    for i, b in enumerate(blobs):
        ref = nl._decode_pil(b, (32, 32)).astype(np.int32)
        got = out[i].astype(np.int32)
        # same geometry contract; decoder/resampler rounding differs
        assert np.mean(np.abs(got - ref)) < 6.0, i
        assert abs(float(got.mean()) - float(ref.mean())) < 3.0


def test_native_jpeg_corrupt_falls_back():
    from myconvnet_tpu.data import native_loader as nl
    if not nl.native_jpeg_available():
        pytest.skip("native jpeg not built")
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(buf, "PNG")
    # PNG bytes through the JPEG path -> native fails -> PIL decodes
    out = nl.decode_jpeg_batch([buf.getvalue()], (16, 16))
    assert out.shape == (1, 16, 16, 3)
    assert np.all(out == 0)


def test_filesource_jpeg_native_path(tmp_path):
    from PIL import Image

    from myconvnet_tpu.data.pipeline import FileSource

    rng = np.random.RandomState(1)
    paths = []
    for i in range(4):
        img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    src = FileSource(paths, [0, 1, 2, 3], raw_hw=(32, 32), workers=2)
    x, y = src.get_batch(np.arange(4))
    assert x.shape == (4, 32, 32, 3) and x.dtype == np.uint8
    assert y.tolist() == [0, 1, 2, 3]


def test_native_png_decode_rgb_and_raw_palette(tmp_path):
    """Native libpng path: RGB roundtrip vs PIL, and raw palette INDEX
    decode (the VOC mask contract — expanding to RGB would destroy the
    class ids)."""
    import io

    from PIL import Image

    from myconvnet_tpu.data import native_loader as nl

    if not nl.native_png_available():
        pytest.skip("native png unavailable")
    rs = np.random.RandomState(0)

    # RGB png
    rgb = rs.randint(0, 256, (11, 13, 3), np.uint8)
    b = io.BytesIO()
    Image.fromarray(rgb).save(b, format="PNG")
    out = nl.decode_png(b.getvalue(), "rgb")
    np.testing.assert_array_equal(out, rgb)

    # palettized mask png (indices incl. the 255 ignore label)
    mask = rs.randint(0, 21, (9, 7), np.uint8)
    mask[0, 0] = 255
    pimg = Image.fromarray(mask, mode="P")
    from myconvnet_tpu.utils.images import voc_palette
    pimg.putpalette(voc_palette().reshape(-1).tolist())
    b2 = io.BytesIO()
    pimg.save(b2, format="PNG")
    raw = nl.decode_png(b2.getvalue(), "raw")
    np.testing.assert_array_equal(raw, mask)
    # raw mode on a truecolor image declines -> caller falls back
    assert nl.decode_png(b.getvalue(), "raw") is None

    # grayscale raw
    g = rs.randint(0, 256, (5, 6), np.uint8)
    b3 = io.BytesIO()
    Image.fromarray(g, mode="L").save(b3, format="PNG")
    np.testing.assert_array_equal(nl.decode_png(b3.getvalue(), "raw"), g)

    # corrupt bytes -> None (no crash)
    assert nl.decode_png(b"\x89PNG\r\n\x1a\njunk", "rgb") is None
    assert nl.decode_png(b"notapng", "rgb") is None


def test_native_png_declines_16bit_gray_raw(tmp_path):
    """16-bit label masks must fall back to PIL (stripping to 8 bits
    would corrupt ids > 255)."""
    import io

    from PIL import Image

    from myconvnet_tpu.data import native_loader as nl

    if not nl.native_png_available():
        pytest.skip("native png unavailable")
    arr = (np.arange(12, dtype=np.uint16) * 100).reshape(3, 4)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="PNG")
    assert nl.decode_png(b.getvalue(), "raw") is None
    # rgb mode may still expand it (strip_16 is fine for display data)
