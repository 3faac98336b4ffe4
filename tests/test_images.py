"""Image artifact utilities: grids, palette, overlays, logger images."""

import numpy as np

from myconvnet_tpu.utils.images import (colorize_mask, make_grid,
                                        overlay_mask, save_png, to_uint8,
                                        voc_palette)
from myconvnet_tpu.utils.logging import MetricLogger


def test_make_grid_shape_and_content():
    imgs = np.arange(5 * 4 * 4 * 3, dtype=np.uint8).reshape(5, 4, 4, 3)
    grid = make_grid(imgs, pad=2, pad_value=7)
    # 5 images -> 3x2 grid (side=ceil(sqrt(5))=3, rows=2)
    assert grid.shape == (2 * 6 - 2, 3 * 6 - 2, 3)
    np.testing.assert_array_equal(grid[:4, :4], imgs[0])
    np.testing.assert_array_equal(grid[6:10, :4], imgs[3])
    assert grid[4, 0, 0] == 7  # padding fill


def test_to_uint8_range():
    x = np.asarray([[-1.0, 0.0, 1.0, 2.0]]).reshape(1, 1, 4, 1)
    u = to_uint8(x)
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(u.reshape(-1), [0, 128, 255, 255])


def test_voc_palette_canonical_colors():
    pal = voc_palette()
    np.testing.assert_array_equal(pal[0], [0, 0, 0])          # background
    np.testing.assert_array_equal(pal[1], [128, 0, 0])        # aeroplane
    np.testing.assert_array_equal(pal[15], [192, 128, 128])   # person
    # all 21 VOC classes get distinct colors
    assert len({tuple(c) for c in pal[:21]}) == 21


def test_colorize_and_overlay():
    mask = np.asarray([[0, 1], [255, 15]])
    rgb = colorize_mask(mask)
    np.testing.assert_array_equal(rgb[0, 1], [128, 0, 0])
    np.testing.assert_array_equal(rgb[1, 0], [255, 255, 255])  # ignore
    img = np.zeros((2, 2, 3), np.uint8)
    ov = overlay_mask(img, mask, alpha=0.5)
    np.testing.assert_array_equal(ov[0, 1], [64, 0, 0])
    assert ov.dtype == np.uint8


def test_save_png_and_logger_image(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    p = save_png(str(tmp_path / "a" / "x.png"), img)
    assert (tmp_path / "a" / "x.png").exists()
    from PIL import Image
    assert Image.open(p).size == (4, 4)

    logger = MetricLogger(log_dir=str(tmp_path / "logs"), stdout=False)
    path = logger.log_image(7, "samples", img)
    assert path.endswith("samples_00000007.png")
    import os
    assert os.path.exists(path)
    # no log_dir -> no file, no crash
    assert MetricLogger(stdout=False).log_image(1, "t", img) is None
