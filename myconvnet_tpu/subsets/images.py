"""Flat image-directory subset (DIV2K-style corpora: just images).

Layout::

    data_dir/train/*.png         # flat files, or
    data_dir/train/**/*.jpg      # one level of subdirectories

Labels are all zero — consumers (super-resolution, SSL pretraining on
unlabeled corpora, GAN training) ignore them; the reader exists so any
directory of images is a corpus without inventing fake classes.

The synthetic fallback generates STRUCTURED images (smooth gradients +
random rectangles + sinusoidal texture), not uniform noise: noise has
no downsample-consistent structure, so a super-resolution model could
never improve PSNR on it and smoke tests would be vacuous.
"""

from __future__ import annotations

import os

import numpy as np

from myconvnet_tpu.data.pipeline import ArraySource, FileSource

RAW_HW = (256, 256)
_EXTS = (".jpeg", ".jpg", ".png", ".bmp")


def read_subset(data_dir: str, split: str = "train") -> list[str]:
    """Returns sorted image paths under <data_dir>/<split> (flat or one
    subdirectory level)."""
    root = os.path.join(data_dir, split)
    if not os.path.isdir(root):
        raise FileNotFoundError(f"no {split!r} directory under "
                                f"{data_dir!r}")
    paths = []
    for entry in sorted(os.listdir(root)):
        full = os.path.join(root, entry)
        if os.path.isdir(full):
            paths.extend(os.path.join(full, f)
                         for f in sorted(os.listdir(full))
                         if f.lower().endswith(_EXTS))
        elif entry.lower().endswith(_EXTS):
            paths.append(full)
    if not paths:
        raise FileNotFoundError(f"no images under {root!r}")
    return paths


def synthetic_subset(n: int = 128, raw_hw: tuple[int, int] = RAW_HW,
                     seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Structured uint8 images: per-image random linear gradient +
    axis-aligned rectangles + a low-frequency sinusoid."""
    h, w = raw_hw
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    imgs = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        gx, gy = rng.uniform(-1, 1, 2)
        base = (gx * xx / w + gy * yy / h)
        freq = rng.uniform(2, 6, 2)
        phase = rng.uniform(0, 2 * np.pi, 2)
        tex = 0.25 * np.sin(2 * np.pi * freq[0] * xx / w + phase[0]) \
            * np.sin(2 * np.pi * freq[1] * yy / h + phase[1])
        img = np.stack([base * rng.uniform(0.3, 1.0) + tex
                        for _ in range(3)], axis=-1)
        for _ in range(rng.randint(2, 6)):
            y0, x0 = rng.randint(0, h - 8), rng.randint(0, w - 8)
            hh = rng.randint(8, max(h // 3, 9))
            ww = rng.randint(8, max(w // 3, 9))
            img[y0:y0 + hh, x0:x0 + ww] += rng.uniform(-0.5, 0.5, 3)
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
        imgs[i] = (img * 255).astype(np.uint8)
    return imgs, np.zeros(n, np.int32)


def make_source(data_dir: str | None, split: str = "train",
                synthetic: bool = False, synthetic_n: int = 128,
                raw_hw: tuple[int, int] = RAW_HW, workers: int = 8,
                decode_mode: str = "cover"):
    """``decode_mode="native_crop"`` keeps original pixels (crop, no
    resample) — REQUIRED for super-resolution corpora, where
    cover-resize would low-pass away the detail the task learns; the
    train split crops at random positions, val at the center."""
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        return ArraySource(*synthetic_subset(synthetic_n, raw_hw, seed))
    paths = read_subset(data_dir, split)
    return FileSource(paths, np.zeros(len(paths), np.int32), raw_hw,
                      workers=workers, decode_mode=decode_mode,
                      rand_crop=(split == "train"))
