"""PASCAL VOC segmentation subset (SURVEY.md §2#8; BASELINE config #4).

Understands the standard VOCdevkit layout::

    VOC2012/JPEGImages/*.jpg
    VOC2012/SegmentationClass/*.png     (palette masks; 255 = ignore)
    VOC2012/ImageSets/Segmentation/{train,val}.txt

plus a deterministic synthetic fallback producing (image, mask) pairs.
"""

from __future__ import annotations

import os

import numpy as np

from myconvnet_tpu.data.pipeline import ArraySource, FileSource

NUM_CLASSES = 21
IGNORE_LABEL = 255
RAW_HW = (512, 512)
IMAGE_HW = (513, 513)  # canonical DeepLab crop


def read_subset(data_dir: str, split: str = "train"
                ) -> tuple[list[str], list[str]]:
    """Returns (image_paths, mask_paths)."""
    for sub in ("VOC2012", "VOCdevkit/VOC2012", "."):
        root = os.path.normpath(os.path.join(data_dir, sub))
        lst = os.path.join(root, "ImageSets", "Segmentation",
                           f"{split}.txt")
        if os.path.exists(lst):
            break
    else:
        raise FileNotFoundError(
            f"no VOC ImageSets/Segmentation/{split}.txt under {data_dir!r}")
    with open(lst) as f:
        ids = [line.strip() for line in f if line.strip()]
    imgs = [os.path.join(root, "JPEGImages", f"{i}.jpg") for i in ids]
    masks = [os.path.join(root, "SegmentationClass", f"{i}.png")
             for i in ids]
    return imgs, masks


class PairArraySource(ArraySource):
    """images uint8 [N,H,W,3] + masks int32 [N,H,W]."""


def synthetic_subset(n: int = 64, raw_hw: tuple[int, int] = (96, 96),
                     seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Fake segmentation pairs: random rectangles of random classes on a
    background, so mIoU is learnable."""
    rng = np.random.RandomState(seed)
    h, w = raw_hw
    imgs = np.zeros((n, h, w, 3), np.float32)
    masks = np.zeros((n, h, w), np.int32)
    for i in range(n):
        for _ in range(3):
            c = rng.randint(1, NUM_CLASSES)
            y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
            hh, ww = rng.randint(h // 8, h // 2), rng.randint(w // 8, w // 2)
            color = np.asarray([c / NUM_CLASSES, (c % 5) / 5.0,
                                (c % 7) / 7.0])
            imgs[i, y0:y0 + hh, x0:x0 + ww] = color
            masks[i, y0:y0 + hh, x0:x0 + ww] = c
        imgs[i] += rng.rand(h, w, 3) * 0.15
    return (np.clip(imgs, 0, 1) * 255).astype(np.uint8), masks


def make_source(data_dir: str | None, split: str = "train",
                synthetic: bool = False, synthetic_n: int = 64,
                raw_hw: tuple[int, int] = RAW_HW, workers: int = 8):
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        small = (96, 96) if synthetic else raw_hw
        return PairArraySource(*synthetic_subset(synthetic_n, small, seed))
    imgs, masks = read_subset(data_dir, split)
    return FileSource(imgs, masks, raw_hw, workers=workers, mask_hw=raw_hw)
