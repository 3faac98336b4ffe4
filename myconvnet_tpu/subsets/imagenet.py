"""ImageNet-layout subset: class-per-directory reader (SURVEY.md §2#8).

Understands the standard layout the reference's prep scripts produce::

    data_dir/train/<class_name>/*.JPEG
    data_dir/val/<class_name>/*.JPEG

plus a deterministic synthetic fallback (no-corpus environments).
"""

from __future__ import annotations

import os

import numpy as np

from myconvnet_tpu.data.pipeline import ArraySource, FileSource

NUM_CLASSES = 1000
RAW_HW = (256, 256)   # fixed host-decode size; device crops to 224
IMAGE_HW = (224, 224)

_EXTS = (".jpeg", ".jpg", ".png")


def read_subset(data_dir: str, split: str = "train"
                ) -> tuple[list[str], np.ndarray, list[str]]:
    """Returns (paths, labels int32, class_names sorted)."""
    root = os.path.join(data_dir, split)
    if not os.path.isdir(root):
        raise FileNotFoundError(f"no {split!r} directory under {data_dir!r}")
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    paths, labels = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(root, cname)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(_EXTS):
                paths.append(os.path.join(cdir, fname))
                labels.append(ci)
    return paths, np.asarray(labels, np.int32), classes


def synthetic_subset(n: int = 256, num_classes: int = NUM_CLASSES,
                     raw_hw: tuple[int, int] = RAW_HW, seed: int = 0
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Fake uint8 batches at the host-decode raw size."""
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, (n, *raw_hw, 3), dtype=np.uint8)
    labels = rng.randint(0, num_classes, n).astype(np.int32)
    return imgs, labels


def make_source(data_dir: str | None, split: str = "train",
                synthetic: bool = False, synthetic_n: int = 256,
                raw_hw: tuple[int, int] = RAW_HW, workers: int = 8):
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        return ArraySource(*synthetic_subset(synthetic_n, NUM_CLASSES,
                                             raw_hw, seed))
    paths, labels, _ = read_subset(data_dir, split)
    return FileSource(paths, labels, raw_hw, workers=workers)
