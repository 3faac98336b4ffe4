"""Dataset prep: convert corpora INTO the framework's on-disk layouts.

The reference's subsets/ scripts both read AND produce the on-disk
layouts (SURVEY.md §2#8 — ``save_as_images``-style converters).  These
are the writer halves for the layouts our readers understand:

* ``save_as_class_dirs``  — arrays -> ``out/<split>/<class>/NNNN.png``
  (the ImageNet-layout tree `subsets/imagenet.py` reads).
* ``save_segmentation_pairs`` — images+masks -> VOC-style
  ``JPEGImages/`` + ``SegmentationClass/`` + ImageSets lists.
* ``cifar_to_class_dirs`` — CIFAR pickle container -> class dirs (e.g.
  to train the ImageNet-layout pipeline on CIFAR, as the reference's
  prep scripts do for small corpora).
"""

from __future__ import annotations

import os

import numpy as np


def save_as_class_dirs(images: np.ndarray, labels: np.ndarray,
                       out_dir: str, split: str = "train",
                       class_names: list[str] | None = None,
                       fmt: str = "png") -> int:
    """Write uint8 [N,H,W,3] images to ``out_dir/split/<class>/``.

    Returns the number of files written.  Deterministic file names
    (``<index>.<fmt>``) so re-runs are idempotent.
    """
    from PIL import Image
    images = np.asarray(images)
    labels = np.asarray(labels)
    assert images.ndim == 4 and images.dtype == np.uint8, images.shape
    n_classes = int(labels.max()) + 1 if len(labels) else 0
    names = class_names or [f"class_{c:04d}" for c in range(n_classes)]
    written = 0
    for i, (img, lab) in enumerate(zip(images, labels)):
        cdir = os.path.join(out_dir, split, names[int(lab)])
        os.makedirs(cdir, exist_ok=True)
        Image.fromarray(img).save(
            os.path.join(cdir, f"{i:06d}.{fmt}"))
        written += 1
    return written


def save_segmentation_pairs(images: np.ndarray, masks: np.ndarray,
                            out_dir: str, split: str = "train") -> int:
    """Write a VOC-style tree: JPEGImages/*.jpg, SegmentationClass/*.png
    (palette-free int masks), ImageSets/Segmentation/<split>.txt."""
    from PIL import Image
    img_dir = os.path.join(out_dir, "JPEGImages")
    msk_dir = os.path.join(out_dir, "SegmentationClass")
    set_dir = os.path.join(out_dir, "ImageSets", "Segmentation")
    for d in (img_dir, msk_dir, set_dir):
        os.makedirs(d, exist_ok=True)
    ids = []
    for i, (img, msk) in enumerate(zip(np.asarray(images),
                                       np.asarray(masks))):
        name = f"{split}_{i:06d}"
        Image.fromarray(img).save(os.path.join(img_dir, f"{name}.jpg"),
                                  quality=95)
        Image.fromarray(msk.astype(np.uint8), mode="L").save(
            os.path.join(msk_dir, f"{name}.png"))
        ids.append(name)
    with open(os.path.join(set_dir, f"{split}.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return len(ids)


def cifar_to_class_dirs(data_dir: str, out_dir: str,
                        split: str = "train", corpus: str = "cifar10"
                        ) -> int:
    """Convert a CIFAR pickle corpus to the class-per-dir layout."""
    if corpus == "cifar10":
        from myconvnet_tpu.subsets import cifar10 as mod
    elif corpus == "cifar100":
        from myconvnet_tpu.subsets import cifar100 as mod
    else:
        raise ValueError(f"unknown corpus {corpus!r}")
    images, labels = mod.read_subset(data_dir, split)
    return save_as_class_dirs(images, labels, out_dir, split)
