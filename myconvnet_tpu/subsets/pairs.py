"""Paired-image subsets for pix2pix (BASELINE config #5b).

Supports both on-disk conventions:

* **combined**: one image per example with input|target side by side
  (the original pix2pix dataset layout: ``{dir}/{split}/*.jpg`` of width
  2W) — split down the middle at load;
* **two-dir**: ``{dir}/A/{split}/*`` and ``{dir}/B/{split}/*`` with
  matching filenames.

Plus a deterministic synthetic fallback (input = colored shapes, target
= color-inverted input) so the recipe runs with no corpus.
"""

from __future__ import annotations

import os

import numpy as np

RAW_HW = (256, 256)

_EXTS = (".jpg", ".jpeg", ".png")


def _list_images(d: str) -> list[str]:
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.lower().endswith(_EXTS))


class PairFileSource:
    """Decodes (input, target) uint8 pairs at a fixed raw size."""

    def __init__(self, items, raw_hw=RAW_HW, combined=True, workers=8):
        from concurrent.futures import ThreadPoolExecutor
        self.items = list(items)      # paths (combined) or (a, b) tuples
        self.raw_hw = raw_hw
        self.combined = combined
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self.items)

    def _load(self, item) -> tuple[np.ndarray, np.ndarray]:
        from PIL import Image
        th, tw = self.raw_hw
        if self.combined:
            img = Image.open(item).convert("RGB")
            img = img.resize((2 * tw, th), Image.BILINEAR)
            arr = np.asarray(img, np.uint8)
            return arr[:, :tw], arr[:, tw:]
        pa, pb = item
        a = Image.open(pa).convert("RGB").resize((tw, th), Image.BILINEAR)
        b = Image.open(pb).convert("RGB").resize((tw, th), Image.BILINEAR)
        return np.asarray(a, np.uint8), np.asarray(b, np.uint8)

    def get_batch(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pairs = list(self._pool.map(lambda i: self._load(self.items[i]),
                                    idx))
        a = np.stack([p[0] for p in pairs])
        b = np.stack([p[1] for p in pairs])
        return a, b


def read_subset(data_dir: str, split: str = "train",
                paired: bool = True):
    """Returns (items, combined_flag).  ``paired=False`` (CycleGAN):
    the two-dir layout's A/B files need NOT share basenames — the
    domains are zipped by sorted order, wrapping the shorter one, so any
    two image pools work."""
    two_a = os.path.join(data_dir, "A", split)
    two_b = os.path.join(data_dir, "B", split)
    if os.path.isdir(two_a) and os.path.isdir(two_b):
        a_files = _list_images(two_a)
        b_files = _list_images(two_b)
        if not paired:
            if not a_files or not b_files:
                raise FileNotFoundError(
                    f"empty A/{split} or B/{split} under {data_dir!r}")
            n = max(len(a_files), len(b_files))
            items = [(a_files[i % len(a_files)],
                      b_files[i % len(b_files)]) for i in range(n)]
            return items, False
        b_by_name = {os.path.basename(p): p for p in b_files}
        items = [(a, b_by_name[os.path.basename(a)]) for a in a_files
                 if os.path.basename(a) in b_by_name]
        if not items:
            raise FileNotFoundError(
                f"no matching A/B pairs under {data_dir!r}")
        return items, False
    comb = os.path.join(data_dir, split)
    if os.path.isdir(comb):
        items = _list_images(comb)
        if items:
            return items, True
    raise FileNotFoundError(
        f"no pix2pix layout under {data_dir!r} (need A/{split}+B/{split} "
        f"or {split}/ of combined images)")


class PairArraySource:
    def __init__(self, a: np.ndarray, b: np.ndarray):
        assert len(a) == len(b)
        self.a, self.b = a, b

    def __len__(self):
        return len(self.a)

    def get_batch(self, idx):
        return self.a[idx], self.b[idx]


def synthetic_subset(n: int = 64, raw_hw=(64, 64), seed: int = 0):
    """input = colored rectangles on gray; target = color-inverted input
    (a crisp, learnable translation task)."""
    rng = np.random.RandomState(seed)
    h, w = raw_hw
    a = np.full((n, h, w, 3), 128, np.uint8)
    for i in range(n):
        for _ in range(3):
            y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
            hh, ww = rng.randint(h // 8, h // 2), rng.randint(w // 8, w // 2)
            a[i, y0:y0 + hh, x0:x0 + ww] = rng.randint(0, 256, 3)
    b = 255 - a
    return a, b


def make_source(data_dir, split="train", synthetic=False, synthetic_n=64,
                raw_hw=RAW_HW, workers=8, paired=True):
    if synthetic or data_dir is None:
        return PairArraySource(*synthetic_subset(
            synthetic_n, raw_hw, 0 if split == "train" else 1))
    items, combined = read_subset(data_dir, split, paired=paired)
    return PairFileSource(items, raw_hw, combined, workers)
