"""Video clip corpus (ninth task family; no reference counterpart —
SURVEY.md §2 is image-only).

On-disk layout (Kinetics/UCF-style, frames pre-extracted)::

    data_dir/
      train/<class_name>/<video_id>/frame_00001.jpg ...
      val/<class_name>/<video_id>/...

``read_subset`` returns (clip_dirs, labels, class_names);
``ClipSource`` samples ``num_frames`` uniformly spaced frames per clip
(decoded with the shared host decoder) into [B, T, H, W, 3] uint8
batches.

Synthetic fallback: moving-square clips whose LABEL IS THE MOTION
DIRECTION (right/down/left/up).  Any single frame is class-ambiguous
by construction, so a model can only fit it through temporal
modeling — which makes the fallback a *functional test of the 3-D
conv path*, not just a shape check.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from myconvnet_tpu.data.pipeline import decode_image

FRAME_EXTS = (".jpg", ".jpeg", ".png")
# dx, dy per class (pixels per frame, scaled by image size)
DIRECTIONS = ((1, 0), (0, 1), (-1, 0), (0, -1))
# Label permutation under a horizontal flip of the frame: classes ARE
# motion directions here, so mirroring swaps right (0) and left (2)
# while vertical motion is unchanged.  Recipes that hflip synthetic
# clips must remap labels with this table or 50% of the horizontal-
# motion examples become mislabeled (capping accuracy at 0.75).
HFLIP_LABEL_SWAP = np.array([2, 1, 0, 3], np.int32)


def read_subset(data_dir: str, split: str = "train"):
    """-> (clip_dirs, labels int32, class_names sorted)."""
    root = os.path.join(data_dir, split)
    if not os.path.isdir(root):
        raise FileNotFoundError(f"no {split!r} split under {data_dir!r}")
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    if not classes:
        raise FileNotFoundError(f"no class dirs under {root!r}")
    dirs, labels = [], []
    for ci, cname in enumerate(classes):
        croot = os.path.join(root, cname)
        for vid in sorted(os.listdir(croot)):
            vdir = os.path.join(croot, vid)
            if os.path.isdir(vdir):
                dirs.append(vdir)
                labels.append(ci)
    return dirs, np.asarray(labels, np.int32), classes


def _frame_paths(clip_dir: str) -> list[str]:
    return sorted(os.path.join(clip_dir, f)
                  for f in os.listdir(clip_dir)
                  if f.lower().endswith(FRAME_EXTS))


class ClipSource:
    """Clip-dir source: get_batch(idx) -> ([B,T,H,W,3] uint8, labels).

    Frames are sampled uniformly spaced across each clip (the standard
    eval protocol; training gets temporal jitter from the on-device
    chain, not the reader — keeps host decode deterministic and
    cacheable)."""

    def __init__(self, clip_dirs, labels, num_frames: int = 8,
                 raw_hw: tuple[int, int] = (128, 128), workers: int = 8):
        assert len(clip_dirs) == len(labels)
        self.clip_dirs = list(clip_dirs)
        self.labels = np.asarray(labels, np.int32)
        self.num_frames = num_frames
        self.raw_hw = tuple(raw_hw)
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self.clip_dirs)

    def _load_clip(self, i: int) -> np.ndarray:
        paths = _frame_paths(self.clip_dirs[i])
        if not paths:
            raise FileNotFoundError(f"no frames in {self.clip_dirs[i]!r}")
        t = self.num_frames
        # uniformly spaced indices; short clips repeat the last frame
        idx = np.linspace(0, len(paths) - 1, t).round().astype(int)
        frames = [decode_image(paths[j], self.raw_hw) for j in idx]
        return np.stack(frames)

    def get_batch(self, indices):
        clips = list(self._pool.map(self._load_clip, indices))
        return np.stack(clips), self.labels[indices]


def synthetic_clips(n: int = 128, num_frames: int = 8,
                    hw: tuple[int, int] = (32, 32), seed: int = 0):
    """Moving-square clips; label = motion direction (4 classes).

    Square positions wrap around, speed ~ size/8 px/frame, random
    start + random color per clip.  Single frames are class-ambiguous.
    """
    rng = np.random.RandomState(seed)
    h, w = hw
    t = num_frames
    size = max(h // 8, 2)
    speed = max(h // 8, 1)
    x = np.zeros((n, t, h, w, 3), np.uint8)
    labels = rng.randint(0, len(DIRECTIONS), n).astype(np.int32)
    for i in range(n):
        dx, dy = DIRECTIONS[labels[i]]
        px, py = rng.randint(0, w), rng.randint(0, h)
        color = np.full(3, 255)
        # black background + fixed color on purpose: any per-clip
        # appearance variation would let a model memorize looks
        # instead of motion, defeating the fallback's point (val
        # generalization == temporal learning)
        for f in range(t):
            frame = np.zeros((h, w, 3), np.uint8)
            cx = (px + dx * speed * f) % w
            cy = (py + dy * speed * f) % h
            ys = (np.arange(cy, cy + size) % h)
            xs = (np.arange(cx, cx + size) % w)
            frame[np.ix_(ys, xs)] = color
            x[i, f] = frame
    return x, labels


class ArrayClipSource:
    """In-memory clips (synthetic fallback / tests)."""

    def __init__(self, clips: np.ndarray, labels: np.ndarray):
        assert len(clips) == len(labels)
        self.clips = clips
        self.labels = np.asarray(labels, np.int32)

    def __len__(self):
        return len(self.clips)

    def get_batch(self, indices):
        return self.clips[indices], self.labels[indices]


def make_source(data_dir: str | None, split: str = "train",
                synthetic: bool = False, synthetic_n: int = 128,
                num_frames: int = 8, raw_hw: tuple[int, int] = (128, 128),
                workers: int = 8):
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        # synthetic clips are generated at the TARGET size — no host
        # resize needed, labels depend only on motion
        return ArrayClipSource(*synthetic_clips(
            synthetic_n, num_frames, raw_hw, seed))
    dirs, labels, _ = read_subset(data_dir, split)
    return ClipSource(dirs, labels, num_frames=num_frames,
                      raw_hw=raw_hw, workers=workers)
