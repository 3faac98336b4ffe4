"""Tracking corpus reading (sixteenth task family — the reference is a
single-image framework, SURVEY.md §2; mount empty, §0).

Real layout (the GOT-10k release convention, which OTB/LaSOT trees
also match after trivial renaming):

    data_dir/{train,val}/<video>/00000001.jpg ...   frames
    data_dir/{train,val}/<video>/groundtruth.txt    x,y,w,h per frame
                                                    (comma-separated,
                                                    0-based pixels)

Training samples are exemplar/search crop pairs from two frames of
the same video at most ``frame_gap`` apart, cropped SiamFC-style:
the exemplar is the context-padded target square ``s_z = sqrt((w + p)
(h + p)), p = (w + h) / 2`` resized to ``exemplar_hw``; the search is
the same-scale square around the EXEMPLAR frame's center, ``search/
exemplar`` times larger, from the SECOND frame — so the target sits
off-center by its true inter-frame motion, and the regression target
is that offset in resized search pixels.  Out-of-frame crop regions
pad with the frame's mean color (the paper's convention).

Wire format matches models/tracking.py: ONE ``[N, H, W, 6]`` uint8
blob per batch (search in channels 0-2; exemplar padded into the
top-left corner of channels 3-5) + ``[N, 2]`` f32 (dx, dy) offsets.

``synthetic_track_scenes`` renders textured squares over textured
backgrounds with exact offsets by construction — the deterministic
no-corpus fallback every family carries.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

DEFAULT_SEARCH_HW = (64, 64)
DEFAULT_EXEMPLAR_HW = (32, 32)


def _pack_blob(search: np.ndarray, exemplar: np.ndarray) -> np.ndarray:
    """[H,W,3] u8 search + [he,we,3] u8 exemplar -> [H,W,6] u8 blob."""
    h, w, _ = search.shape
    he, we, _ = exemplar.shape
    blob = np.zeros((h, w, 6), np.uint8)
    blob[..., :3] = search
    blob[:he, :we, 3:] = exemplar
    return blob


def _crop_resize(frame: np.ndarray, cy: float, cx: float, side: float,
                 out_hw: tuple[int, int]) -> np.ndarray:
    """Square crop of ``side`` px centered at (cy, cx), mean-padded
    where it leaves the frame, resized to ``out_hw`` (PIL bilinear)."""
    from PIL import Image
    h, w, _ = frame.shape
    half = side / 2.0
    y0, x0 = int(round(cy - half)), int(round(cx - half))
    s = max(int(round(side)), 1)
    mean = frame.reshape(-1, 3).mean(axis=0).astype(np.uint8)
    out = np.empty((s, s, 3), np.uint8)
    out[:] = mean
    ys, xs = max(y0, 0), max(x0, 0)
    ye, xe = min(y0 + s, h), min(x0 + s, w)
    if ye > ys and xe > xs:
        out[ys - y0:ye - y0, xs - x0:xe - x0] = frame[ys:ye, xs:xe]
    img = Image.fromarray(out).resize((out_hw[1], out_hw[0]),
                                      Image.BILINEAR)
    return np.asarray(img, np.uint8)


def _context_side(w: float, h: float) -> float:
    p = (w + h) / 2.0
    return float(np.sqrt((w + p) * (h + p)))


class TrackPairSource:
    """get_batch(idx) -> ([B, H, W, 6] uint8, [B, 2] f32 offsets)."""

    def __init__(self, videos, boxes, pairs,
                 search_hw=DEFAULT_SEARCH_HW,
                 exemplar_hw=DEFAULT_EXEMPLAR_HW, workers: int = 8):
        # videos: list of frame-path lists; boxes: list of [T, 4]
        # (x, y, w, h) arrays; pairs: [(video_idx, frame_a, frame_b)]
        self.videos, self.boxes, self.pairs = videos, boxes, pairs
        self.search_hw = tuple(search_hw)
        self.exemplar_hw = tuple(exemplar_hw)
        # the SiamFC context-crop geometry scales the (square) source
        # window by search/exemplar along ROWS; a mismatched aspect
        # ratio would make that scale axis-ambiguous
        if (self.search_hw[0] * self.exemplar_hw[1]
                != self.search_hw[1] * self.exemplar_hw[0]):
            raise ValueError(
                f"search_hw {self.search_hw} and exemplar_hw "
                f"{self.exemplar_hw} must share an aspect ratio")
        self._workers = workers
        self._pool = None  # created lazily; see close()

    def __len__(self):
        return len(self.pairs)

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):
        self.close()

    def _load(self, i: int):
        from PIL import Image
        vi, fa, fb = self.pairs[i]
        frames, bxs = self.videos[vi], self.boxes[vi]
        im_a = np.asarray(Image.open(frames[fa]).convert("RGB"),
                          np.uint8)
        im_b = np.asarray(Image.open(frames[fb]).convert("RGB"),
                          np.uint8)
        xa, ya, wa, ha = bxs[fa]
        xb, yb, wb, hb = bxs[fb]
        cya, cxa = ya + ha / 2.0, xa + wa / 2.0
        cyb, cxb = yb + hb / 2.0, xb + wb / 2.0
        s_z = _context_side(wa, ha)
        scale = self.search_hw[0] / float(self.exemplar_hw[0])
        s_x = s_z * scale
        ex = _crop_resize(im_a, cya, cxa, s_z, self.exemplar_hw)
        # search centered on the EXEMPLAR frame's target position in
        # frame b: the target appears displaced by its true motion
        se = _crop_resize(im_b, cya, cxa, s_x, self.search_hw)
        # The source crop is square (side s_x) but search_hw need not
        # be: the resize scales width by search_hw[1]/s_x and height by
        # search_hw[0]/s_x, so dx and dy use per-axis scales.
        off = np.asarray([(cxb - cxa) * (self.search_hw[1] / s_x),
                          (cyb - cya) * (self.search_hw[0] / s_x)],
                         np.float32)
        return _pack_blob(se, ex), off

    def get_batch(self, indices):
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self._workers)
        out = list(self._pool.map(self._load, indices))
        return (np.stack([b for b, _ in out]),
                np.stack([o for _, o in out]))


def read_subset(data_dir: str, split: str = "train",
                frame_gap: int = 10, pairs_per_video: int = 32,
                seed: int = 0):
    """Walk the GOT-10k-style tree -> (videos, boxes, pairs)."""
    root = os.path.join(data_dir, split)
    if not os.path.isdir(root):
        raise FileNotFoundError(f"no such split directory: {root!r}")
    rng = np.random.RandomState(seed)
    videos, boxes, pairs = [], [], []
    for name in sorted(os.listdir(root)):
        vdir = os.path.join(root, name)
        gt = os.path.join(vdir, "groundtruth.txt")
        if not os.path.isdir(vdir) or not os.path.exists(gt):
            continue
        frames = sorted(
            os.path.join(vdir, f) for f in os.listdir(vdir)
            if f.lower().endswith((".jpg", ".jpeg", ".png")))
        bxs = np.loadtxt(gt, delimiter=",", ndmin=2, dtype=np.float64)
        t = min(len(frames), len(bxs))
        if t < 2:
            continue
        vi = len(videos)
        videos.append(frames[:t])
        boxes.append(bxs[:t])
        for _ in range(pairs_per_video):
            fa = int(rng.randint(0, t))
            lo, hi = max(0, fa - frame_gap), min(t - 1, fa + frame_gap)
            fb = int(rng.randint(lo, hi + 1))
            pairs.append((vi, fa, fb))
    if not pairs:
        raise FileNotFoundError(
            f"{root!r} holds no <video>/groundtruth.txt sequences")
    return videos, boxes, pairs


def _texture(rng, h, w, scale: int = 4):
    base = rng.uniform(40, 215, (h // scale + 2, w // scale + 2, 3))
    reps = np.repeat(np.repeat(base, scale, 0), scale, 1)
    return reps[:h, :w]


def synthetic_track_scenes(n: int = 256,
                           search_hw=DEFAULT_SEARCH_HW,
                           exemplar_hw=DEFAULT_EXEMPLAR_HW,
                           max_offset: int = 12, seed: int = 0,
                           noise: float = 4.0):
    """Render n exemplar/search pairs -> ([n, H, W, 6] u8, [n, 2] f32).

    The object is a textured square whose texture is IDENTICAL in
    exemplar and search (up to noise) while the two backgrounds are
    independent — appearance matching is the only signal that finds
    it, exactly the siamese-tracking premise.  Offsets are integers
    (exact ground truth, no resampling blur).
    """
    rng = np.random.RandomState(seed)
    sh, sw = search_hw
    eh, ew = exemplar_hw
    m = int(max_offset)
    blobs = np.empty((n, sh, sw, 6), np.uint8)
    offs = np.empty((n, 2), np.float32)
    for i in range(n):
        osz = rng.randint(min(eh, ew) // 3, min(eh, ew) * 2 // 3)
        obj = _texture(rng, osz, osz, scale=2)
        # exemplar: object centered on its own background
        ex = _texture(rng, eh, ew)
        ey, exx = (eh - osz) // 2, (ew - osz) // 2
        ex[ey:ey + osz, exx:exx + osz] = obj
        # search: object at center + offset on an independent background
        se = _texture(rng, sh, sw)
        dx, dy = rng.randint(-m, m + 1, 2)
        y0 = (sh - osz) // 2 + dy
        x0 = (sw - osz) // 2 + dx
        y0 = int(np.clip(y0, 0, sh - osz))
        x0 = int(np.clip(x0, 0, sw - osz))
        se[y0:y0 + osz, x0:x0 + osz] = obj
        # the clip may have shortened the motion: record the REALIZED
        # offset of the pasted object center
        offs[i] = (x0 + osz / 2.0 - sw / 2.0,
                   y0 + osz / 2.0 - sh / 2.0)
        se = np.clip(se + rng.normal(0, noise, se.shape), 0, 255)
        ex = np.clip(ex + rng.normal(0, noise, ex.shape), 0, 255)
        blobs[i] = _pack_blob(se.astype(np.uint8), ex.astype(np.uint8))
    return blobs, offs


class ArrayTrackSource:
    """In-memory blobs/offsets (synthetic fallback / tests)."""

    def __init__(self, blobs: np.ndarray, offsets: np.ndarray):
        assert len(blobs) == len(offsets)
        self.blobs, self.offsets = blobs, offsets

    def __len__(self):
        return len(self.blobs)

    def get_batch(self, indices):
        return self.blobs[indices], self.offsets[indices]


def make_source(data_dir: str | None, split: str = "train",
                synthetic: bool = False, synthetic_n: int = 256,
                search_hw=DEFAULT_SEARCH_HW,
                exemplar_hw=DEFAULT_EXEMPLAR_HW,
                max_offset: int = 12, frame_gap: int = 10,
                pairs_per_video: int = 32, workers: int = 8):
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        blobs, offs = synthetic_track_scenes(
            synthetic_n, search_hw, exemplar_hw,
            max_offset=max_offset, seed=seed)
        return ArrayTrackSource(blobs, offs)
    videos, boxes, pairs = read_subset(
        data_dir, split, frame_gap=frame_gap,
        pairs_per_video=pairs_per_video,
        seed=0 if split == "train" else 1)
    return TrackPairSource(videos, boxes, pairs, search_hw,
                           exemplar_hw, workers)
