"""Depth corpus reading (fourteenth task family — the reference is
classification/segmentation/GAN only, SURVEY.md §2; mount empty, §0).

Real layout (the NYU-Depth-v2 / KITTI-eigen export convention):

    data_dir/{train,val}/rgb/<stem>.{png,jpg}     color frames
    data_dir/{train,val}/depth/<stem>.png         16-bit depth PNGs

Depth PNGs store SCALED integers (NYU tooling: millimeters, i.e.
``depth_scale=1000``; KITTI: 256ths of a meter) — ``depth_scale``
converts to meters at read time.  0 = no sensor return (invalid);
the loss and the evaluator both mask it.  Pairing is by filename
stem; an rgb frame without its depth twin raises (silently dropping
frames would skew a benchmark split).

RGB resizes bilinearly to the configured ``hw``; depth resizes
NEAREST (interpolating across a depth discontinuity would invent
points mid-air between foreground and background — the standard
protocol keeps sensor values intact).

``synthetic_depth_scenes`` renders layered fronto-parallel boxes over
a receding floor with depth-dependent fog shading (intensity falls as
``exp(-z/scale)``) plus texture noise — appearance genuinely encodes
depth, so a model that drives val AbsRel down is learning the cue,
not memorizing tensors.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

DEFAULT_HW = (96, 128)
DEFAULT_DEPTH_SCALE = 1000.0     # NYU millimeter convention
DEFAULT_MAX_DEPTH = 10.0


def read_subset(data_dir: str, split: str = "train"):
    """-> (rgb_paths, depth_paths), paired by filename stem."""
    root = os.path.join(data_dir, split)
    rgb_dir = os.path.join(root, "rgb")
    depth_dir = os.path.join(root, "depth")
    if not os.path.isdir(rgb_dir) or not os.path.isdir(depth_dir):
        raise FileNotFoundError(
            f"expected {root!r} to hold rgb/ and depth/ directories")
    depth_by_stem = {os.path.splitext(f)[0]: os.path.join(depth_dir, f)
                     for f in os.listdir(depth_dir)
                     if f.lower().endswith(".png")}
    rgb_paths, depth_paths = [], []
    for f in sorted(os.listdir(rgb_dir)):
        stem, ext = os.path.splitext(f)
        if ext.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        d = depth_by_stem.get(stem)
        if d is None:
            raise FileNotFoundError(
                f"rgb frame {f!r} has no depth/{stem}.png twin")
        rgb_paths.append(os.path.join(rgb_dir, f))
        depth_paths.append(d)
    if not rgb_paths:
        raise FileNotFoundError(f"no rgb frames under {rgb_dir!r}")
    return rgb_paths, depth_paths


class DepthPairSource:
    """get_batch(idx) -> ([B, H, W, 3] uint8, [B, H, W, 1] f32 meters)."""

    def __init__(self, rgb_paths, depth_paths,
                 hw: tuple[int, int] = DEFAULT_HW,
                 depth_scale: float = DEFAULT_DEPTH_SCALE,
                 workers: int = 8):
        assert len(rgb_paths) == len(depth_paths)
        self.rgb_paths = list(rgb_paths)
        self.depth_paths = list(depth_paths)
        self.hw = tuple(hw)
        self.depth_scale = float(depth_scale)
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self.rgb_paths)

    def _load(self, i: int):
        from PIL import Image
        h, w = self.hw
        rgb = Image.open(self.rgb_paths[i]).convert("RGB")
        rgb = np.asarray(rgb.resize((w, h), Image.BILINEAR), np.uint8)
        d_img = Image.open(self.depth_paths[i])
        d = np.asarray(d_img.resize((w, h), Image.NEAREST))
        d = d.astype(np.float32) / self.depth_scale
        return rgb, d[..., None]

    def get_batch(self, indices):
        out = list(self._pool.map(self._load, indices))
        return (np.stack([r for r, _ in out]),
                np.stack([d for _, d in out]))


def synthetic_depth_scenes(n: int = 256, hw: tuple[int, int] = DEFAULT_HW,
                           max_depth: float = DEFAULT_MAX_DEPTH,
                           n_boxes: int = 4, seed: int = 0,
                           invalid_frac: float = 0.02,
                           noise: float = 6.0):
    """Render n scenes -> ([n, H, W, 3] uint8, [n, H, W, 1] f32 meters).

    Floor plane: depth ramps from ``max_depth`` at the horizon (top)
    to ~1.5 m at the bottom row.  Boxes: fronto-parallel rectangles
    at random depths occlude correctly (nearest wins).  Shading: each
    surface's base color is attenuated by ``exp(-z / (max_depth/2))``
    — the fog cue that makes depth recoverable from appearance.
    ``invalid_frac`` zeroes random pixels (simulated sensor dropout)
    so the mask path is always exercised.
    """
    rng = np.random.RandomState(seed)
    h, w = hw
    imgs = np.empty((n, h, w, 3), np.uint8)
    depths = np.empty((n, h, w, 1), np.float32)
    ramp = np.linspace(max_depth, 1.5, h, dtype=np.float32)[:, None]
    for i in range(n):
        z = np.broadcast_to(ramp, (h, w)).copy()
        base = rng.uniform(100, 255, 3).astype(np.float32)
        color = np.broadcast_to(base, (h, w, 3)).copy()
        for _ in range(rng.randint(1, n_boxes + 1)):
            bz = rng.uniform(1.0, max_depth * 0.9)
            # perspective cue: nearer boxes are bigger on screen
            scale = np.clip(2.0 / bz, 0.15, 0.9)
            bh = max(2, int(h * scale * rng.uniform(0.5, 1.0)))
            bw = max(2, int(w * scale * rng.uniform(0.3, 0.8)))
            y0 = rng.randint(0, max(h - bh, 1))
            x0 = rng.randint(0, max(w - bw, 1))
            region = z[y0:y0 + bh, x0:x0 + bw]
            front = region > bz           # occlusion: nearest wins
            region[front] = bz
            c = rng.uniform(100, 255, 3).astype(np.float32)
            color[y0:y0 + bh, x0:x0 + bw][front] = c
        fog = np.exp(-z / (max_depth / 2.0))[..., None]
        img = color * fog
        img = img + rng.normal(0.0, noise, img.shape)
        imgs[i] = np.clip(img, 0, 255).astype(np.uint8)
        if invalid_frac > 0:
            drop = rng.rand(h, w) < invalid_frac
            z = np.where(drop, 0.0, z)
        depths[i] = z[..., None]
    return imgs, depths


class ArrayDepthSource:
    """In-memory rgb/depth pairs (synthetic fallback / tests)."""

    def __init__(self, imgs: np.ndarray, depths: np.ndarray):
        assert len(imgs) == len(depths)
        self.imgs = imgs
        self.depths = depths

    def __len__(self):
        return len(self.imgs)

    def get_batch(self, indices):
        return self.imgs[indices], self.depths[indices]


def make_source(data_dir: str | None, split: str = "train",
                synthetic: bool = False, synthetic_n: int = 256,
                hw: tuple[int, int] = DEFAULT_HW,
                depth_scale: float = DEFAULT_DEPTH_SCALE,
                max_depth: float = DEFAULT_MAX_DEPTH,
                workers: int = 8):
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        imgs, depths = synthetic_depth_scenes(
            synthetic_n, hw, max_depth=max_depth, seed=seed)
        return ArrayDepthSource(imgs, depths)
    rgb, dep = read_subset(data_dir, split)
    return DepthPairSource(rgb, dep, hw, depth_scale, workers)
