"""OCR corpus reading (thirteenth task family — the reference is
image-only classification/segmentation/GAN, SURVEY.md §2; mount
empty, §0).

Real layout (the MJSynth/ICDAR annotation convention):

    data_dir/{train,val}/labels.txt     lines: "<relpath><TAB><text>"
                                        (or single-space separated)
    data_dir/{train,val}/<relpath>      the line images

Images load grayscale, resize to the configured height preserving
aspect, and right-pad (or center-crop) to a fixed width so batches
are static-shape; transfer stays uint8 (the image-corpus convention),
normalization happens on device inside the jitted step.

Labels are right-padded ``[L]`` int32 sequences; index 0 is the CTC
blank/pad (``ops/ctc.py``), charset symbols index from 1.  Texts with
characters outside the charset, or longer than ``max_len``, raise at
read time — a silently-truncated target would train the model on
wrong supervision.

``synthetic_text_images`` renders random charset strings with PIL
(DejaVu fonts, random size/offset/contrast polarity + noise) — real
rendered text, so a model that drives val CER down is genuinely
reading glyphs, not memorizing tensors.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# MJSynth's case-insensitive alphanumeric charset — the standard
# scene-text recognition benchmark vocabulary
DEFAULT_CHARSET = "0123456789abcdefghijklmnopqrstuvwxyz"
DEFAULT_HW = (32, 128)     # line height x padded width
DEFAULT_MAX_LEN = 24

_FONT_DIRS = ("/usr/share/fonts/truetype/dejavu",)


def encode_text(text: str, charset: str, max_len: int) -> np.ndarray:
    """Text -> right-padded int32 ``[max_len]`` (0 = pad/blank)."""
    if len(text) > max_len:
        raise ValueError(f"label {text!r} longer than max_len={max_len}")
    out = np.zeros(max_len, np.int32)
    for i, ch in enumerate(text):
        idx = charset.find(ch)
        if idx < 0:
            raise ValueError(f"character {ch!r} of label {text!r} not "
                             f"in charset {charset!r}")
        out[i] = idx + 1
    return out


def decode_ids(ids, charset: str) -> str:
    """Symbol ids (1-based, 0 = blank/pad) -> string.

    Ids past the charset raise a clear error instead of a bare
    IndexError: a served artifact trained with a LARGER charset than
    the route's (e.g. no :CONFIG given, 36-symbol default) would
    otherwise 500 on the first affected request."""
    arr = np.asarray(ids)
    hi = int(arr.max()) if arr.size else 0
    if hi > len(charset):
        raise ValueError(
            f"symbol id {hi} exceeds the {len(charset)}-symbol "
            "charset — the artifact was trained with a larger charset; "
            "pass the training config (serve.py --config / route "
            ":CONFIG) so the right charset is used")
    return "".join(charset[int(i) - 1] for i in arr if int(i) > 0)


def _fit_line(img: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Grayscale [h, w] uint8 -> [H, W] uint8: scale to height H
    preserving aspect, right-pad with the border value / center-crop
    the width."""
    from PIL import Image
    h, w = hw
    ih, iw = img.shape
    new_w = max(1, round(iw * h / ih))
    im = Image.fromarray(img).resize((new_w, h), Image.BILINEAR)
    arr = np.asarray(im, np.uint8)
    if new_w >= w:
        start = (new_w - w) // 2
        return arr[:, start:start + w]
    out = np.full((h, w), int(arr[:, -1].mean()), np.uint8)
    out[:, :new_w] = arr
    return out


def read_subset(data_dir: str, split: str = "train",
                charset: str = DEFAULT_CHARSET,
                max_len: int = DEFAULT_MAX_LEN):
    """-> (image_paths, texts) from the labels.txt layout."""
    root = os.path.join(data_dir, split)
    labels_file = os.path.join(root, "labels.txt")
    if not os.path.isfile(labels_file):
        raise FileNotFoundError(f"no labels.txt under {root!r}")
    paths, texts = [], []
    with open(labels_file, encoding="utf-8") as f:
        for lineno, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line:
                continue
            rel, _, text = (line.partition("\t") if "\t" in line
                            else line.partition(" "))
            if not text:
                raise ValueError(
                    f"{labels_file}:{lineno}: expected "
                    f"'<path><TAB><text>', got {line!r}")
            p = os.path.join(root, rel)
            if not os.path.isfile(p):
                raise FileNotFoundError(f"{labels_file}:{lineno}: "
                                        f"missing image {p!r}")
            encode_text(text, charset, max_len)  # validate eagerly
            paths.append(p)
            texts.append(text)
    return paths, texts


class LineImageSource:
    """get_batch(idx) -> ([B, H, W, 1] uint8, [B, L] int32)."""

    def __init__(self, paths, texts, charset: str = DEFAULT_CHARSET,
                 hw: tuple[int, int] = DEFAULT_HW,
                 max_len: int = DEFAULT_MAX_LEN, workers: int = 8):
        assert len(paths) == len(texts)
        self.paths = list(paths)
        self.texts = list(texts)
        self.charset = charset
        self.hw = tuple(hw)
        self.labels = np.stack([encode_text(t, charset, max_len)
                                for t in texts])
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self.paths)

    def _load(self, i: int) -> np.ndarray:
        from PIL import Image
        img = np.asarray(Image.open(self.paths[i]).convert("L"),
                         np.uint8)
        return _fit_line(img, self.hw)

    def get_batch(self, indices):
        imgs = list(self._pool.map(self._load, indices))
        return np.stack(imgs)[..., None], self.labels[indices]


def _find_fonts() -> list[str]:
    fonts = []
    for d in _FONT_DIRS:
        if os.path.isdir(d):
            fonts += [os.path.join(d, f) for f in sorted(os.listdir(d))
                      if f.endswith(".ttf") and "Serif" not in f]
    return fonts


def synthetic_text_images(n: int = 256, charset: str = DEFAULT_CHARSET,
                          hw: tuple[int, int] = DEFAULT_HW,
                          max_len: int = DEFAULT_MAX_LEN,
                          min_len: int = 1, seed: int = 0,
                          noise: float = 8.0):
    """Render n random strings -> ([n, H, W, 1] uint8, texts list).

    Random font/size/offset, random polarity (dark-on-light or
    light-on-dark) with a guaranteed >=80-level contrast, Gaussian
    pixel noise.  Falls back to PIL's built-in bitmap font if no TTF
    is present.
    """
    from PIL import Image, ImageDraw, ImageFont
    rng = np.random.RandomState(seed)
    h, w = hw
    fonts = _find_fonts()
    imgs = np.empty((n, h, w), np.uint8)
    texts = []
    for i in range(n):
        length = rng.randint(min_len, max_len + 1)
        text = "".join(charset[j] for j in
                       rng.randint(0, len(charset), length))
        bg = rng.randint(0, 256)
        fg = rng.randint(0, 176)
        if abs(fg - bg) < 80:  # enforce legible contrast
            fg = (bg + 128) % 256
        canvas = Image.new("L", (w, h), int(bg))
        draw = ImageDraw.Draw(canvas)
        if fonts:
            size = rng.randint(int(h * 0.55), int(h * 0.85))
            font = ImageFont.truetype(fonts[rng.randint(len(fonts))],
                                      size)
        else:  # pragma: no cover - DejaVu ships with the image
            font = ImageFont.load_default()
        x0, y0, x1, y1 = draw.textbbox((0, 0), text, font=font)
        tw, th = x1 - x0, y1 - y0
        if tw > w and fonts:  # long strings at big sizes: shrink to fit
            size = max(8, int(size * w / (tw * 1.05)))
            font = ImageFont.truetype(font.path, size)
            x0, y0, x1, y1 = draw.textbbox((0, 0), text, font=font)
            tw, th = x1 - x0, y1 - y0
        dx = rng.randint(0, max(w - tw, 1))
        dy = rng.randint(0, max(h - th, 1))
        draw.text((dx - x0, dy - y0), text, fill=int(fg), font=font)
        arr = np.asarray(canvas, np.float32)
        if noise > 0:
            arr = arr + rng.normal(0.0, noise, arr.shape)
        imgs[i] = np.clip(arr, 0, 255).astype(np.uint8)
        texts.append(text)
    return imgs[..., None], texts


class ArrayTextSource:
    """In-memory line images (synthetic fallback / tests)."""

    def __init__(self, imgs: np.ndarray, texts: list[str],
                 charset: str = DEFAULT_CHARSET,
                 max_len: int = DEFAULT_MAX_LEN):
        assert len(imgs) == len(texts)
        self.imgs = imgs
        self.texts = list(texts)
        self.charset = charset
        self.labels = np.stack([encode_text(t, charset, max_len)
                                for t in texts])

    def __len__(self):
        return len(self.imgs)

    def get_batch(self, indices):
        return self.imgs[indices], self.labels[indices]


def make_source(data_dir: str | None, split: str = "train",
                synthetic: bool = False, synthetic_n: int = 256,
                charset: str = DEFAULT_CHARSET,
                hw: tuple[int, int] = DEFAULT_HW,
                max_len: int = DEFAULT_MAX_LEN,
                synthetic_max_len: int | None = None,
                workers: int = 8):
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        sml = (min(max_len, 12) if synthetic_max_len is None
               else synthetic_max_len)
        imgs, texts = synthetic_text_images(
            synthetic_n, charset, hw, max_len=sml, seed=seed)
        src = ArrayTextSource(imgs, texts, charset, max_len)
    else:
        paths, texts = read_subset(data_dir, split, charset, max_len)
        src = LineImageSource(paths, texts, charset, hw, max_len,
                              workers)
    src.class_names = list(charset)
    return src
