"""Input pipeline: host IO/decode + double-buffered host->HBM prefetch.

Rebuild of the reference's ``dataset.py`` tf.data pipeline (SURVEY.md
§2#5, §3.1).  The reference does decode AND all augmentation on host CPU
threads; the rebuild splits the work at the TPU-native boundary
(SURVEY §7 hard-part #1):

* host: file listing, JPEG/PNG decode (parallel worker threads), resize
  to a fixed raw size, batching into contiguous uint8 arrays;
* transfer: uint8 (4x smaller than f32), double-buffered — a background
  thread ``jax.device_put``s batch k+1..k+depth while the device computes
  on batch k, so the step never waits on PCIe/DMA;
* device: the full augmentation chain (crop/resize/flip/jitter/normalize)
  from ``data/augment.py``, fused into the jitted train step.

``DataSet`` mirrors the reference's public surface: built from file lists
(or in-memory arrays), ``train_iter``/``eval_iter`` batch iterators,
augmentation switched off for eval.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Sequence

import jax
import numpy as np

from myconvnet_tpu.data.augment import AugmentConfig


def cover_resize_center_crop(img, raw_hw: tuple[int, int]) -> np.ndarray:
    """Scale a PIL image so it covers ``raw_hw``, center-crop the
    overhang -> [raw_h, raw_w, 3] uint8.  THE geometry contract of the
    host decode stage (the native libjpeg path reimplements exactly
    this in C — keep them in sync)."""
    from PIL import Image
    w, h = img.size
    th, tw = raw_hw
    scale = max(th / h, tw / w)
    img = img.resize((max(tw, int(round(w * scale))),
                      max(th, int(round(h * scale)))), Image.BILINEAR)
    arr = np.asarray(img, np.uint8)
    y0 = (arr.shape[0] - th) // 2
    x0 = (arr.shape[1] - tw) // 2
    return arr[y0:y0 + th, x0:x0 + tw]


def decode_image(path: str, raw_hw: tuple[int, int]) -> np.ndarray:
    """Decode + cover-resize one image file to [raw_h, raw_w, 3] uint8.

    The fixed raw size keeps device-side shapes static (XLA requirement);
    the slight pre-crop resize matches common practice (resize shorter
    side then device-side random-resized-crop).
    """
    from PIL import Image
    return cover_resize_center_crop(Image.open(path).convert("RGB"),
                                    raw_hw)


def decode_image_native(path: str, raw_hw: tuple[int, int],
                        frac_yx: tuple[float, float] = (0.5, 0.5)
                        ) -> np.ndarray:
    """Decode + crop ``raw_hw`` at NATIVE resolution (no resampling).

    The super-resolution decode geometry: cover-resize would low-pass
    the HR detail the task is supposed to learn, so the crop keeps
    original pixels.  ``frac_yx`` places the crop window ((0.5, 0.5) =
    center; a random fraction gives per-image random crops).  Images
    smaller than ``raw_hw`` in either dimension fall back to
    cover-resize (upscale only — nothing is discarded).
    """
    from PIL import Image
    img = Image.open(path).convert("RGB")
    w, h = img.size
    th, tw = raw_hw
    if h < th or w < tw:
        return cover_resize_center_crop(img, raw_hw)
    y0 = int(round(frac_yx[0] * (h - th)))
    x0 = int(round(frac_yx[1] * (w - tw)))
    arr = np.asarray(img.crop((x0, y0, x0 + tw, y0 + th)), np.uint8)
    return arr


def decode_image_warp(path: str, raw_hw: tuple[int, int]) -> np.ndarray:
    """Decode + plain (aspect-warping) resize to [raw_h, raw_w, 3] uint8.

    The detection decode geometry: SSD-style detectors warp the whole
    frame to the network input, so NORMALIZED box coordinates survive the
    resize unchanged — no crop bookkeeping.  (cover_resize_center_crop
    would silently cut off boxes near the long edges.)
    """
    from PIL import Image
    th, tw = raw_hw
    img = Image.open(path).convert("RGB").resize((tw, th), Image.BILINEAR)
    return np.asarray(img, np.uint8)


class ArraySource:
    """In-memory images+labels (CIFAR-scale corpora).

    uint8 pools use the native threaded gather (native/dataloader.cc) to
    assemble contiguous batches; other dtypes fall back to numpy fancy
    indexing.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray):
        assert len(images) == len(labels)
        self.images = images
        self.labels = labels

    def __len__(self):
        return len(self.images)

    def get_batch(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        from myconvnet_tpu.data import native_loader
        idx = np.asarray(idx, np.int64)
        return (native_loader.gather_batch(self.images, idx),
                self.labels[idx])


class FileSource:
    """File-backed images decoded by a worker pool.

    labels may be int class ids or paths to segmentation masks (decoded
    with ``mask_hw`` when given).
    """

    def __init__(self, paths: Sequence[str], labels: Sequence,
                 raw_hw: tuple[int, int], workers: int = 8,
                 mask_hw: tuple[int, int] | None = None,
                 decode_mode: str = "cover",
                 rand_crop: bool = False, seed: int = 0):
        if decode_mode not in ("cover", "native_crop"):
            raise ValueError(f"decode_mode {decode_mode!r}; valid: "
                             "['cover', 'native_crop']")
        self.paths = list(paths)
        self.labels = list(labels)
        self.raw_hw = raw_hw
        self.mask_hw = mask_hw
        self.decode_mode = decode_mode
        self.rand_crop = rand_crop
        # crop-offset fractions are drawn on the calling thread (the
        # pool workers share this state; numpy RandomState is not
        # thread-safe)
        self._crop_rng = np.random.RandomState(seed)
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self.paths)

    def _decode_mask(self, path: str) -> np.ndarray:
        """Decode a label mask with the SAME cover-resize + center-crop
        geometry as the paired image (nearest sampling keeps labels
        exact) — an anisotropic resize here would misalign every pixel
        of a non-square pair against its image."""
        from PIL import Image
        img = None
        if path.lower().endswith(".png"):
            # native libpng raw decode: palette INDICES straight from the
            # container (PIL's path round-trips through its palette
            # machinery); geometry reuses the identical PIL NEAREST
            # resize below
            from myconvnet_tpu.data import native_loader
            if native_loader.native_png_available():
                with open(path, "rb") as f:
                    blob = f.read()
                raw = native_loader.decode_png(blob, "raw")
                if raw is not None:
                    img = Image.fromarray(raw, mode="L")
        if img is None:
            img = Image.open(path)
        w, h = img.size
        th, tw = self.mask_hw
        scale = max(th / h, tw / w)
        img = img.resize((max(tw, int(round(w * scale))),
                          max(th, int(round(h * scale)))), Image.NEAREST)
        arr = np.asarray(img, np.int32)
        y0 = (arr.shape[0] - th) // 2
        x0 = (arr.shape[1] - tw) // 2
        return arr[y0:y0 + th, x0:x0 + tw]

    def get_batch(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        paths = [self.paths[i] for i in idx]
        if self.decode_mode == "native_crop":
            if self.rand_crop:
                fracs = self._crop_rng.uniform(size=(len(paths), 2))
            else:
                fracs = np.full((len(paths), 2), 0.5)
            imgs = list(self._pool.map(
                lambda pf: decode_image_native(pf[0], self.raw_hw,
                                               tuple(pf[1])),
                zip(paths, fracs)))
            return (np.stack(imgs),
                    np.asarray([self.labels[i] for i in idx], np.int32))
        if self.mask_hw is None and paths and all(
                p.lower().endswith((".jpg", ".jpeg")) for p in paths):
            from myconvnet_tpu.data import native_loader
            if native_loader.native_jpeg_available():
                # native libjpeg path: threaded DCT-prescaled decode +
                # cover-resize in C (IO stays on the python pool)
                blobs = list(self._pool.map(
                    lambda p: open(p, "rb").read(), paths))
                imgs = native_loader.decode_jpeg_batch(blobs, self.raw_hw)
                return (imgs, np.asarray([self.labels[i] for i in idx],
                                         np.int32))
        imgs = list(self._pool.map(
            lambda i: decode_image(self.paths[i], self.raw_hw), idx))
        if self.mask_hw is not None:
            labels = list(self._pool.map(
                lambda i: self._decode_mask(self.labels[i]), idx))
            return np.stack(imgs), np.stack(labels)
        return (np.stack(imgs),
                np.asarray([self.labels[i] for i in idx], np.int32))


class ShardedSource:
    """Deterministic per-process shard of any source (multi-host input).

    Strided split (every ``shard_count``-th example starting at
    ``shard_index``): balanced to within one example and stable across
    processes without coordination — each host feeds its local chips a
    disjoint slice, the standard JAX multi-host input pattern.
    """

    def __init__(self, source, shard_index: int, shard_count: int):
        if not (0 <= shard_index < shard_count):
            raise ValueError(f"shard {shard_index}/{shard_count}")
        self.source = source
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._map = np.arange(shard_index, len(source), shard_count)

    def __len__(self):
        return len(self._map)

    def get_batch(self, idx: np.ndarray):
        return self.source.get_batch(self._map[np.asarray(idx)])

    @property
    def labels(self):
        """This shard's label view (int-label sources; pk sampling)."""
        inner = getattr(self.source, "labels", None)
        if inner is None:
            return None
        return np.asarray(inner)[self._map]


def batch_indices(n: int, batch_size: int, *, shuffle: bool, seed: int,
                  drop_remainder: bool = True,
                  epochs: int | None = None) -> Iterator[np.ndarray]:
    """Yield index batches; reshuffles every epoch (tf.data .shuffle)."""
    if drop_remainder and n < batch_size:
        raise ValueError(
            f"batch_size {batch_size} exceeds dataset size {n} with "
            "drop_remainder: no batch would ever be yielded")
    rng = np.random.RandomState(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        end = n - (n % batch_size) if drop_remainder else n
        for i in range(0, end, batch_size):
            yield order[i:i + batch_size]
        epoch += 1


def pk_batch_indices(labels: np.ndarray, p: int, k: int, *, seed: int,
                     epochs: int | None = None) -> Iterator[np.ndarray]:
    """P*K identity-balanced batches (metric learning): each batch is
    ``p`` distinct classes x ``k`` samples per class — the sampling
    scheme batch-hard triplet mining requires (every anchor is
    guaranteed k-1 positives and (p-1)*k negatives).  One epoch = one
    shuffled pass over the class list; classes with fewer than ``k``
    samples are sampled with replacement."""
    labels = np.asarray(labels).reshape(-1)
    classes = np.unique(labels)
    if len(classes) < p:
        raise ValueError(f"pk sampler needs >= {p} classes, corpus has "
                         f"{len(classes)}")
    by_class = {c: np.flatnonzero(labels == c) for c in classes}
    rng = np.random.RandomState(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(classes)
        for i in range(0, len(order) - p + 1, p):
            picks = []
            for c in order[i:i + p]:
                pool = by_class[c]
                picks.append(rng.choice(pool, k,
                                        replace=len(pool) < k))
            yield np.concatenate(picks)
        epoch += 1


def _window_batches(host_iter, window: int):
    """Group ``window`` host batches and stack each leaf on a new
    leading axis: K x (x [B,...], y [B,...]) -> (x [K,B,...], ...).
    The tail of a bounded iterator groups short (K' < window)."""
    it = iter(host_iter)
    while True:
        group = []
        for _ in range(window):
            try:
                group.append(next(it))
            except StopIteration:
                break
        if not group:
            return
        if len(group) == 1:
            # stack even a lone tail so the consumer sees one layout
            yield jax.tree.map(lambda z: np.stack([z]), group[0])
        else:
            yield jax.tree.map(lambda *zs: np.stack(zs), *group)


class Prefetcher:
    """Double-buffered host->device transfer on a background thread.

    Stages up to ``depth`` batches onto the device ahead of consumption
    (SURVEY §7 hard-part #2: prefetch depth >=2 hides transfer wholly
    behind compute).  ``device_put_fn`` controls placement — pass a
    sharded put for multi-chip.
    """

    def __init__(self, host_iter: Iterable, depth: int = 2,
                 device_put_fn: Callable | None = None):
        self._iter = iter(host_iter)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._put = device_put_fn or (
            lambda b: jax.tree.map(jax.device_put, b))
        self._done = object()
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    _stop = False

    def _worker(self):
        try:
            for batch in self._iter:
                if self._stop:
                    return
                staged = self._put(batch)
                while not self._stop:
                    try:
                        self._q.put(staged, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop:
                    return
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            if not self._stop:
                self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        if self._closed:
            raise StopIteration
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    _closed = False

    def close(self) -> None:
        """Release the worker thread (it may be blocked on a full queue
        behind an infinite iterator).  Safe to call multiple times."""
        if self._closed:
            return
        self._closed = True
        self._stop = True
        # drain so a put()-blocked worker can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


class DataSet:
    """Reference-API dataset: source + augmentation config + iterators."""

    def __init__(self, source, augment: AugmentConfig | None = None,
                 seed: int = 0, pk: tuple[int, int] | None = None):
        self.source = source
        self.augment = augment or AugmentConfig()
        self.seed = seed
        self.pk = pk  # (P, K) identity-balanced training batches

    def __len__(self):
        return len(self.source)

    def shard(self, index: int | None = None,
              count: int | None = None) -> "DataSet":
        """Per-process view for multi-host training: this host reads only
        its strided slice (defaults to jax.process_index/count).  The
        shuffle seed is offset by the shard index so epoch orders
        decorrelate across hosts."""
        if index is None:
            index = jax.process_index()
        if count is None:
            count = jax.process_count()
        if count == 1:
            return self
        return DataSet(ShardedSource(self.source, index, count),
                       augment=self.augment, seed=self.seed + index,
                       pk=self.pk)

    def _host_batches(self, batch_size, *, shuffle, epochs, drop_remainder,
                      seed_offset=0):
        for idx in batch_indices(len(self.source), batch_size,
                                 shuffle=shuffle,
                                 seed=self.seed + seed_offset,
                                 drop_remainder=drop_remainder,
                                 epochs=epochs):
            yield self.source.get_batch(idx)

    def train_iter(self, batch_size: int, *, epochs: int | None = None,
                   prefetch: int = 2, window: int = 1,
                   device_put_fn: Callable | None = None) -> Iterator:
        """Infinite (or epochs-bounded) shuffled uint8 batches, prefetched
        to device.  Device-side augmentation happens inside the train
        step, not here.

        ``window > 1`` (Trainer.chain_steps): group ``window`` host
        batches and np.stack them to [K, B, ...] BEFORE the prefetcher's
        background transfer, so the staged unit is a whole dispatch
        window and host->device transfer still overlaps device compute
        (stacking after the per-batch device_put would bounce the data
        device->host->device).  A bounded epoch's tail groups short."""
        if self.pk is not None:
            p, k = self.pk
            if p * k != batch_size:
                raise ValueError(f"pk={self.pk} batches are {p * k} "
                                 f"examples but batch_size={batch_size}")
            labels = getattr(self.source, "labels", None)
            if labels is None:
                raise ValueError("pk sampling needs a source with "
                                 ".labels (ArraySource/FileSource)")
            host = (self.source.get_batch(idx) for idx in
                    pk_batch_indices(np.asarray(labels), p, k,
                                     seed=self.seed, epochs=epochs))
        else:
            host = self._host_batches(batch_size, shuffle=True,
                                      epochs=epochs, drop_remainder=True)
        if window > 1:
            host = _window_batches(host, int(window))
        if prefetch <= 0:
            return host
        return Prefetcher(host, depth=prefetch,
                          device_put_fn=device_put_fn)

    def eval_iter(self, batch_size: int, *, prefetch: int = 2,
                  drop_remainder: bool = False,
                  device_put_fn: Callable | None = None) -> Iterator:
        """Deterministic full-epoch batches; the tail batch is SHORT when
        the split doesn't divide (the trainer pads it to keep shapes
        static and slices the outputs back — no example is dropped)."""
        host = self._host_batches(batch_size, shuffle=False, epochs=1,
                                  drop_remainder=drop_remainder)
        if prefetch <= 0:
            return host
        return Prefetcher(host, depth=prefetch,
                          device_put_fn=device_put_fn)
