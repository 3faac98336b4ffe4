"""PASCAL VOC subsets (SURVEY.md §2#8; BASELINE config #4).

Segmentation understands the standard VOCdevkit layout::

    VOC2012/JPEGImages/*.jpg
    VOC2012/SegmentationClass/*.png     (palette masks; 255 = ignore)
    VOC2012/ImageSets/Segmentation/{train,val}.txt

Detection (the fourth task family — beyond the reference inventory)
reads ``ImageSets/Main/{split}.txt`` + ``Annotations/*.xml`` and yields
fixed-shape padded targets (boxes [M,4] normalized xyxy, labels [M]
with -1 padding) for the static-shape TPU detection path
(train/detection.py).  Both have deterministic synthetic fallbacks.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from myconvnet_tpu.data.pipeline import (ArraySource, FileSource,
                                         decode_image_warp)

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


# ------------------------------------------------------------- detection

DET_CLASS_NAMES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
    "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor")
DET_NUM_CLASSES = 21  # 20 foreground + background id 0
# VOC semantic-segmentation ids are 0-based with 0 = background over
# the same 20 classes (detection labels are 1-based)
SEG_CLASS_NAMES = ("background", *DET_CLASS_NAMES)
DET_IMAGE_HW = (300, 300)  # SSD300 input
MAX_BOXES = 64  # >= VOC2012's densest image (56 objects)


def _parse_voc_xml(path: str, keep_difficult: bool | str = False
                   ) -> tuple[np.ndarray, np.ndarray]:
    """One Annotations/*.xml -> (boxes [m,4] normalized xyxy float32,
    labels [m] int32 in 1..20).  VOC pixel coords are 1-based inclusive.

    ``keep_difficult``: False drops ``difficult`` objects (the VOC
    train convention); True keeps them as normal labels; ``"mark"``
    keeps them encoded as ``-(class_id + 1)`` (<= -2, distinct from the
    -1 padding) — the matchers/augmentation already exclude anything
    < 0 from training, and MeanAPEvaluator decodes the marks into the
    VOC eval protocol's ignore zones (a detection on a difficult object
    is neither a TP nor an FP).
    """
    import xml.etree.ElementTree as ET
    root = ET.parse(path).getroot()
    size = root.find("size")
    w = float(size.findtext("width"))
    h = float(size.findtext("height"))
    name_to_id = {n: i + 1 for i, n in enumerate(DET_CLASS_NAMES)}
    boxes, labels = [], []
    for obj in root.iter("object"):
        difficult = (obj.findtext("difficult") or "0").strip() == "1"
        if difficult and not keep_difficult:
            continue
        name = (obj.findtext("name") or "").strip()
        if name not in name_to_id:
            continue
        bb = obj.find("bndbox")
        x1 = (float(bb.findtext("xmin")) - 1.0) / w
        y1 = (float(bb.findtext("ymin")) - 1.0) / h
        x2 = (float(bb.findtext("xmax")) - 1.0) / w
        y2 = (float(bb.findtext("ymax")) - 1.0) / h
        boxes.append([x1, y1, x2, y2])
        cid = name_to_id[name]
        labels.append(-(cid + 1) if difficult and keep_difficult == "mark"
                      else cid)
    boxes = np.clip(np.asarray(boxes, np.float32).reshape(-1, 4), 0.0, 1.0)
    return boxes, np.asarray(labels, np.int32)


def read_detection_subset(data_dir: str, split: str = "train",
                          keep_difficult: bool | str = False
                          ) -> tuple[list[str], list[tuple]]:
    """Returns (image_paths, annotations) where each annotation is an
    unpadded (boxes [m,4], labels [m]) pair from _parse_voc_xml."""
    for sub in ("VOC2012", "VOCdevkit/VOC2012", "VOC2007",
                "VOCdevkit/VOC2007", "."):
        root = os.path.normpath(os.path.join(data_dir, sub))
        lst = os.path.join(root, "ImageSets", "Main", f"{split}.txt")
        if os.path.exists(lst):
            break
    else:
        raise FileNotFoundError(
            f"no VOC ImageSets/Main/{split}.txt under {data_dir!r}")
    with open(lst) as f:
        ids = [line.split()[0] for line in f if line.strip()]
    imgs = [os.path.join(root, "JPEGImages", f"{i}.jpg") for i in ids]
    annos = [_parse_voc_xml(os.path.join(root, "Annotations", f"{i}.xml"),
                            keep_difficult) for i in ids]
    return imgs, annos


def pad_annotations(annos: list[tuple], max_boxes: int = MAX_BOXES
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Unpadded (boxes, labels) list -> fixed-shape arrays
    (boxes [N,M,4] float32, labels [N,M] int32, -1 marks padding).
    Images with more than ``max_boxes`` objects keep the largest ones."""
    n = len(annos)
    out_b = np.zeros((n, max_boxes, 4), np.float32)
    out_l = np.full((n, max_boxes), -1, np.int32)
    for i, (b, l) in enumerate(annos):
        if len(b) > max_boxes:
            area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            keep = np.argsort(-area)[:max_boxes]
            b, l = b[keep], l[keep]
        out_b[i, :len(b)] = b
        out_l[i, :len(l)] = l
    return out_b, out_l


class DetectionArraySource:
    """In-memory detection source: images uint8 [N,H,W,3] +
    padded targets (boxes [N,M,4], labels [N,M] with -1 padding)."""

    class_names = DET_CLASS_NAMES

    def __init__(self, images: np.ndarray, boxes: np.ndarray,
                 labels: np.ndarray):
        assert len(images) == len(boxes) == len(labels)
        self.images = images
        self.boxes = boxes
        self.labels = labels

    def __len__(self):
        return len(self.images)

    def get_batch(self, idx: np.ndarray):
        idx = np.asarray(idx)
        return self.images[idx], self.boxes[idx], self.labels[idx]


class DetectionFileSource:
    """File-backed detection source.

    Images are warp-resized (plain resize, NOT cover-crop — normalized
    box coordinates are invariant under a full-frame warp, the SSD
    convention; pipeline.decode_image_warp) by a worker pool; targets
    are pre-padded once at construction.
    """

    class_names = DET_CLASS_NAMES

    def __init__(self, paths: list[str], annos: list[tuple],
                 raw_hw: tuple[int, int] = DET_IMAGE_HW,
                 max_boxes: int = MAX_BOXES, workers: int = 8):
        self.paths = list(paths)
        self.raw_hw = raw_hw
        self.boxes, self.labels = pad_annotations(annos, max_boxes)
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self.paths)

    def get_batch(self, idx: np.ndarray):
        idx = np.asarray(idx)
        imgs = list(self._pool.map(
            lambda i: decode_image_warp(self.paths[i], self.raw_hw), idx))
        return np.stack(imgs), self.boxes[idx], self.labels[idx]


def synthetic_detection_subset(n: int = 64,
                               raw_hw: tuple[int, int] = DET_IMAGE_HW,
                               seed: int = 0, max_boxes: int = 8
                               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fake detection triplets: 1-3 class-colored rectangles per image on
    a noisy background, so mAP is learnable from pixels alone."""
    rng = np.random.RandomState(seed)
    h, w = raw_hw
    imgs = rng.rand(n, h, w, 3).astype(np.float32) * 0.15
    boxes = np.zeros((n, max_boxes, 4), np.float32)
    labels = np.full((n, max_boxes), -1, np.int32)
    for i in range(n):
        for k in range(rng.randint(1, 4)):
            c = rng.randint(1, DET_NUM_CLASSES)
            bw = rng.uniform(0.2, 0.5)
            bh = rng.uniform(0.2, 0.5)
            x1 = rng.uniform(0.0, 1.0 - bw)
            y1 = rng.uniform(0.0, 1.0 - bh)
            color = np.asarray([c / DET_NUM_CLASSES, (c % 5) / 5.0,
                                (c % 7) / 7.0])
            ys, xs = int(y1 * h), int(x1 * w)
            ye, xe = int((y1 + bh) * h), int((x1 + bw) * w)
            imgs[i, ys:ye, xs:xe] = color
            boxes[i, k] = (x1, y1, x1 + bw, y1 + bh)
            labels[i, k] = c
    imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    return imgs, boxes, labels


def make_detection_source(data_dir: str | None, split: str = "train",
                          synthetic: bool = False, synthetic_n: int = 64,
                          raw_hw: tuple[int, int] = DET_IMAGE_HW,
                          max_boxes: int = MAX_BOXES, workers: int = 8,
                          keep_difficult: bool | str | None = None):
    """``keep_difficult`` defaults to the VOC protocol: drop difficult
    objects for training, "mark" them (ignore-zone encoding) for any
    other split so eval scores them the devkit way."""
    if keep_difficult is None:
        # prefix test: "train", "trainval" etc. all train (matches
        # subsets/coco.py); everything else is an eval split
        keep_difficult = False if split.startswith("train") else "mark"
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        return DetectionArraySource(
            *synthetic_detection_subset(synthetic_n, raw_hw, seed,
                                        min(max_boxes, 8)))
    imgs, annos = read_detection_subset(data_dir, split, keep_difficult)
    return DetectionFileSource(imgs, annos, raw_hw, max_boxes, workers)


# --------------------------------------------------- instance segmentation

def _decode_index_png_warp(path: str, raw_hw: tuple[int, int]
                           ) -> np.ndarray:
    """Index-valued PNG (palette class/instance ids) -> [h,w] int32,
    warp-resized with NEAREST to match decode_image_warp's full-frame
    geometry.  Non-index modes (an RGB re-encode of the dataset) are
    collapsed to L so the result is always 2-D."""
    from PIL import Image
    th, tw = raw_hw
    img = Image.open(path)
    if img.mode not in ("P", "L", "I"):
        img = img.convert("L")
    img = img.resize((tw, th), Image.NEAREST)
    return np.asarray(img, np.int32)


def _decode_instance_png_warp(path: str, raw_hw: tuple[int, int]
                              ) -> np.ndarray:
    """SegmentationObject/*.png -> [h,w] int32 instance ids.  Palette
    index k is instance k (aligned with the Annotations XML object
    order — the VOC convention); 255 (instance boundaries) maps to 0
    so border pixels train as background rather than as a phantom
    256th instance."""
    ids = _decode_index_png_warp(path, raw_hw)
    return np.where(ids == 255, 0, ids)


class InstanceArraySource:
    """In-memory instance-segmentation source: detection triplets plus
    the instance-id map [N,H,W] int32 (0 background, gt row k stored as
    k+1 — the contract of train/rcnn.make_mask_rcnn_step)."""

    class_names = DET_CLASS_NAMES

    def __init__(self, images: np.ndarray, boxes: np.ndarray,
                 labels: np.ndarray, inst: np.ndarray):
        assert len(images) == len(boxes) == len(labels) == len(inst)
        self.images = images
        self.boxes = boxes
        self.labels = labels
        self.inst = inst

    def __len__(self):
        return len(self.images)

    def get_batch(self, idx: np.ndarray):
        idx = np.asarray(idx)
        return (self.images[idx], self.boxes[idx], self.labels[idx],
                self.inst[idx])


def synthetic_instance_subset(n: int = 64,
                              raw_hw: tuple[int, int] = (128, 128),
                              seed: int = 0, max_boxes: int = 8):
    """Fake instance quadruplets: the detection rectangles with an exact
    instance-id map.  Later rectangles occlude earlier ones in both the
    pixels and the map (boxes keep their full amodal extent — the
    occluded instance's visible mask shrinks, like real data)."""
    rng = np.random.RandomState(seed)
    h, w = raw_hw
    imgs = rng.rand(n, h, w, 3).astype(np.float32) * 0.15
    boxes = np.zeros((n, max_boxes, 4), np.float32)
    labels = np.full((n, max_boxes), -1, np.int32)
    inst = np.zeros((n, h, w), np.int32)
    for i in range(n):
        for k in range(rng.randint(1, 4)):
            c = rng.randint(1, DET_NUM_CLASSES)
            bw = rng.uniform(0.25, 0.5)
            bh = rng.uniform(0.25, 0.5)
            x1 = rng.uniform(0.0, 1.0 - bw)
            y1 = rng.uniform(0.0, 1.0 - bh)
            color = np.asarray([c / DET_NUM_CLASSES, (c % 5) / 5.0,
                                (c % 7) / 7.0])
            ys, xs = int(y1 * h), int(x1 * w)
            ye, xe = int((y1 + bh) * h), int((x1 + bw) * w)
            imgs[i, ys:ye, xs:xe] = color
            inst[i, ys:ye, xs:xe] = k + 1
            boxes[i, k] = (x1, y1, x1 + bw, y1 + bh)
            labels[i, k] = c
    imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    return imgs, boxes, labels, inst


def read_instance_subset(data_dir: str, split: str = "train"
                         ) -> tuple[list[str], list[str], list[tuple]]:
    """Instance-segmentation split: ImageSets/Segmentation ids that have
    a SegmentationObject mask, with their Annotations boxes.

    Returns (image_paths, object_mask_paths, annotations).  The XML is
    parsed with ALL objects kept in file order — instance id k in the
    PNG is the k-th <object> element, so any filtering would
    desynchronize boxes from mask ids.  ``difficult`` objects keep
    their row but carry the ``-(class_id + 1)`` mark encoding: the
    matchers exclude labels < 1 from training and
    MaskMeanAPEvaluator scores them as devkit-style ignore zones —
    the same protocol as the box-detection path.
    """
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
    ids = [i for i in ids if os.path.exists(
        os.path.join(root, "SegmentationObject", f"{i}.png"))]
    imgs = [os.path.join(root, "JPEGImages", f"{i}.jpg") for i in ids]
    masks = [os.path.join(root, "SegmentationObject", f"{i}.png")
             for i in ids]
    annos = [_parse_voc_xml(os.path.join(root, "Annotations", f"{i}.xml"),
                            keep_difficult="mark") for i in ids]
    return imgs, masks, annos


class InstanceFileSource:
    """File-backed instance-segmentation source: warp-resized images,
    NEAREST warp-resized SegmentationObject maps, padded annotations.

    Objects past ``max_boxes`` are truncated in FILE ORDER (not by
    area — order carries the box<->instance-id alignment) and their
    pixels cleared from the map.
    """

    class_names = DET_CLASS_NAMES

    def __init__(self, paths: list[str], mask_paths: list[str],
                 annos: list[tuple],
                 raw_hw: tuple[int, int] = (512, 512),
                 max_boxes: int = MAX_BOXES, workers: int = 8):
        self.paths = list(paths)
        self.mask_paths = list(mask_paths)
        self.raw_hw = raw_hw
        self.max_boxes = max_boxes
        n = len(annos)
        self.boxes = np.zeros((n, max_boxes, 4), np.float32)
        self.labels = np.full((n, max_boxes), -1, np.int32)
        for i, (b, l) in enumerate(annos):
            m = min(len(b), max_boxes)
            self.boxes[i, :m] = b[:m]
            self.labels[i, :m] = l[:m]
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self.paths)

    def _load_one(self, i: int):
        img = decode_image_warp(self.paths[i], self.raw_hw)
        inst = _decode_instance_png_warp(self.mask_paths[i], self.raw_hw)
        return img, np.where(inst > self.max_boxes, 0, inst)

    def get_batch(self, idx: np.ndarray):
        idx = np.asarray(idx)
        pairs = list(self._pool.map(self._load_one, idx))
        return (np.stack([p[0] for p in pairs]),
                self.boxes[idx], self.labels[idx],
                np.stack([p[1] for p in pairs]))


def make_instance_source(data_dir: str | None, split: str = "train",
                         synthetic: bool = False, synthetic_n: int = 64,
                         raw_hw: tuple[int, int] = (512, 512),
                         max_boxes: int = MAX_BOXES, workers: int = 8):
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        return InstanceArraySource(
            *synthetic_instance_subset(synthetic_n, raw_hw, seed,
                                       min(max_boxes, 8)))
    imgs, masks, annos = read_instance_subset(data_dir, split)
    return InstanceFileSource(imgs, masks, annos, raw_hw, max_boxes,
                              workers)


# ------------------------------------------------------------- panoptic

def synthetic_panoptic_subset(n: int = 64,
                              raw_hw: tuple[int, int] = (128, 128),
                              seed: int = 0, max_boxes: int = 8):
    """Instance quadruplets + the semantic map in models/panoptic.py's
    channel convention: 0 = thing pixels, 1 = background stuff."""
    imgs, boxes, labels, inst = synthetic_instance_subset(
        n, raw_hw, seed, max_boxes)
    sem = np.where(inst > 0, 0, 1).astype(np.int32)
    return imgs, boxes, labels, inst, sem


class PanopticArraySource(InstanceArraySource):
    """Instance source + semantic map [N,H,W] int32."""

    def __init__(self, images, boxes, labels, inst, sem):
        super().__init__(images, boxes, labels, inst)
        self.sem = sem

    def get_batch(self, idx: np.ndarray):
        idx = np.asarray(idx)
        return (*super().get_batch(idx), self.sem[idx])


class PanopticFileSource(InstanceFileSource):
    """VOC panoptic pairing: SegmentationObject instances +
    SegmentationClass semantics.  All 20 VOC classes are things, so
    the semantic map collapses to {0: thing pixels, 1: background
    stuff, 255: void boundaries} — the tiny-stuff-vocabulary case of
    the panoptic convention."""

    def __init__(self, paths, mask_paths, cls_paths, annos,
                 raw_hw=(512, 512), max_boxes=MAX_BOXES, workers=8):
        super().__init__(paths, mask_paths, annos, raw_hw, max_boxes,
                         workers)
        self.cls_paths = list(cls_paths)

    def _load_one(self, i: int):
        img, inst = super()._load_one(i)
        cls = _decode_index_png_warp(self.cls_paths[i], self.raw_hw)
        sem = np.where(inst > 0, 0, np.where(cls == 255, 255, 1))
        return img, inst, sem.astype(np.int32)

    def get_batch(self, idx: np.ndarray):
        idx = np.asarray(idx)
        trip = list(self._pool.map(self._load_one, idx))
        return (np.stack([t[0] for t in trip]), self.boxes[idx],
                self.labels[idx], np.stack([t[1] for t in trip]),
                np.stack([t[2] for t in trip]))


def make_panoptic_source(data_dir: str | None, split: str = "train",
                         synthetic: bool = False, synthetic_n: int = 64,
                         raw_hw: tuple[int, int] = (512, 512),
                         max_boxes: int = MAX_BOXES, workers: int = 8):
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        return PanopticArraySource(
            *synthetic_panoptic_subset(synthetic_n, raw_hw, seed,
                                       min(max_boxes, 8)))
    imgs, masks, annos = read_instance_subset(data_dir, split)
    cls_paths = [m.replace("SegmentationObject", "SegmentationClass")
                 for m in masks]
    missing = [p for p in cls_paths if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"{len(missing)} SegmentationClass masks missing "
            f"(first: {missing[0]!r})")
    return PanopticFileSource(imgs, masks, cls_paths, annos, raw_hw,
                              max_boxes, workers)
