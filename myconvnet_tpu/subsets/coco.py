"""COCO detection subset: instances JSON -> framework detection source.

Beyond the reference inventory (SURVEY.md §2#8 lists CIFAR/ImageNet/VOC
prep) — the canonical large-scale detection corpus for the fourth task
family.  Standard layout:

    data_dir/
      annotations/instances_{split}.json
      {split}/  (e.g. train2017/, val2017/)  *.jpg

Conventions mirrored from subsets/voc.py so the detection recipe
surface is corpus-agnostic:

* boxes -> normalized xyxy float32 (COCO's [x, y, w, h] pixels divided
  by the images table's width/height);
* labels -> CONTIGUOUS 1..80 (COCO category ids are sparse, 1..90 with
  gaps — remapped over the sorted category table; 0 stays background);
* ``iscrowd`` regions are the COCO analogue of VOC ``difficult``:
  dropped for training, "mark"-encoded ``-(label + 1)`` for eval
  splits, which eval/detection.MeanAPEvaluator scores as ignore zones;
* fixed-shape padding via voc.pad_annotations (-1 label padding);
* no annotation file / no data_dir -> the deterministic synthetic
  rectangle scenes, so recipes smoke-test anywhere.
"""

from __future__ import annotations

import json
import os

import numpy as np

from myconvnet_tpu.subsets.voc import (DetectionArraySource,
                                       DetectionFileSource,
                                       synthetic_detection_subset)

COCO_NUM_CLASSES = 81  # 80 categories + background id 0


def load_instances(ann_path: str, keep_crowd: bool | str = False
                   ) -> tuple[list[str], list[tuple], list[str]]:
    """Parse an instances_*.json -> (file_names, annotations,
    class_names).  Annotations are unpadded (boxes [m,4] normalized
    xyxy, labels [m] int32) per image, in the JSON's images order;
    images without annotations get empty arrays (COCO val has them).

    ``keep_crowd``: False drops iscrowd regions; "mark" encodes them
    ``-(label + 1)`` (the evaluator's ignore convention); True keeps
    them as normal boxes.
    """
    with open(ann_path) as f:
        doc = json.load(f)
    cats = sorted(doc["categories"], key=lambda c: c["id"])
    cat_to_label = {c["id"]: i + 1 for i, c in enumerate(cats)}
    class_names = [c["name"] for c in cats]
    images = {im["id"]: im for im in doc["images"]}
    per_img: dict[int, list] = {im_id: [] for im_id in images}
    for ann in doc.get("annotations", []):
        crowd = bool(ann.get("iscrowd", 0))
        if crowd and not keep_crowd:
            continue
        im = images.get(ann["image_id"])
        if im is None:
            continue
        x, y, w, h = ann["bbox"]
        if w <= 0 or h <= 0:
            # COCO train2017 carries a handful of degenerate zero-area
            # annotations; kept, they would force-match an anchor onto
            # a log(0) regression target (pycocotools filters them too)
            continue
        iw, ih = float(im["width"]), float(im["height"])
        box = (x / iw, y / ih, (x + w) / iw, (y + h) / ih)
        label = cat_to_label[ann["category_id"]]
        if crowd and keep_crowd == "mark":
            label = -(label + 1)
        per_img[ann["image_id"]].append((box, label))
    names, annos = [], []
    for im_id, im in images.items():
        names.append(im["file_name"])
        rows = per_img[im_id]
        boxes = np.clip(np.asarray([r[0] for r in rows],
                                   np.float32).reshape(-1, 4), 0.0, 1.0)
        labels = np.asarray([r[1] for r in rows], np.int32)
        annos.append((boxes, labels))
    return names, annos, class_names


def read_detection_subset(data_dir: str, split: str = "train2017",
                          keep_crowd: bool | str = False
                          ) -> tuple[list[str], list[tuple], list[str]]:
    """(image_paths, annotations, class_names) for a COCO split."""
    ann = os.path.join(data_dir, "annotations",
                       f"instances_{split}.json")
    if not os.path.exists(ann):
        raise FileNotFoundError(f"no {ann!r}")
    names, annos, class_names = load_instances(ann, keep_crowd)
    img_dir = os.path.join(data_dir, split)
    return ([os.path.join(img_dir, n) for n in names], annos,
            class_names)


def make_detection_source(data_dir: str | None, split: str = "train2017",
                          synthetic: bool = False, synthetic_n: int = 64,
                          raw_hw: tuple[int, int] = (300, 300),
                          max_boxes: int = 100, workers: int = 8,
                          keep_crowd: bool | str | None = None):
    """COCO detection source; ``keep_crowd`` defaults to the protocol:
    drop for train splits, "mark" (ignore-zone encoding) otherwise."""
    if keep_crowd is None:
        keep_crowd = False if split.startswith("train") else "mark"
    if synthetic or data_dir is None:
        seed = 0 if split.startswith("train") else 1
        src = DetectionArraySource(
            *synthetic_detection_subset(synthetic_n, raw_hw, seed,
                                        min(max_boxes, 8)))
        # the synthetic scenes use generic ids, not the 80 COCO
        # categories — don't advertise VOC's class-name table
        src.class_names = None
        return src
    paths, annos, class_names = read_detection_subset(
        data_dir, split, keep_crowd)
    src = DetectionFileSource(paths, annos, raw_hw, max_boxes, workers)
    src.class_names = class_names
    return src


# ------------------------------------------------------------ keypoints

# COCO person-skeleton constants (the person_keypoints annotation
# convention): 17 keypoints in the canonical order; the flip
# permutation swaps every left<->right pair under horizontal flip;
# the OKS per-keypoint falloff constants are pycocotools' sigmas.
COCO_NUM_KEYPOINTS = 17
COCO_KP_FLIP_PERM = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13,
                     16, 15)
COCO_KP_SIGMAS = (0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079,
                  0.072, 0.072, 0.062, 0.062, 0.107, 0.107, 0.087,
                  0.087, 0.089, 0.089)


def load_keypoints(ann_path: str, keep_unlabeled: bool = False
                   ) -> tuple[list[str], list[tuple]]:
    """Parse a person_keypoints_*.json -> (file_names, annotations).

    Annotations per image: (boxes [m,4] normalized xyxy, labels [m]
    all 1 = person, kps [m,K,3] with x,y normalized to the image and
    the COCO visibility flag in channel 2).

    Crowd regions and zero-keypoint instances carry no heatmap
    supervision: with ``keep_unlabeled=False`` (the training protocol)
    they are dropped; with True (eval splits) they are KEPT with all
    visibilities forced to 0, which KeypointMeanAPEvaluator scores as
    ignore zones — a detection on one is neither TP nor FP, matching
    pycocotools' crowd/ignore handling.
    """
    with open(ann_path) as f:
        doc = json.load(f)
    images = {im["id"]: im for im in doc["images"]}
    per_img: dict[int, list] = {im_id: [] for im_id in images}
    for ann in doc.get("annotations", []):
        unlabeled = (ann.get("iscrowd", 0)
                     or ann.get("num_keypoints", 0) == 0)
        if unlabeled and not keep_unlabeled:
            continue
        im = images.get(ann["image_id"])
        if im is None:
            continue
        x, y, w, h = ann["bbox"]
        if w <= 0 or h <= 0:
            continue
        iw, ih = float(im["width"]), float(im["height"])
        kp = np.asarray(ann["keypoints"],
                        np.float32).reshape(-1, 3)
        kp[:, 0] /= iw
        kp[:, 1] /= ih
        if unlabeled:
            kp[:, 2] = 0.0  # ignore-zone marker for the evaluator
        box = (x / iw, y / ih, (x + w) / iw, (y + h) / ih)
        per_img[ann["image_id"]].append((box, kp))
    names, annos = [], []
    for im_id, im in images.items():
        rows = per_img[im_id]
        boxes = np.clip(np.asarray([r[0] for r in rows],
                                   np.float32).reshape(-1, 4), 0.0, 1.0)
        labels = np.ones((len(rows),), np.int32)
        kps = (np.stack([r[1] for r in rows])
               if rows else np.zeros((0, COCO_NUM_KEYPOINTS, 3),
                                     np.float32))
        names.append(im["file_name"])
        annos.append((boxes, labels, kps))
    return names, annos


def synthetic_keypoint_subset(n: int = 64,
                              raw_hw: tuple[int, int] = (128, 128),
                              seed: int = 0, max_boxes: int = 8,
                              num_keypoints: int = 4):
    """Fake keypoint quadruplets: single-class rectangles whose 4
    corner markers (TL, TR, BL, BR — flip_perm (1,0,3,2)) are drawn as
    bright dots, so keypoint localization is learnable from pixels.
    Extra keypoint channels beyond 4 stay unlabeled (visibility 0)."""
    rng = np.random.RandomState(seed)
    h, w = raw_hw
    imgs = rng.rand(n, h, w, 3).astype(np.float32) * 0.15
    boxes = np.zeros((n, max_boxes, 4), np.float32)
    labels = np.full((n, max_boxes), -1, np.int32)
    kps = np.zeros((n, max_boxes, num_keypoints, 3), np.float32)
    dot = max(h // 42, 1)
    for i in range(n):
        for k in range(rng.randint(1, 3)):
            bw = rng.uniform(0.3, 0.5)
            bh = rng.uniform(0.3, 0.5)
            x1 = rng.uniform(0.02, 0.98 - bw)
            y1 = rng.uniform(0.02, 0.98 - bh)
            x2, y2 = x1 + bw, y1 + bh
            imgs[i, int(y1 * h):int(y2 * h),
                 int(x1 * w):int(x2 * w)] = (0.35, 0.35, 0.35)
            corners = ((x1, y1), (x2, y1), (x1, y2), (x2, y2))
            colors = ((1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0))
            for j in range(min(4, num_keypoints)):
                cx, cy = corners[j]
                r0 = int(np.clip(cy * h - dot, 0, h - 1))
                c0 = int(np.clip(cx * w - dot, 0, w - 1))
                imgs[i, r0:r0 + 2 * dot, c0:c0 + 2 * dot] = colors[j]
                kps[i, k, j] = (cx, cy, 2.0)
            boxes[i, k] = (x1, y1, x2, y2)
            labels[i, k] = 1
    imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    return imgs, boxes, labels, kps


class KeypointArraySource:
    """In-memory keypoint source: detection triplets + keypoint rows
    [N,M,K,3] aligned with the boxes."""

    class_names = ["person"]

    def __init__(self, images, boxes, labels, kps):
        assert len(images) == len(boxes) == len(labels) == len(kps)
        self.images = images
        self.boxes = boxes
        self.labels = labels
        self.kps = kps

    def __len__(self):
        return len(self.images)

    def get_batch(self, idx):
        idx = np.asarray(idx)
        return (self.images[idx], self.boxes[idx], self.labels[idx],
                self.kps[idx])


class KeypointFileSource:
    """File-backed keypoint source: warp-resized images + padded
    (boxes, labels, keypoints).  Normalized coordinates are invariant
    under the full-frame warp, keypoints included."""

    class_names = ["person"]

    def __init__(self, paths: list[str], annos: list[tuple],
                 raw_hw: tuple[int, int] = (512, 512),
                 max_boxes: int = 32, workers: int = 8,
                 num_keypoints: int = COCO_NUM_KEYPOINTS):
        from myconvnet_tpu.data.pipeline import decode_image_warp
        self._decode = decode_image_warp
        self.paths = list(paths)
        self.raw_hw = raw_hw
        n = len(annos)
        self.boxes = np.zeros((n, max_boxes, 4), np.float32)
        self.labels = np.full((n, max_boxes), -1, np.int32)
        self.kps = np.zeros((n, max_boxes, num_keypoints, 3),
                            np.float32)
        for i, (b, l, kp) in enumerate(annos):
            m = min(len(b), max_boxes)
            if m:
                self.boxes[i, :m] = b[:m]
                self.labels[i, :m] = l[:m]
                self.kps[i, :m] = kp[:m]
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self.paths)

    def get_batch(self, idx):
        idx = np.asarray(idx)
        imgs = list(self._pool.map(
            lambda i: self._decode(self.paths[i], self.raw_hw), idx))
        return (np.stack(imgs), self.boxes[idx], self.labels[idx],
                self.kps[idx])


def make_keypoint_source(data_dir: str | None, split: str = "train2017",
                         synthetic: bool = False, synthetic_n: int = 64,
                         raw_hw: tuple[int, int] = (512, 512),
                         max_boxes: int = 32, workers: int = 8,
                         num_keypoints: int = COCO_NUM_KEYPOINTS,
                         keep_unlabeled: bool | None = None):
    """COCO person-keypoints source; synthetic corner-marker scenes
    (4 keypoints) when no corpus is mounted.  ``keep_unlabeled``
    defaults to the protocol: drop crowd/zero-keypoint persons for
    train splits, keep them as ignore zones otherwise."""
    if keep_unlabeled is None:
        keep_unlabeled = not split.startswith("train")
    if synthetic or data_dir is None:
        seed = 0 if split.startswith("train") else 1
        return KeypointArraySource(*synthetic_keypoint_subset(
            synthetic_n, raw_hw, seed, min(max_boxes, 8),
            num_keypoints))
    ann = os.path.join(data_dir, "annotations",
                       f"person_keypoints_{split}.json")
    if not os.path.exists(ann):
        raise FileNotFoundError(f"no {ann!r}")
    names, annos = load_keypoints(ann, keep_unlabeled)
    img_dir = os.path.join(data_dir, split)
    return KeypointFileSource([os.path.join(img_dir, n) for n in names],
                              annos, raw_hw, max_boxes, workers,
                              num_keypoints)
