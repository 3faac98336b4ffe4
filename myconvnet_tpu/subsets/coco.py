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
