"""COCO detection subset: instances JSON parsing, remap, crowd marks.

subsets/coco.py mirrors the VOC conventions (normalized xyxy, -1
padding, ignore-zone marking) over the COCO layout; these tests pin
the bbox geometry, the sparse-id -> contiguous-label remap, iscrowd
protocol defaults, and the recipe wiring.
"""

import json
import os

import numpy as np

from myconvnet_tpu.subsets import coco


def _write_coco(root, with_images=True):
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    doc = {
        "images": [
            {"id": 7, "file_name": "a.jpg", "width": 400, "height": 200},
            {"id": 9, "file_name": "b.jpg", "width": 100, "height": 100},
        ],
        # sparse ids on purpose: 1, 3, 90 must remap to 1, 2, 3
        "categories": [{"id": 90, "name": "toothbrush"},
                       {"id": 1, "name": "person"},
                       {"id": 3, "name": "car"}],
        "annotations": [
            {"image_id": 7, "category_id": 1, "iscrowd": 0,
             "bbox": [40.0, 20.0, 200.0, 100.0]},
            {"image_id": 7, "category_id": 90, "iscrowd": 1,
             "bbox": [0.0, 0.0, 40.0, 40.0]},
            {"image_id": 9, "category_id": 3, "iscrowd": 0,
             "bbox": [10.0, 10.0, 50.0, 50.0]},
        ],
    }
    ann = os.path.join(root, "annotations", "instances_val2017.json")
    with open(ann, "w") as f:
        json.dump(doc, f)
    if with_images:
        from PIL import Image
        img_dir = os.path.join(root, "val2017")
        os.makedirs(img_dir, exist_ok=True)
        for name, wh in (("a.jpg", (400, 200)), ("b.jpg", (100, 100))):
            Image.new("RGB", wh, (90, 120, 60)).save(
                os.path.join(img_dir, name))
    return ann


def test_load_instances_geometry_and_remap(tmp_path):
    ann = _write_coco(str(tmp_path), with_images=False)
    names, annos, class_names = coco.load_instances(ann)
    assert names == ["a.jpg", "b.jpg"]
    assert class_names == ["person", "car", "toothbrush"]  # sorted ids
    boxes, labels = annos[0]
    # crowd dropped by default -> one box; [x,y,w,h] px -> xyxy norm
    assert labels.tolist() == [1]  # category 1 -> label 1
    np.testing.assert_allclose(boxes[0], [0.1, 0.1, 0.6, 0.6],
                               atol=1e-6)
    boxes_b, labels_b = annos[1]
    assert labels_b.tolist() == [2]  # category 3 -> label 2
    np.testing.assert_allclose(boxes_b[0], [0.1, 0.1, 0.6, 0.6],
                               atol=1e-6)


def test_load_instances_crowd_marking(tmp_path):
    ann = _write_coco(str(tmp_path), with_images=False)
    _, annos, _ = coco.load_instances(ann, keep_crowd="mark")
    boxes, labels = annos[0]
    # toothbrush (category 90 -> label 3) is crowd: encoded -(3+1)
    assert sorted(labels.tolist()) == [-4, 1]
    _, annos_keep, _ = coco.load_instances(ann, keep_crowd=True)
    assert sorted(annos_keep[0][1].tolist()) == [1, 3]


def test_coco_source_protocol_defaults(tmp_path):
    _write_coco(str(tmp_path))
    src = coco.make_detection_source(str(tmp_path), "val2017",
                                     raw_hw=(64, 64), max_boxes=8)
    assert src.class_names == ["person", "car", "toothbrush"]
    x, b, l = src.get_batch(np.array([0, 1]))
    assert x.shape == (2, 64, 64, 3) and x.dtype == np.uint8
    assert b.shape == (2, 8, 4) and l.shape == (2, 8)
    # val split: crowd marked (<= -2 present), padding -1
    assert (l[0] <= -2).any() and (l == -1).any()
    # warp-resize keeps normalized boxes
    row = np.sort(l[0])[::-1]
    assert row[0] == 1


def test_coco_recipe_builds_and_steps_synthetic():
    import jax.numpy as jnp

    from myconvnet_tpu import recipes
    cfg = recipes.load_config("configs/coco_retinanet.py")
    cfg = dict(cfg, model="tinyretina", input_hw=(128, 128),
               batch_size=2, total_steps=2, max_boxes=8)
    state, step, predict, train_set, _val = recipes.build_detector(
        cfg, synthetic=True)
    batch = next(iter(train_set.train_iter(2, prefetch=0)))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # map_style=coco -> the threshold-sweep evaluator
    ev = recipes.build_evaluator(cfg)
    assert type(ev).__name__ == "COCOMeanAPEvaluator"


def test_load_instances_filters_degenerate_boxes(tmp_path):
    import json
    os.makedirs(os.path.join(str(tmp_path), "annotations"))
    doc = {"images": [{"id": 1, "file_name": "a.jpg",
                       "width": 100, "height": 100}],
           "categories": [{"id": 1, "name": "person"}],
           "annotations": [
               {"image_id": 1, "category_id": 1, "iscrowd": 0,
                "bbox": [10.0, 10.0, 0.0, 30.0]},   # zero width
               {"image_id": 1, "category_id": 1, "iscrowd": 0,
                "bbox": [10.0, 10.0, 30.0, 30.0]}]}  # fine
    ann = os.path.join(str(tmp_path), "annotations",
                       "instances_val2017.json")
    with open(ann, "w") as f:
        json.dump(doc, f)
    _, annos, _ = coco.load_instances(ann)
    assert len(annos[0][1]) == 1  # the degenerate one is gone


def test_synthetic_coco_source_has_no_voc_names():
    src = coco.make_detection_source(None, "val2017", synthetic=True,
                                     synthetic_n=4, raw_hw=(64, 64))
    assert src.class_names is None
