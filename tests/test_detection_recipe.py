"""Detection recipe surface: VOC XML parsing, padded targets, on-device
preprocessing, and the build_detector -> train -> evaluate chain (on the
CPU-runnable tinydet smoke detector)."""

import os

import numpy as np
import pytest

from myconvnet_tpu import recipes
from myconvnet_tpu.subsets import voc

TINY_CFG = dict(
    task="detection",
    model="tinydet",
    dataset="voc",
    data_dir=None,
    num_classes=21,
    max_boxes=8,
    batch_size=4,
    total_steps=10,
    optimizer=dict(name="momentum", momentum_coef=0.9,
                   lr=dict(kind="constant", lr=0.05)),
    augment=dict(flip=True),
    seed=0,
)


# ------------------------------------------------------------ VOC layout

VOC_XML = """<annotation>
  <size><width>400</width><height>200</height><depth>3</depth></size>
  <object>
    <name>dog</name><difficult>0</difficult>
    <bndbox><xmin>41</xmin><ymin>21</ymin><xmax>241</xmax><ymax>121</ymax></bndbox>
  </object>
  <object>
    <name>cat</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>100</xmax><ymax>100</ymax></bndbox>
  </object>
  <object>
    <name>not_a_voc_class</name><difficult>0</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>50</xmax><ymax>50</ymax></bndbox>
  </object>
</annotation>
"""


def _write_voc_tree(root):
    """Two-image VOCdevkit/VOC2012 detection layout."""
    from PIL import Image
    base = os.path.join(root, "VOC2012")
    os.makedirs(os.path.join(base, "ImageSets", "Main"))
    os.makedirs(os.path.join(base, "JPEGImages"))
    os.makedirs(os.path.join(base, "Annotations"))
    for name in ("img0", "img1"):
        Image.new("RGB", (400, 200), (120, 90, 60)).save(
            os.path.join(base, "JPEGImages", f"{name}.jpg"))
        with open(os.path.join(base, "Annotations", f"{name}.xml"),
                  "w") as f:
            f.write(VOC_XML)
    with open(os.path.join(base, "ImageSets", "Main", "train.txt"),
              "w") as f:
        f.write("img0\nimg1\n")
    return root


def test_parse_voc_xml_geometry_and_filters(tmp_path):
    p = tmp_path / "a.xml"
    p.write_text(VOC_XML)
    boxes, labels = voc._parse_voc_xml(str(p))
    # difficult cat and the unknown class are dropped
    assert labels.tolist() == [voc.DET_CLASS_NAMES.index("dog") + 1]
    # 1-based inclusive pixels -> normalized: (41-1)/400 = 0.1 etc.
    np.testing.assert_allclose(boxes[0], [0.1, 0.1, 0.6, 0.6], atol=1e-6)
    # keep_difficult keeps the cat
    boxes2, labels2 = voc._parse_voc_xml(str(p), keep_difficult=True)
    assert len(labels2) == 2
    assert voc.DET_CLASS_NAMES.index("cat") + 1 in labels2.tolist()


def test_read_detection_subset_and_file_source(tmp_path):
    _write_voc_tree(str(tmp_path))
    imgs, annos = voc.read_detection_subset(str(tmp_path), "train")
    assert len(imgs) == 2 and len(annos) == 2
    src = voc.DetectionFileSource(imgs, annos, raw_hw=(96, 96),
                                  max_boxes=8)
    x, b, l = src.get_batch(np.array([0, 1]))
    assert x.shape == (2, 96, 96, 3) and x.dtype == np.uint8
    assert b.shape == (2, 8, 4) and l.shape == (2, 8)
    assert (l[:, 0] > 0).all() and (l[:, 1:] == -1).all()
    # warp geometry: normalized boxes pass through the resize unchanged
    np.testing.assert_allclose(b[0, 0], [0.1, 0.1, 0.6, 0.6], atol=1e-6)


def test_pad_annotations_keeps_largest():
    boxes = np.array([[0.0, 0.0, 0.1, 0.1],
                      [0.0, 0.0, 0.9, 0.9],
                      [0.0, 0.0, 0.5, 0.5]], np.float32)
    labels = np.array([1, 2, 3], np.int32)
    out_b, out_l = voc.pad_annotations([(boxes, labels)], max_boxes=2)
    assert out_l[0].tolist().count(-1) == 0
    assert set(out_l[0].tolist()) == {2, 3}  # two largest survive


def test_preprocess_batch_hflip_moves_boxes():
    import jax

    from myconvnet_tpu.train.detection import preprocess_batch
    imgs = np.zeros((4, 8, 8, 3), np.uint8)
    imgs[:, :, 0, 0] = 255  # marker on the left edge
    boxes = np.tile(np.array([[0.1, 0.2, 0.4, 0.8]], np.float32),
                    (4, 1)).reshape(4, 1, 4)
    x, b = preprocess_batch(jax.numpy.asarray(imgs),
                            jax.numpy.asarray(boxes),
                            jax.random.key(3), hflip=True)
    x, b = np.asarray(x), np.asarray(b)
    flipped = np.abs(b[:, 0, 0] - 0.6) < 1e-6
    unflipped = np.abs(b[:, 0, 0] - 0.1) < 1e-6
    assert (flipped | unflipped).all()
    assert flipped.any() and unflipped.any(), "key 3 should mix flips"
    # pixels moved with the boxes
    assert (x[flipped][:, :, -1, 0] > 0.99).all()
    assert (x[unflipped][:, :, 0, 0] > 0.99).all()


def test_synthetic_source_shapes():
    src = voc.make_detection_source(None, "train", synthetic=True,
                                    synthetic_n=8, raw_hw=(96, 96),
                                    max_boxes=8)
    x, b, l = src.get_batch(np.arange(4))
    assert x.shape == (4, 96, 96, 3) and x.dtype == np.uint8
    assert b.shape == (4, 8, 4) and l.shape == (4, 8)
    assert (l.max(axis=1) >= 1).all()  # every image has an object


# ---------------------------------------------------------------- e2e

def test_build_detector_trains_and_evaluates():
    state, step, predict, train_set, val_set = recipes.build_detector(
        TINY_CFG, synthetic=True)
    evaluator = recipes.build_evaluator(TINY_CFG)
    assert evaluator.name == "mAP"
    it = train_set.train_iter(4, prefetch=0)
    first = None
    for i, batch in enumerate(it):
        if i >= 10:
            break
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last) and last < first, f"loss {first} -> {last}"
    score = recipes.evaluate_detection(state, predict, val_set, 4,
                                       evaluator)
    assert 0.0 <= score <= 1.0


def test_detection_config_loads():
    cfg = recipes.load_config("configs/voc_ssd300.py")
    assert cfg["task"] == "detection" and cfg["model"] == "ssd300"
    # the recipe's knobs all exist on the builder surface
    from myconvnet_tpu.models import get_model
    fn = get_model(cfg["model"])
    assert fn.input_hw == tuple(cfg["input_hw"])


def test_detection_sources_reject_unknown_dataset():
    with pytest.raises(ValueError, match="detection dataset"):
        recipes.make_detection_sources(dict(TINY_CFG, dataset="cifar10"),
                                       synthetic=True)


def test_parse_voc_xml_mark_difficult(tmp_path):
    p = tmp_path / "a.xml"
    p.write_text(VOC_XML)
    boxes, labels = voc._parse_voc_xml(str(p), keep_difficult="mark")
    cat = voc.DET_CLASS_NAMES.index("cat") + 1
    dog = voc.DET_CLASS_NAMES.index("dog") + 1
    # the difficult cat is kept, encoded -(id+1); the dog stays positive
    assert sorted(labels.tolist()) == sorted([dog, -(cat + 1)])
    # the encoding survives padding and stays distinct from -1
    b, l = voc.pad_annotations([(boxes, labels)], max_boxes=4)
    assert set(l[0].tolist()) == {dog, -(cat + 1), -1}


def test_mean_ap_difficult_is_ignore_zone():
    """VOC devkit protocol: a detection matched to a difficult object
    is neither TP nor FP, and difficult objects don't count in the
    recall denominator."""
    from myconvnet_tpu.eval.detection import MeanAPEvaluator
    gt_b = np.array([[[0.0, 0.0, 0.4, 0.4],     # normal A, class 1
                      [0.6, 0.6, 0.9, 0.9],     # DIFFICULT, class 1
                      [0.0, 0.5, 0.3, 0.9]]],   # normal B, class 1
                    np.float32)
    gt_l = np.array([[1, -2, 1]], np.int32)     # -2 == -(1 + 1)
    det_b = np.array([[[0.0, 0.0, 0.4, 0.4],    # rank 0: hits A
                       [0.6, 0.6, 0.9, 0.9],    # rank 1: hits difficult
                       [0.0, 0.5, 0.3, 0.9]]],  # rank 2: hits B
                     np.float32)
    det_s = np.array([[0.9, 0.8, 0.7]], np.float32)
    det_l = np.array([[1, 1, 1]], np.int32)
    det_v = np.array([[True, True, True]])
    ev = MeanAPEvaluator(num_classes=2)
    ev.update((det_b, det_s, det_l, det_v), (gt_b, gt_l))
    # TP, IGNORED, TP: the ignored middle detection vanishes from the
    # ranking and the difficult gt is out of the recall denominator ->
    # a perfect PR curve
    np.testing.assert_allclose(ev.score(), 1.0)
    # control: with the difficult row simply dropped from the targets,
    # the middle detection is an FP between the two TPs ->
    # AP = 0.5 * 1 + 0.5 * (2/3)
    ev2 = MeanAPEvaluator(num_classes=2)
    ev2.update((det_b, det_s, det_l, det_v),
               (gt_b[:, ::2], gt_l[:, ::2]))
    np.testing.assert_allclose(ev2.score(), 0.5 + 0.5 * 2 / 3, atol=1e-6)


def test_make_detection_source_marks_difficult_for_val(tmp_path):
    _write_voc_tree(str(tmp_path))
    # val-ish split file reusing the same ids
    base = os.path.join(str(tmp_path), "VOC2012", "ImageSets", "Main")
    with open(os.path.join(base, "val.txt"), "w") as f:
        f.write("img0\n")
    src = voc.make_detection_source(str(tmp_path), "val")
    _x, _b, l = src.get_batch(np.array([0]))
    cat = voc.DET_CLASS_NAMES.index("cat") + 1
    assert -(cat + 1) in l[0].tolist()  # difficult marked, not dropped
    src_tr = voc.make_detection_source(str(tmp_path), "train")
    _x, _b, lt = src_tr.get_batch(np.array([0]))
    assert (lt[0] >= -1).all()  # train drops difficult entirely


@pytest.mark.slow
def test_build_detector_pretrained_vgg_warm_start(tmp_path):
    """Config-level detection warm start: a torch-saved vgg16_bn
    state_dict lands in the SSD300 trunk through build_detector's
    pretrained= block."""
    import torch
    torch.manual_seed(0)
    cfg_t = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
    layers, c_in = [], 3
    for v in cfg_t:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers += [torch.nn.Conv2d(c_in, v, 3, padding=1),
                       torch.nn.BatchNorm2d(v),
                       torch.nn.ReLU(inplace=True)]
            c_in = v
    tv = torch.nn.Module()
    tv.features = torch.nn.Sequential(*layers)
    path = str(tmp_path / "vgg.pt")
    torch.save(tv.state_dict(), path)

    cfg = dict(task="detection", model="ssd300", dataset="voc",
               data_dir=None, num_classes=21, max_boxes=8, batch_size=1,
               total_steps=1, pretrained=dict(path=path),
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=dict(kind="constant", lr=0.01)),
               augment=dict(flip=True), seed=0)
    state, _step, _pred, _t, _v = recipes.build_detector(cfg,
                                                         synthetic=True)
    want = np.transpose(
        tv.features[14].weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(state.params["backbone/conv_4"]["w"]), want,
        atol=1e-6)


def test_make_detector_inference_int8_agrees_with_f32():
    """The int8 serving chain (calibrated static scales) must keep the
    bf16/f32 chain's detections: same top label, close score."""
    import jax.numpy as jnp
    cfg = dict(TINY_CFG, total_steps=8)
    state, step, _p, train_set, _v = recipes.build_detector(
        cfg, synthetic=True)
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, _m = step(state, batch)
        if i >= 7:
            break
    imgs = np.asarray(train_set.source.get_batch(np.arange(4))[0],
                      np.float32) / 255.0
    f32_fn = recipes.make_detector_inference(cfg, state)
    i8_fn = recipes.make_detector_inference(cfg, state, int8=True,
                                            calibrate_with=[imgs])
    fb, fs, fl, fv = (np.asarray(t) for t in f32_fn(jnp.asarray(imgs)))
    ib, is_, il, iv = (np.asarray(t) for t in i8_fn(jnp.asarray(imgs)))
    assert fv.any() and iv.any()
    # top detection agrees per image where both emit something
    for i in range(4):
        if fv[i, 0] and iv[i, 0]:
            assert fl[i, 0] == il[i, 0]
            np.testing.assert_allclose(is_[i, 0], fs[i, 0], atol=0.25)
