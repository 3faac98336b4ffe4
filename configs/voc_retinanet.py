"""RetinaNet-ResNet50 object detection on PASCAL VOC (second detector
of the fourth task family — beyond the reference inventory).

FPN P3-P7 on a ResNet-50 trunk with weight-tied sigmoid heads and
focal loss (no hard-negative mining), 512x512 input, 49104 anchors.
Point ``data_dir`` at VOC2012/ (or VOCdevkit/); without it (or with
--synthetic) the run uses generated rectangle scenes.
"""

TOTAL_STEPS = 90000

config = dict(
    task="detection",
    model="retinanet",
    dataset="voc",
    data_dir=None,
    num_classes=21,          # 20 foreground + background id 0
    input_hw=(512, 512),
    max_boxes=64,
    batch_size=16,
    total_steps=TOTAL_STEPS,
    val_every=5000,
    log_every=100,
    # RetinaNet matching band + focal knobs (train/detection.py)
    match_iou=0.5,
    neg_iou=0.4,
    focal_alpha=0.25,
    focal_gamma=2.0,
    nms_iou=0.5,
    score_threshold=0.05,
    max_detections=100,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=1e-4,
        wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=1e-2, total_steps=TOTAL_STEPS,
                warmup_steps=1000)),
    # same SSD-style chain; expand is less critical with FPN's small
    # anchors, so keep the photometric + crop + flip core
    augment=dict(flip=True, expand_prob=0.3, expand_max=4.0,
                 iou_crop=True, brightness=0.125, contrast=0.5,
                 saturation=0.5, hue=0.05),
    precision="bf16",
    seed=0,
)
