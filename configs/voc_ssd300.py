"""SSD300 object detection on PASCAL VOC (the fourth task family —
beyond the reference inventory, SURVEY.md §2 lists cls/seg/GAN only).

Point ``data_dir`` at a directory containing VOC2012/ (or VOCdevkit/);
without it (or with --synthetic) the run uses generated rectangle scenes
so the recipe smoke-tests anywhere.  Schedule follows the SSD paper's
VOC07+12 recipe scaled to the 120k-step horizon.
"""

TOTAL_STEPS = 120000

config = dict(
    task="detection",
    model="ssd300",
    dataset="voc",
    data_dir=None,
    num_classes=21,          # 20 foreground + background id 0
    input_hw=(300, 300),
    max_boxes=64,
    batch_size=32,
    total_steps=TOTAL_STEPS,
    val_every=5000,
    log_every=100,
    # matching / loss / postprocess knobs (train/detection.py defaults)
    match_iou=0.5,
    neg_pos_ratio=3.0,
    nms_iou=0.45,
    score_threshold=0.05,
    max_detections=100,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=5e-4,
        wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=1e-3, total_steps=TOTAL_STEPS,
                warmup_steps=2000)),
    # the SSD paper's full on-device chain: zoom-out expand (p=0.5, up
    # to 4x, mean fill), IoU-constrained zoom-in crop, photometric
    # distortion (Caffe-SSD magnitudes), box-aware hflip, imagenet norm
    augment=dict(flip=True, expand_prob=0.5, expand_max=4.0,
                 iou_crop=True, brightness=0.125, contrast=0.5,
                 saturation=0.5, hue=0.05),
    precision="bf16",
    seed=0,
)
