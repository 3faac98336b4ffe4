"""RetinaNet-ResNet50 on COCO 2017 (the detector/corpus pairing from
the focal-loss paper; fourth task family, beyond the reference
inventory).

Point ``data_dir`` at a directory holding annotations/ + train2017/ +
val2017/; without it (or with --synthetic) generated rectangle scenes
keep the recipe smoke-testable.  Scores as mAP@[.5:.95] (map_style
"coco"); iscrowd regions become eval ignore zones automatically.
"""

TOTAL_STEPS = 180000

config = dict(
    task="detection",
    model="retinanet",
    dataset="coco",
    data_dir=None,
    num_classes=81,          # 80 categories + background id 0
    input_hw=(512, 512),
    max_boxes=100,           # COCO's densest images (~93 objects)
    batch_size=16,
    total_steps=TOTAL_STEPS,
    val_every=10000,
    log_every=100,
    map_style="coco",
    match_iou=0.5,
    neg_iou=0.4,
    focal_alpha=0.25,
    focal_gamma=2.0,
    loc_loss="giou",
    nms_iou=0.5,
    score_threshold=0.05,
    max_detections=100,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=1e-4,
        wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=1e-2, total_steps=TOTAL_STEPS,
                warmup_steps=1000)),
    augment=dict(flip=True, expand_prob=0.3, expand_max=4.0,
                 iou_crop=True, brightness=0.125, contrast=0.5,
                 saturation=0.5, hue=0.05),
    precision="bf16",
    seed=0,
)
