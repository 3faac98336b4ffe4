"""FCOS (ResNet-50 FPN) anchor-free detection on PASCAL VOC — the
anchor-free member of the detection family (beyond the reference
inventory, SURVEY.md §2 lists cls/seg/GAN only).

Point ``data_dir`` at a VOC root; without it (or with --synthetic)
generated rectangle scenes keep the recipe smoke-testable.  The full
SSD-style on-device augmentation chain applies unchanged (targets are
computed from boxes in-program, after the geometry)."""

TOTAL_STEPS = 90000

config = dict(
    task="detection",
    model="fcos",
    dataset="voc",
    data_dir=None,
    num_classes=21,
    input_hw=(512, 512),
    max_boxes=64,
    batch_size=16,
    total_steps=TOTAL_STEPS,
    val_every=5000,
    log_every=100,
    nms_iou=0.45,
    score_threshold=0.05,
    max_detections=100,
    focal_alpha=0.25,
    focal_gamma=2.0,
    reg_weight=1.0,
    model_kwargs=dict(depth=50),
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=1e-4,
        clip_norm=1.0,  # FCOS diverges without warmup+clipping
        wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=5e-3, total_steps=TOTAL_STEPS,
                warmup_steps=1000)),
    augment=dict(flip=True, expand_prob=0.3, expand_max=4.0,
                 iou_crop=True, brightness=0.125, contrast=0.5,
                 saturation=0.5, hue=0.05),
    precision="bf16",
    seed=0,
)
