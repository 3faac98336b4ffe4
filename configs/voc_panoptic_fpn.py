"""Panoptic FPN (ResNet-50) on PASCAL VOC — joint instance + semantic
segmentation scored with panoptic quality (beyond the reference
inventory, SURVEY.md §2 lists cls/seg/GAN only).

Point ``data_dir`` at a VOC root whose split ids carry BOTH
SegmentationObject and SegmentationClass masks; without it (or with
--synthetic) generated occluding-rectangle scenes with exact instance
and semantic maps keep the recipe smoke-testable.  VOC has no stuff
vocabulary beyond background, so ``num_stuff=2`` (thing pixels,
background) — corpora with real stuff annotations slot into the same
channel convention (models/panoptic.py).
"""

TOTAL_STEPS = 90000

config = dict(
    task="detection",
    model="panoptic_fpn",
    dataset="voc",
    data_dir=None,
    num_classes=21,
    input_hw=(512, 512),
    max_boxes=64,
    batch_size=16,
    total_steps=TOTAL_STEPS,
    val_every=5000,
    log_every=100,
    rpn_pos_iou=0.7,
    rpn_neg_iou=0.3,
    rpn_samples=256,
    nms_iou=0.5,
    score_threshold=0.05,
    max_detections=100,
    sem_weight=0.5,          # the paper's lambda
    stuff_min_area=64,
    model_kwargs=dict(depth=50, num_samples=512, fg_fraction=0.25,
                      num_stuff=2, mask_samples=128),
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=1e-4,
        wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=5e-3, total_steps=TOTAL_STEPS,
                warmup_steps=1000)),
    augment=dict(flip=True, brightness=0.125, contrast=0.5,
                 saturation=0.5, hue=0.05),
    precision="bf16",
    seed=0,
)
