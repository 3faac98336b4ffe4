"""Mask R-CNN (ResNet-50 FPN) instance segmentation on PASCAL VOC —
the instance-mask member of the detection family (beyond the reference
inventory, SURVEY.md §2 lists cls/seg/GAN only).

Point ``data_dir`` at a directory containing VOC2012/ (or VOCdevkit/)
with the SegmentationObject annotations; without it (or with
--synthetic) generated occluding-rectangle scenes with exact instance
maps keep the recipe smoke-testable.  Validation scores MASK mAP (the
Mask R-CNN paper's metric — pasted-mask IoU under the VOC matching
protocol; eval/detection.MaskMeanAPEvaluator).

The geometry augmentations are flips only (the paper's train-time
augmentation): expand/IoU-crop/mosaic are box-only transforms and the
instance-mask chain rejects them rather than desynchronizing boxes
from masks (train/rcnn.augment_instance_batch).
"""

TOTAL_STEPS = 90000

config = dict(
    task="detection",
    model="mask_rcnn",
    dataset="voc",
    data_dir=None,
    num_classes=21,          # 20 foreground + background id 0
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
    model_kwargs=dict(depth=50, num_samples=512, fg_fraction=0.25,
                      mask_samples=128),
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
