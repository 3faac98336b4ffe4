"""Faster R-CNN (ResNet-50 FPN) object detection on PASCAL VOC — the
two-stage member of the detection family (beyond the reference
inventory, SURVEY.md §2 lists cls/seg/GAN only).

Point ``data_dir`` at a directory containing VOC2012/ (or VOCdevkit/);
without it (or with --synthetic) generated rectangle scenes keep the
recipe smoke-testable.  Hyperparameters follow the torchvision VOC/COCO
fine-tuning conventions (0.5 score-space, 256 RPN samples, 512 RoIs at
25% foreground); warm-start the backbone with
``pretrained=dict(path=..., arch="resnet", depth=50)``.
"""

TOTAL_STEPS = 90000

config = dict(
    task="detection",
    model="faster_rcnn",
    dataset="voc",
    data_dir=None,
    num_classes=21,          # 20 foreground + background id 0
    input_hw=(512, 512),
    max_boxes=64,
    batch_size=16,
    total_steps=TOTAL_STEPS,
    val_every=5000,
    log_every=100,
    # two-stage knobs (train/rcnn.py): RPN match band + sample count;
    # second stage samples/quota live in model_kwargs below
    rpn_pos_iou=0.7,
    rpn_neg_iou=0.3,
    rpn_samples=256,
    nms_iou=0.5,
    score_threshold=0.05,
    max_detections=100,
    model_kwargs=dict(depth=50, num_samples=512, fg_fraction=0.25),
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=1e-4,
        wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=5e-3, total_steps=TOTAL_STEPS,
                warmup_steps=1000)),
    augment=dict(flip=True, expand_prob=0.3, expand_max=4.0,
                 iou_crop=True, brightness=0.125, contrast=0.5,
                 saturation=0.5, hue=0.05),
    precision="bf16",
    seed=0,
)
