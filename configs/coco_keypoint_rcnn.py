"""Keypoint R-CNN (ResNet-50 FPN) person-pose estimation on COCO —
the keypoint member of the detection family (beyond the reference
inventory, SURVEY.md §2 lists cls/seg/GAN only).

Point ``data_dir`` at a COCO root (annotations/person_keypoints_*.json
+ split image dirs); without it (or with --synthetic) generated
corner-marker rectangle scenes (4 keypoints) keep the recipe
smoke-testable — drop ``num_keypoints`` to 4 for that case.
Validation scores keypoint mAP under OKS (the COCO keypoints metric,
pycocotools sigmas; eval/detection.KeypointMeanAPEvaluator).

Geometry augmentation is flips only, with the person skeleton's
left<->right channel permutation applied on flip
(subsets/coco.COCO_KP_FLIP_PERM via train/rcnn.augment_keypoint_batch).
"""

TOTAL_STEPS = 90000

config = dict(
    task="detection",
    model="keypoint_rcnn",
    dataset="coco",
    data_dir=None,
    num_classes=2,           # background + person
    input_hw=(512, 512),
    max_boxes=32,
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
                      num_keypoints=17, kp_samples=64),
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
