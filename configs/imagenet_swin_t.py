"""Swin-T ImageNet recipe (Liu et al., 2021 training setup).

Hierarchical windowed attention: every stage is batched [B*nW, 49, C]
MXU einsum chains with static window counts; the shifted-window
interaction is a lane roll + static mask (models/swin.py).  Same
augmentation/optimization family as the ViT recipe (AdamW + cosine +
RandAugment + mixup/cutmix + stochastic depth).
"""

TOTAL_STEPS = 375300  # 300 epochs at batch 1024

config = dict(
    task="classification",
    model="swin_t",
    model_kwargs=dict(drop_path_rate=0.2),
    dataset="imagenet",
    data_dir=None,
    num_classes=1000,
    input_hw=(224, 224),
    raw_hw=(256, 256),
    batch_size=1024,
    total_steps=TOTAL_STEPS,
    val_every=1251,
    early_stop_patience=0,
    optimizer=dict(
        name="adamw", b1=0.9, b2=0.999, weight_decay=0.05,
        wd_exclude_norms=True, clip_norm=1.0,
        lr=dict(kind="cosine", lr=1e-3, total_steps=TOTAL_STEPS,
                alpha=1e-5, warmup_steps=6255)),  # 5-epoch warmup
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0), flip=True,
                 randaugment=[2, 9]),
    mix=dict(mixup_alpha=0.8, cutmix_alpha=1.0, prob=0.5),
    label_smoothing=0.1,
    precision="bf16",
    seed=0,
)
