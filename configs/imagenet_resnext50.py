"""ResNeXt-50 32x4d ImageNet recipe with MixUp/CutMix + random erasing.

Modern-regularizer variant of the headline recipe: grouped bottlenecks,
label mixing and erasing all run inside the same jitted step as the
geometric augmentation chain.
"""

TOTAL_STEPS = 112590  # 90 epochs at batch 1024

config = dict(
    task="classification",
    model="resnext50_32x4d",
    model_kwargs=dict(),
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
        name="momentum", momentum_coef=0.9, nesterov=True,
        weight_decay=1e-4, wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=0.4, total_steps=TOTAL_STEPS,
                warmup_steps=3128)),
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0),
                 aspect_range=(0.75, 4 / 3), flip=True,
                 brightness=0.4, contrast=0.4, saturation=0.4),
    # batch-level regularizers (data/mix.py) — smoothing folds into the
    # soft labels, so the plain loss-level smoothing stays off
    mix=dict(mixup_alpha=0.2, cutmix_alpha=1.0, prob=0.5,
             label_smoothing=0.1),
    erase_prob=0.25,
    label_smoothing=0.0,
    precision="bf16",
    seed=0,
)
