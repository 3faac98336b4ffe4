"""EfficientNet-B0 ImageNet recipe (extended zoo)."""

TOTAL_STEPS = 437400  # 350 epochs at batch 1024

config = dict(
    task="classification",
    model="efficientnet_b0",
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
        name="rmsprop", decay=0.9, momentum_coef=0.9, eps=1e-3,
        weight_decay=1e-5, wd_exclude_norms=True,
        lr=dict(kind="exponential", lr=0.256, decay_steps=3003,
                decay_rate=0.97, staircase=True, warmup_steps=1251)),
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0), flip=True,
                 randaugment=[2, 9]),
    label_smoothing=0.1,
    precision="bf16",
    seed=0,
)
