"""MobileNetV3-Large ImageNet recipe (extended zoo — round 4).

Howard et al. 2019 training shape: RMSprop in the paper, but the zoo's
momentum+cosine recipe trains V2-family nets to parity and keeps the
fused-step economics; EMA (paper's 0.9999) included.  Switch
``model="mobilenet_v3_small"`` for the Small variant.
"""

TOTAL_STEPS = 187650  # 150 epochs at batch 1024

config = dict(
    task="classification",
    model="mobilenet_v3_large",
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
        name="momentum", momentum_coef=0.9, weight_decay=1e-5,
        wd_exclude_norms=True, ema_decay=0.9999,
        lr=dict(kind="cosine", lr=0.4, total_steps=TOTAL_STEPS,
                warmup_steps=3128)),
    augment=dict(out_hw=(224, 224), area_range=(0.2, 1.0), flip=True,
                 brightness=0.4, contrast=0.4, saturation=0.4),
    precision="bf16",
    seed=0,
)
