"""BASELINE config #3b: DenseNet-121 (dense-block concatenation)."""

TOTAL_STEPS = 112590

config = dict(
    task="classification",
    model="densenet121",
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
        name="momentum", momentum_coef=0.9, wd_exclude_norms=True, weight_decay=1e-4,
        nesterov=True,
        lr=dict(kind="cosine", lr=0.4, total_steps=TOTAL_STEPS,
                warmup_steps=3128)),
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0), flip=True,
                 brightness=0.4, contrast=0.4, saturation=0.4),
    precision="bf16",
    seed=0,
)
