"""BASELINE config #3a: VGG-16 classification (deep conv stacks)."""

TOTAL_STEPS = 112590

config = dict(
    task="classification",
    model="vgg16",
    model_kwargs=dict(use_bn=True),
    dataset="imagenet",
    data_dir=None,
    num_classes=1000,
    input_hw=(224, 224),
    raw_hw=(256, 256),
    batch_size=512,
    total_steps=TOTAL_STEPS,
    val_every=2502,
    early_stop_patience=0,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, wd_exclude_norms=True, weight_decay=1e-4,
        lr=dict(kind="cosine", lr=0.1, total_steps=TOTAL_STEPS,
                warmup_steps=3128)),
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0), flip=True,
                 brightness=0.4, contrast=0.4, saturation=0.4),
    precision="bf16",
    seed=0,
)
