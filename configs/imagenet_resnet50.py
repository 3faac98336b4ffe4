"""BASELINE config #2: ResNet-50 ImageNet-style with full augmentation.

The headline benchmark recipe: bf16 compute, full random-resized-crop /
flip / color-jitter augmentation on device, cosine LR with warmup.
"""

TOTAL_STEPS = 112590  # 90 epochs at batch 1024 over 1.28M images

config = dict(
    task="classification",
    model="resnet50",
    model_kwargs=dict(),
    dataset="imagenet",
    data_dir=None,
    num_classes=1000,
    input_hw=(224, 224),
    raw_hw=(256, 256),
    batch_size=1024,
    total_steps=TOTAL_STEPS,
    val_every=1251,                # ~1 epoch
    early_stop_patience=0,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, wd_exclude_norms=True, weight_decay=1e-4,
        nesterov=True,
        lr=dict(kind="cosine", lr=0.4, total_steps=TOTAL_STEPS,
                warmup_steps=3128)),   # 2.5 epochs warmup, lr=0.4 @ 1024
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0),
                 aspect_range=(0.75, 4 / 3), flip=True,
                 brightness=0.4, contrast=0.4, saturation=0.4, hue=0.0),
    label_smoothing=0.1,
    precision="bf16",
    # 2 microbatches per step: measured ~4% faster than the monolithic
    # step at equal global batch on v5e (PERF_NOTES.md); BN statistics
    # come from 128-image microbatches (standard at this scale)
    accum_steps=2,
    seed=0,
)
