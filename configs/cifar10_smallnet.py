"""BASELINE config #1: small ConvNet on CIFAR-10 (CPU-runnable default)."""

config = dict(
    task="classification",
    model="smallnet",
    model_kwargs=dict(width=32, dropout_rate=0.5),
    dataset="cifar10",
    data_dir=None,                 # None + --synthetic -> generated data
    num_classes=10,
    input_hw=(32, 32),
    batch_size=128,
    total_steps=20000,
    val_every=500,
    early_stop_patience=0,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, wd_exclude_norms=True, weight_decay=5e-4,
        lr=dict(kind="cosine", lr=0.1, total_steps=20000,
                warmup_steps=500)),
    augment=dict(out_hw=(32, 32), area_range=None, pad=4, flip=True,
                 brightness=0.0, contrast=0.0, saturation=0.0,
                 mean=(0.4914, 0.4822, 0.4465),
                 std=(0.2470, 0.2435, 0.2616)),
    precision="f32",               # CPU-runnable recipe keeps f32
    seed=0,
)
