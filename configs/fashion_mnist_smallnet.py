"""Fashion-MNIST quickstart: small ConvNet, CPU-runnable."""

config = dict(
    task="classification",
    model="smallnet",
    model_kwargs=dict(width=32, dropout_rate=0.3),
    dataset="fashion_mnist",
    data_dir=None,                 # point at the IDX files' directory
    num_classes=10,
    input_hw=(28, 28),
    batch_size=128,
    total_steps=5000,
    val_every=500,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=1e-4,
        wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=0.05, total_steps=5000,
                warmup_steps=200)),
    augment=dict(out_hw=(28, 28), area_range=None, pad=2, flip=False,
                 mean=(0.2860, 0.2860, 0.2860),
                 std=(0.3530, 0.3530, 0.3530)),
    precision="f32",
    seed=0,
)
