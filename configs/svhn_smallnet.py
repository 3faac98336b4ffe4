"""SVHN cropped digits: small ConvNet recipe."""

config = dict(
    task="classification",
    model="smallnet",
    model_kwargs=dict(width=32, dropout_rate=0.3),
    dataset="svhn",
    data_dir=None,                 # directory with *_32x32.mat files
    num_classes=10,
    input_hw=(32, 32),
    batch_size=128,
    total_steps=15000,
    val_every=1000,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=5e-4,
        wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=0.05, total_steps=15000,
                warmup_steps=500)),
    augment=dict(out_hw=(32, 32), area_range=None, pad=4, flip=False,
                 mean=(0.4377, 0.4438, 0.4728),
                 std=(0.1980, 0.2010, 0.1970)),
    precision="f32",
    seed=0,
)
