"""CIFAR-100 ResNet-18 recipe: pad-and-crop augmentation, SGDR schedule,
MixUp — the standard small-image benchmark setup.
"""

TOTAL_STEPS = 78200  # 200 epochs at batch 128 over 50k images

config = dict(
    task="classification",
    model="resnet18",
    model_kwargs=dict(),
    dataset="cifar100",
    data_dir=None,
    num_classes=100,
    input_hw=(32, 32),
    raw_hw=(32, 32),
    batch_size=128,
    total_steps=TOTAL_STEPS,
    val_every=391,
    early_stop_patience=0,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, nesterov=True,
        weight_decay=5e-4, wd_exclude_norms=True,
        lr=dict(kind="cosine_restarts", lr=0.1, first_decay_steps=3910,
                t_mul=2.0, warmup_steps=391)),
    augment=dict(out_hw=(32, 32), area_range=None, pad=4, flip=True,
                 mean=(0.5071, 0.4866, 0.4409),
                 std=(0.2673, 0.2564, 0.2762)),
    mix=dict(mixup_alpha=0.2, cutmix_alpha=0.0, prob=0.5),
    label_smoothing=0.0,
    precision="bf16",
    seed=0,
)
