"""CIFAR-10 WRN-28-10: the classic strong small-image baseline
(pad-crop + flip, SGD-nesterov, step decay, dropout 0.3).
"""

TOTAL_STEPS = 78200  # 200 epochs at batch 128

config = dict(
    task="classification",
    model="wrn_28_10",
    model_kwargs=dict(dropout_rate=0.3),
    dataset="cifar10",
    data_dir=None,
    num_classes=10,
    input_hw=(32, 32),
    raw_hw=(32, 32),
    batch_size=128,
    total_steps=TOTAL_STEPS,
    val_every=391,
    early_stop_patience=0,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, nesterov=True,
        weight_decay=5e-4, wd_exclude_norms=True,
        lr=dict(kind="step", lr=0.1,
                boundaries=[23460, 46920, 62560],   # epochs 60/120/160
                rates=[0.2, 0.04, 0.008])),
    augment=dict(out_hw=(32, 32), area_range=None, pad=4, flip=True,
                 mean=(0.4914, 0.4822, 0.4465),
                 std=(0.2470, 0.2435, 0.2616)),
    label_smoothing=0.0,
    precision="bf16",
    seed=0,
)
