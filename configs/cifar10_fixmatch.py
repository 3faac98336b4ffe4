"""FixMatch on CIFAR-10 with 4000 labels (Sohn et al., 2020 — the
paper's WRN-28-2 recipe: weak flip+shift / strong RandAugment
consistency, confidence 0.95, 1:7 labeled:unlabeled, SGD-nesterov with
cosine decay, EMA 0.999 evaluation).  Eighth task family
(train/semisup.py); paper reference: 95.7% test accuracy at 4000
labels.
"""

TOTAL_STEPS = 2 ** 20  # the paper's 1M-step schedule

config = dict(
    task="semisup",
    model="wide_resnet",
    model_kwargs=dict(depth=28, width_mult=2),
    dataset="cifar10",
    data_dir=None,
    num_classes=10,
    labeled_per_class=400,   # 4000 labels total
    mu=7,                    # unlabeled:labeled batch ratio
    threshold=0.95,
    lambda_u=1.0,
    ema_decay=0.999,
    batch_size=64,
    total_steps=TOTAL_STEPS,
    log_every=200,
    val_every=5000,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, nesterov=True,
        weight_decay=5e-4, wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=0.03, total_steps=TOTAL_STEPS)),
    augment=dict(out_hw=(32, 32), area_range=None, pad=4, flip=True,
                 mean=(0.4914, 0.4822, 0.4465),
                 std=(0.2470, 0.2435, 0.2616)),
    augment_strong=dict(randaugment=(2, 10)),
    precision="bf16",
    seed=0,
)
