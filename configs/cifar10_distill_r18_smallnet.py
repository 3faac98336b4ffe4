"""Knowledge distillation: a trained ResNet-18 teacher compresses into
smallnet on CIFAR-10 (the classic compress-the-zoo workflow; Hinton et
al.).  Point distill.ckpt at a finished configs/cifar100_resnet18-style
run (retargeted to CIFAR-10) — the fused teacher+student step costs one
extra forward inside the same XLA program."""

config = dict(
    task="distill",
    model="smallnet",                       # the student
    model_kwargs=dict(width=32, dropout_rate=0.0),
    distill=dict(
        teacher="resnet18",
        teacher_kwargs=dict(),
        ckpt=None,                          # REQUIRED: teacher run dir
        temperature=4.0,
        alpha=0.9,
    ),
    dataset="cifar10",
    data_dir=None,
    num_classes=10,
    input_hw=(32, 32),
    batch_size=128,
    total_steps=20000,
    val_every=500,
    log_every=100,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, wd_exclude_norms=True,
        weight_decay=5e-4,
        lr=dict(kind="cosine", lr=0.05, total_steps=20000,
                warmup_steps=500)),
    augment=dict(out_hw=(32, 32), area_range=None, pad=4, flip=True,
                 brightness=0.0, contrast=0.0, saturation=0.0,
                 mean=(0.4914, 0.4822, 0.4465),
                 std=(0.2470, 0.2435, 0.2616)),
    precision="f32",
    seed=0,
)
