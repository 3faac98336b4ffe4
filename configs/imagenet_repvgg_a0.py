"""RepVGG-A0 ImageNet classification (Ding et al. 2021).

Train-time multi-branch blocks (3x3+BN, 1x1+BN, identity BN); deploy
by structural re-parameterization into a plain 3x3 conv stack —
``models.repvgg.deploy_params`` + ``repvgg_deploy`` fold the trained
checkpoint for serving (the shape this MXU likes best; see
PERF_NOTES round 3).  Paper recipe: SGD momentum, 120 epochs cosine,
simple augmentation.
"""

EPOCH_STEPS = 1281167 // 256
TOTAL_STEPS = 120 * EPOCH_STEPS

config = dict(
    task="classification",
    model="repvgg_a0",
    model_kwargs={},
    dataset="imagenet",
    data_dir=None,
    num_classes=1000,
    input_hw=(224, 224),
    batch_size=256,
    total_steps=TOTAL_STEPS,
    val_every=EPOCH_STEPS,
    precision="bf16",
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=1e-4,
        lr=dict(kind="cosine", lr=0.1, total_steps=TOTAL_STEPS,
                warmup_steps=5 * EPOCH_STEPS),
    ),
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0), flip=True,
                 out_dtype="bfloat16"),
    seed=0,
)
