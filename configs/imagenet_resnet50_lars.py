"""ResNet-50 large-batch LARS recipe (pod-scale training).

The You-et-al. configuration for batch 4096+: layer-wise trust-ratio LR
scaling with bias/BN exclusion, linear-scaled peak LR, long warmup.
Run with a data-parallel mesh over the full slice.
"""

BATCH = 4096
TOTAL_STEPS = 28148  # 90 epochs at batch 4096

config = dict(
    task="classification",
    model="resnet50",
    model_kwargs=dict(),
    dataset="imagenet",
    data_dir=None,
    num_classes=1000,
    input_hw=(224, 224),
    raw_hw=(256, 256),
    batch_size=BATCH,
    total_steps=TOTAL_STEPS,
    val_every=313,
    early_stop_patience=0,
    optimizer=dict(
        name="lars", momentum_coef=0.9, eta=0.001,
        weight_decay=1e-4, wd_exclude_norms=True,
        lr=dict(kind="poly", lr=6.4, total_steps=TOTAL_STEPS, power=2.0,
                warmup_steps=1564)),   # 5-epoch warmup to lr 6.4 @ 4096
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0),
                 aspect_range=(0.75, 4 / 3), flip=True),
    label_smoothing=0.1,
    precision="bf16",
    seed=0,
)
