"""BASELINE config #4: DeepLabv3+ semantic segmentation on VOC."""

TOTAL_STEPS = 30000

config = dict(
    task="segmentation",
    model="deeplab_v3_plus",
    model_kwargs=dict(backbone_depth=50, output_stride=16),
    dataset="voc",
    data_dir=None,
    num_classes=21,
    ignore_label=255,
    input_hw=(513, 513),
    raw_hw=(512, 512),
    batch_size=16,
    total_steps=TOTAL_STEPS,
    val_every=1000,
    early_stop_patience=0,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, wd_exclude_norms=True, weight_decay=4e-5,
        lr=dict(kind="poly", lr=0.007, total_steps=TOTAL_STEPS,
                power=0.9)),
    augment=dict(out_hw=(513, 513), area_range=(0.5, 2.0),
                 aspect_range=(0.9, 1.1), flip=True),
    precision="bf16",
    seed=0,
)
