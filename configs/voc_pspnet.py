"""PSPNet on VOC semantic segmentation (pyramid pooling, os8 backbone)."""

config = dict(
    task="segmentation",
    model="pspnet",
    model_kwargs=dict(backbone_depth=50, output_stride=8),
    dataset="voc",
    data_dir=None,
    num_classes=21,
    ignore_label=255,
    batch_size=16,
    total_steps=30000,
    val_every=1000,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=1e-4,
        wd_exclude_norms=True,
        lr=dict(kind="poly", lr=0.01, total_steps=30000,
                warmup_steps=500)),
    augment=dict(out_hw=(473, 473), area_range=(0.5, 2.0), flip=True,
                 mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    precision="bf16",
    remat=True,
    seed=0,
)
