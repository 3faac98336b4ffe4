"""ViT-B/16 ImageNet recipe (DeiT-III-style from-scratch training).

Vanilla ViT needs JFT-scale data; the practical ImageNet-1k recipe is
the DeiT family's: AdamW + cosine, strong augmentation (RandAugment +
mixup/cutmix), stochastic depth, label smoothing, gradient clipping.
bf16 end to end — every block is MXU matmuls; softmax statistics stay
f32 inside ops.attention.

Alternative workflow: warm-start from a torchvision checkpoint via
``models.pretrained.import_torch_vit_file`` and fine-tune with a 10x
smaller peak LR.
"""

TOTAL_STEPS = 375300  # 300 epochs at batch 1024 (1251 steps/epoch)

config = dict(
    task="classification",
    model="vit_b16",
    model_kwargs=dict(drop_path_rate=0.1),
    dataset="imagenet",
    data_dir=None,
    num_classes=1000,
    input_hw=(224, 224),
    raw_hw=(256, 256),
    batch_size=1024,
    total_steps=TOTAL_STEPS,
    val_every=1251,
    early_stop_patience=0,
    optimizer=dict(
        name="adamw", b1=0.9, b2=0.999, weight_decay=0.05,
        wd_exclude_norms=True, clip_norm=1.0,
        lr=dict(kind="cosine", lr=1e-3, total_steps=TOTAL_STEPS,
                alpha=1e-5, warmup_steps=6255)),  # 5-epoch warmup
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0), flip=True,
                 randaugment=[2, 9]),
    mix=dict(mixup_alpha=0.8, cutmix_alpha=1.0, prob=0.5),
    label_smoothing=0.1,
    precision="bf16",
    seed=0,
)
