"""MAE masked-autoencoder pretraining, CPU-runnable scale (tiny ViT on
CIFAR-10 32x32 -> 8x8 = 64 patches at patch 4).

Fifth task family (self-supervised, train/ssl.py).  The encoder scopes
match models/vit.py, so the exported ``<out>/encoder.npz`` warm-starts a
``tinyvit`` classifier via ``pretrained=dict(path=...)``.
"""

TOTAL_STEPS = 40000

config = dict(
    task="ssl",
    ssl_kind="mae",
    model="tinymae",
    model_kwargs=dict(mask_ratio=0.75, norm_pix=True),
    dataset="cifar10",
    data_dir=None,
    num_classes=10,                        # kNN probe only
    knn_k=20,
    batch_size=128,
    total_steps=TOTAL_STEPS,
    val_every=2000,
    log_every=100,
    optimizer=dict(
        name="adamw", b1=0.9, b2=0.95, weight_decay=0.05,
        lr=dict(kind="cosine", lr=1.5e-3, total_steps=TOTAL_STEPS,
                warmup_steps=1000)),
    # MAE uses LIGHT augmentation: crop + flip only (masking is the
    # regularizer)
    augment=dict(out_hw=(32, 32), area_range=(0.2, 1.0), flip=True,
                 mean=(0.4914, 0.4822, 0.4465),
                 std=(0.2470, 0.2435, 0.2616)),
    precision="f32",
    seed=0,
)
