"""SimCLR ResNet-50 ImageNet pretraining (Chen et al., 2020).

Fifth task family (self-supervised, train/ssl.py).  Large-batch
contrastive learning is exactly what the data mesh buys: the NT-Xent
similarity z @ z.T makes GSPMD all-gather the embeddings over ICI, so
every chip contrasts against ALL global negatives — the paper's
large-batch requirement falls out of the sharding, with no hand-written
collective.  LARS keeps batch 4096 stable (the paper's optimizer).
"""

TOTAL_STEPS = 62500  # ~200 epochs at batch 4096 (~312 steps/epoch)

config = dict(
    task="ssl",
    ssl_kind="simclr",
    model="resnet50",
    temperature=0.1,
    proj_dim=128,
    grayscale_prob=0.2,
    dataset="imagenet",
    data_dir=None,
    num_classes=1000,                      # kNN probe only
    knn_k=20,
    batch_size=4096,
    total_steps=TOTAL_STEPS,
    val_every=3125,
    log_every=100,
    optimizer=dict(
        name="lars", momentum_coef=0.9, weight_decay=1e-6,
        # paper: lr 0.3 * batch/256 with LARS, 10-epoch warmup
        lr=dict(kind="cosine", lr=4.8, total_steps=TOTAL_STEPS,
                warmup_steps=3125)),
    augment=dict(out_hw=(224, 224), area_range=(0.08, 1.0), flip=True,
                 brightness=0.8, contrast=0.8, saturation=0.8, hue=0.2),
    precision="bf16",
    mesh=dict(data=None),
    seed=0,
)
