"""SimCLR contrastive pretraining on CIFAR-10 (CPU-runnable scale).

Fifth task family (self-supervised, train/ssl.py — beyond the
reference's supervised scope).  The CIFAR SimCLR setup of the paper's
Appendix B.9: smaller crops, no blur, strong color jitter, temperature
0.5.  Pretrain, then fine-tune a classifier from the exported
``<out>/encoder.npz`` via ``pretrained=dict(path=...)``.
"""

TOTAL_STEPS = 40000  # ~100 epochs at batch 128

config = dict(
    task="ssl",
    ssl_kind="simclr",
    model="smallnet",                      # any feature-tagging classifier
    model_kwargs=dict(width=32),
    temperature=0.5,
    proj_dim=64,
    grayscale_prob=0.2,
    dataset="cifar10",
    data_dir=None,
    num_classes=10,                        # kNN probe only
    knn_k=20,
    batch_size=128,
    total_steps=TOTAL_STEPS,
    val_every=2000,
    log_every=100,
    optimizer=dict(
        name="adamw", weight_decay=1e-6,
        lr=dict(kind="cosine", lr=1e-3, total_steps=TOTAL_STEPS,
                warmup_steps=500)),
    # SimCLR views: random-resized crop + flip + color jitter (strength
    # 0.5); random grayscale rides grayscale_prob above
    augment=dict(out_hw=(32, 32), area_range=(0.2, 1.0), flip=True,
                 brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1,
                 mean=(0.4914, 0.4822, 0.4465),
                 std=(0.2470, 0.2435, 0.2616)),
    precision="f32",
    seed=0,
)
