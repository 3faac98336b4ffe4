"""MAE ViT-B/16 ImageNet pretraining (He et al., 2022 recipe).

Fifth task family (self-supervised, train/ssl.py).  The TPU win: the
encoder runs on the 25% visible tokens only (~16x less attention work,
4x less MLP work than supervised ViT-B), all in bf16 MXU matmuls; the
narrow decoder adds ~10% step cost.  Fine-tune path: the exported
``encoder.npz`` warm-starts ``vit_b16`` (scope-compatible by
construction) with the DeiT-style recipe at a 10x smaller peak LR.
"""

TOTAL_STEPS = 400320  # 800 epochs at batch 2048 (~500 steps/epoch)

config = dict(
    task="ssl",
    ssl_kind="mae",
    model="mae_b16",
    model_kwargs=dict(mask_ratio=0.75, norm_pix=True,
                      decoder_dim=512, decoder_depth=8, decoder_heads=16),
    dataset="imagenet",
    data_dir=None,
    num_classes=1000,                      # kNN probe only
    knn_k=20,
    batch_size=2048,
    total_steps=TOTAL_STEPS,
    val_every=5000,
    log_every=100,
    optimizer=dict(
        name="adamw", b1=0.9, b2=0.95, weight_decay=0.05,
        # paper: base_lr 1.5e-4 * batch/256, 40-epoch warmup
        lr=dict(kind="cosine", lr=1.2e-3, total_steps=TOTAL_STEPS,
                warmup_steps=20000)),
    augment=dict(out_hw=(224, 224), area_range=(0.2, 1.0), flip=True),
    precision="bf16",
    mesh=dict(data=None),                  # all chips data-parallel
    seed=0,
)
