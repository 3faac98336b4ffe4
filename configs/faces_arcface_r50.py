"""ArcFace ResNet-50 face-recognition recipe (tenth task family).

Corpus: identity-per-directory image tree in the ImageNet layout
(data_dir/{train,val}/<identity>/*.jpg) — the CASIA-WebFace /
MS1M-style convention; num_classes below is CASIA's 10,572 identities.
Training output is margin-softmax cosines (models/embedding.py +
train/metric_losses.arcface_loss); evaluation is leave-one-out
Recall@1 retrieval over the held-out identities, and
``predict()``/serving emit the L2-normalized 512-d embeddings ANY
downstream verification stack consumes.

Swap metric_head="cosface" (margin_s=30, margin_m=0.35) for the
CosFace variant, or head="triplet" + pk=(P, K) for batch-hard triplet
fine-tuning.
"""

TOTAL_STEPS = 60000

config = dict(
    task="metric",
    model="embedding_net",
    model_kwargs=dict(backbone="resnet50", embed_dim=512,
                      head="arcface"),
    dataset="imagenet",            # identity-per-class-dir layout
    data_dir=None,
    num_classes=10572,             # CASIA-WebFace identity count
    margin_s=64.0,
    margin_m=0.5,
    recall_k=1,
    input_hw=(112, 112),           # aligned face-crop convention
    raw_hw=(128, 128),
    batch_size=512,
    total_steps=TOTAL_STEPS,
    val_every=2000,
    log_every=100,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, wd_exclude_norms=True,
        weight_decay=5e-4,
        lr=dict(kind="step", lr=0.1, boundaries=(24000, 42000, 54000),
                rates=(0.1, 0.01, 0.001))),
    augment=dict(out_hw=(112, 112), area_range=None, flip=True,
                 brightness=0.0, contrast=0.0, saturation=0.0,
                 mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
    precision="bf16",
    accum_steps=2,
    seed=0,
)
