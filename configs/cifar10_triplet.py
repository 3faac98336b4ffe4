"""Batch-hard triplet metric learning on CIFAR-10 (CPU-runnable smoke
recipe for the tenth task family).

CIFAR classes stand in for identities: PK-sampled batches (8 classes x
8 samples — data/pipeline.pk_batch_indices guarantees every anchor its
positives), batch-hard triplet loss over the 64-d embedding, Recall@1
retrieval as the validation score.  The production-scale sibling is
configs/faces_arcface_r50.py.
"""

TOTAL_STEPS = 8000

config = dict(
    task="metric",
    model="embedding_net",
    model_kwargs=dict(backbone="smallnet", embed_dim=64,
                      head="triplet",
                      backbone_kwargs=dict(width=16, dropout_rate=0.0)),
    dataset="cifar10",
    data_dir=None,
    num_classes=10,
    triplet_margin=0.3,
    pk=(8, 8),                     # 8 classes x 8 samples = batch 64
    recall_k=1,
    input_hw=(32, 32),
    batch_size=64,
    total_steps=TOTAL_STEPS,
    val_every=500,
    optimizer=dict(
        name="adam", weight_decay=1e-4, wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=1e-3, total_steps=TOTAL_STEPS,
                warmup_steps=200)),
    augment=dict(out_hw=(32, 32), area_range=None, pad=4, flip=True,
                 brightness=0.0, contrast=0.0, saturation=0.0,
                 mean=(0.4914, 0.4822, 0.4465),
                 std=(0.2470, 0.2435, 0.2616)),
    precision="f32",
    seed=0,
)
