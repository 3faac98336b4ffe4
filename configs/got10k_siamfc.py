"""SiamFC single-object tracking on a GOT-10k-style corpus
(Bertinetto et al. 2016).  Exemplar/search pairs sampled <=10 frames
apart with SiamFC context crops; balanced response-map logistic loss;
center-error validation.  data_dir=None + --synthetic trains on the
exact-offset textured-square renderer."""

config = dict(
    task="tracking",
    model="siamfc",
    model_kwargs=dict(width=48, exemplar_hw=(64, 64)),
    dataset="tracking",
    data_dir=None,                 # GOT-10k-style root (see subsets/)
    num_classes=0,
    input_hw=(128, 128),           # search crop
    max_offset=24,                 # synthetic-corpus motion bound
    frame_gap=10,
    pairs_per_video=32,
    label_radius=8.0,              # px around the true center -> +1
    batch_size=64,
    total_steps=30000,
    val_every=1000,
    optimizer=dict(
        name="momentum", momentum_coef=0.9, wd_exclude_norms=True,
        weight_decay=5e-4,
        lr=dict(kind="cosine", lr=0.01, total_steps=30000,
                warmup_steps=500)),
    aug_brightness=0.1,
    aug_contrast=0.1,
    precision="bf16",
    seed=0,
)
