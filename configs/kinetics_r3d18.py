"""R3D-18 video classification on a Kinetics-style frame corpus
(ninth task family; models/video.py, subsets/video.py).

Corpus layout: data_dir/{train,val}/<class>/<video_id>/frame_*.jpg
(frames pre-extracted).  --synthetic trains on moving-square clips
whose label is the MOTION DIRECTION — only solvable through temporal
modeling, so it smoke-tests the 3-D conv path functionally.

Swap model="r2plus1d_18" for the decomposed variant (usually the
better TPU mapping — see ops/conv3d.py).
"""

TOTAL_STEPS = 120000

config = dict(
    task="video",
    model="r3d_18",
    dataset="video",
    data_dir=None,
    num_classes=400,
    num_frames=16,
    input_hw=(112, 112),
    batch_size=32,
    total_steps=TOTAL_STEPS,
    val_every=2000,
    log_every=100,
    mean=(0.43216, 0.394666, 0.37645),   # torchvision Kinetics stats
    std=(0.22803, 0.22145, 0.216989),
    optimizer=dict(
        name="momentum", momentum_coef=0.9,
        weight_decay=1e-4, wd_exclude_norms=True,
        lr=dict(kind="cosine", lr=0.01, total_steps=TOTAL_STEPS,
                warmup_steps=2000)),
    precision="bf16",
    seed=0,
)
