"""FlyingChairs FlowNetS recipe (fifteenth task family).

Corpus: ``data_dir/{train,val}/<stem>_img1.ppm + _img2.ppm +
_flow.flo`` (subsets/flow.py — the FlyingChairs release layout;
Middlebury .flo ground truth).  Model: FlowNetSimple at the paper's
geometry (Dosovitskiy et al. 2015) with zero-init flow heads; loss =
Charbonnier EPE; eval = AEPE (+ Fl/inlier rates via --report).

FlyingChairs frames are 384x512 — divisible by the encoder's total
stride 64, as required.  With no ``data_dir`` the synthetic
moving-rectangles fallback renders exact-ground-truth pairs so the
whole recipe is CPU-runnable (at a smaller input_hw).

Swap ``model="flownet_c"`` for the correlation-volume variant
(ops/correlation.py: static-slice cost volume, no gathers).
"""

TOTAL_STEPS = 120000

config = dict(
    task="flow",
    model="flownet_s",
    model_kwargs={},
    dataset="flow",
    data_dir=None,
    input_hw=(384, 512),
    max_motion=8,                  # synthetic fallback's motion range
    epe_eps=1e-3,
    flow_metric="epe",
    aug_brightness=0.2,
    aug_contrast=0.2,
    batch_size=32,
    total_steps=TOTAL_STEPS,
    val_every=2000,
    log_every=100,
    optimizer=dict(
        name="adamw", weight_decay=4e-4,
        lr=dict(kind="cosine", lr=1e-4, total_steps=TOTAL_STEPS,
                warmup_steps=2000)),
    precision="bf16",
    seed=0,
)
