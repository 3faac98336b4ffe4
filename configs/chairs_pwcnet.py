"""FlyingChairs PWC-Net recipe (fifteenth task family).

PWC-Net (Sun et al. 2018): 6-level siamese feature pyramid,
coarse-to-fine estimation with warped cost volumes (ops/warp.py +
ops/correlation.py), dense estimators, dilated-conv context
refinement.  Train mode supervises the whole flow pyramid with the
paper's level weights (train/losses.py:multiscale_epe_loss); eval
scores the upsampled finest flow with AEPE.

FlyingChairs frames are 384x512 — divisible by the pyramid's total
stride 64, as required.  With no ``data_dir`` the synthetic
moving-rectangles fallback renders exact-ground-truth pairs so the
whole recipe is CPU-runnable (at a smaller input_hw, with
``model="tinypwc"``).

The paper's training schedule on Chairs is the "slong" ramp; this
recipe uses the framework's cosine-with-warmup at the same peak LR.
"""

TOTAL_STEPS = 120000

config = dict(
    task="flow",
    model="pwcnet",
    model_kwargs={},               # md=, pyramid=, warp_backend=
    dataset="flow",
    data_dir=None,
    input_hw=(384, 512),
    max_motion=8,                  # synthetic fallback's motion range
    epe_eps=1e-3,
    flow_metric="epe",
    # flow_loss_weights=None -> the PWC paper alphas (5 levels)
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
