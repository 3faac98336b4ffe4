"""Unsupervised PWC-Net flow recipe (no ground-truth flow consumed).

Trains by brightness constancy: photometric Charbonnier between
frame 1 and frame 2 backward-warped by the predicted flow, plus
edge-aware first-order smoothness
(train/losses.py:unsupervised_flow_loss).  Ground-truth .flo files
are only ever read by the EVALUATOR (AEPE on the val split) — the
training signal is the frames themselves, so this recipe also runs
on corpora with no flow annotations at all (point ``data_dir`` at
any ``_img1/_img2`` pair tree; give the val split GT if you want a
real EPE).

On the synthetic moving-rectangles corpus this objective recovers
flow to EPE ~0.7 from a 1.9 zero-flow prior with ZERO labels
(tests/test_flow.py::test_unsupervised_flow_learns).
"""

TOTAL_STEPS = 150000

config = dict(
    task="flow",
    model="pwcnet",
    model_kwargs={},
    dataset="flow",
    data_dir=None,
    input_hw=(384, 512),
    max_motion=8,
    unsupervised=True,
    smooth_weight=0.05,            # flow-gradient penalty weight
    edge_sharpness=50.0,           # image-edge gating of smoothness
    epe_eps=1e-3,                  # Charbonnier knee (photometric)
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
