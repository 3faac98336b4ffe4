"""EDSR x4 super-resolution (Lim et al., 2017 baseline model).

Sixth task family (task="sr", recipes.build_sr).  Data is any flat
image directory (`dataset="images"`: DIV2K layout — data_dir/train/
*.png); the HR patch is cropped on device and the LR input synthesized
by an exact area downsample, so no pre-generated LR set is needed.
Paper baseline: 64-wide / 16-block, L1 loss, Adam, 48x48 LR patches
(hr_size 192 at x4).  The full EDSR is ``model_kwargs=dict(width=256,
blocks=32, res_scale=0.1)``.
"""

TOTAL_STEPS = 300000

config = dict(
    task="sr",
    model="edsr",
    model_kwargs=dict(width=64, blocks=16, res_scale=1.0),
    scale=4,
    hr_size=192,
    sr_metric="psnr",
    dataset="images",
    data_dir=None,                 # DIV2K root (train/, val/)
    num_classes=0,
    batch_size=16,
    total_steps=TOTAL_STEPS,
    val_every=5000,
    early_stop_patience=0,
    optimizer=dict(
        name="adam", b1=0.9, b2=0.999,
        lr=dict(kind="step", lr=1e-4, boundaries=[200000],
                rates=[0.5])),
    precision="f32",               # SR is PSNR-sensitive; bf16 optional
    seed=0,
)
