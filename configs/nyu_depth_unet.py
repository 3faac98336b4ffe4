"""NYU-Depth-v2 monocular depth recipe (fourteenth task family).

Corpus: ``data_dir/{train,val}/rgb/*.png + depth/*.png`` (16-bit
millimeter depth PNGs, 0 = no return — subsets/depth.py; the NYU
export convention).  Model: DispNet-style ResNet-18 encoder-decoder
(`models/depth.py`) with an inverse-depth sigmoid head over
[0.1, 10] m; loss = Eigen scale-invariant log (lambda 0.5); eval =
the Eigen protocol (AbsRel headline, deltas/RMSE via --report).

With no ``data_dir`` the synthetic fogged-scene fallback renders
depth-cued frames so the whole recipe is CPU-runnable.
"""

TOTAL_STEPS = 60000

config = dict(
    task="depth",
    model="depth_unet",
    model_kwargs=dict(depth=18),
    dataset="depth",
    data_dir=None,
    input_hw=(224, 288),           # NYU 4:3-ish crop at stride-32 sizes
    min_depth=0.1,
    max_depth=10.0,
    depth_scale=1000.0,            # millimeter PNGs
    silog_lambda=0.5,
    depth_metric="absrel",
    aug_brightness=0.2,
    aug_contrast=0.2,
    batch_size=64,
    total_steps=TOTAL_STEPS,
    val_every=2000,
    log_every=100,
    optimizer=dict(
        name="adamw", weight_decay=1e-4,
        lr=dict(kind="cosine", lr=1e-4, total_steps=TOTAL_STEPS,
                warmup_steps=1000)),
    precision="bf16",
    seed=0,
)
