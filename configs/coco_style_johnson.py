"""Fast style transfer recipe (Johnson et al. 2016; twelfth family).

Content corpus: any flat image directory (data_dir/train/*.jpg —
COCO train2014 in the paper) via subsets/images.py; the synthetic
structured-image fallback drives smoke runs.  Style target:
``style_image=`` path, else the procedural high-frequency pattern.
``vgg_pretrained=`` (a torch vgg16 state_dict file) selects
literature-quality perceptual features; without it the extractor is
random (the optimization target stays well-defined — Ulyanov et al.
showed random multi-scale features already carry style signal).
"""

config = dict(
    task="style",
    dataset="images",
    data_dir=None,
    image_size=256,                 # multiple of 4 (two stride-2 stages)
    gen_width=32,
    gen_res_blocks=5,
    style_image=None,
    style_seed=7,
    vgg_pretrained=None,
    content_weight=1.0,
    style_weight=5.0,
    tv_weight=1e-4,
    batch_size=16,
    total_steps=40000,              # ~2 epochs of COCO at b16
    log_every=100,
    sample_every=1000,
    optimizer=dict(name="adam", lr=1e-3),
    precision="f32",
    seed=0,
)
