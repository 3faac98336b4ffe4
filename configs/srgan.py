"""SRGAN x4 (Ledig et al., 2017): SRResNet generator + VGG-style
discriminator through the fused dual-optimizer GAN step.

Sixth task family's adversarial member (gan_kind="srgan").  The
discriminator is UNCONDITIONAL (scores HR images only); the generator
loss is pixel content (l1_weight) + adversarial, the paper's weighting.

Paper workflow (SRResNet-then-adversarial): first pretrain the SAME
generator architecture with the plain SR recipe —

    python train.py --config configs/div2k_edsr.py \\
        --set model=srresnet \\
        --set "model_kwargs={'width': 64, 'blocks': 16}" \\
        --out /path/to/srresnet_pretrain

— then set ``g_pretrain="/path/to/srresnet_pretrain"`` below (or via
``--set g_pretrain=...``): build_gan grafts the pretrained generator
params+BN-state into the GAN state (both recipes share the
mean-subtracted [0,1] value space and transform scopes, so the graft
is exact and shape-validated).  EDSR checkpoints do NOT fit — a
different architecture than srresnet.
"""

TOTAL_STEPS = 100000

config = dict(
    task="gan",
    gan_kind="srgan",
    scale=4,
    hr_size=96,                    # the paper's 96x96 HR training crops
    image_size=96,
    generator_kwargs=dict(width=64, blocks=16),
    discriminator_kwargs=dict(width=64),
    l1_weight=1000.0,              # content >> adversarial (1e-3 adv)
    gan_loss="nonsaturating",
    g_pretrain=None,               # SRResNet build_sr ckpt dir (above)
    dataset="images",
    data_dir=None,
    batch_size=16,
    total_steps=TOTAL_STEPS,
    log_every=100,
    sample_every=2000,
    g_optimizer=dict(name="adam", b1=0.9,
                     lr=dict(kind="constant", lr=1e-4)),
    d_optimizer=dict(name="adam", b1=0.9,
                     lr=dict(kind="constant", lr=1e-4)),
    precision="f32",
    seed=0,
)
