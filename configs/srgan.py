"""SRGAN x4 (Ledig et al., 2017): SRResNet generator + VGG-style
discriminator through the fused dual-optimizer GAN step.

Sixth task family's adversarial member (gan_kind="srgan").  The
discriminator is UNCONDITIONAL (scores HR images only); the generator
loss is pixel content (l1_weight) + adversarial, the paper's weighting.
Standard workflow: pretrain the generator with configs/div2k_edsr.py
(or this recipe's own SRResNet with l1 only), then fine-tune
adversarially.
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
