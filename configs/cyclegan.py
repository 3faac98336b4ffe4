"""CycleGAN unpaired image translation (fused quad-network step).

Data: the pix2pix two-dir layout ({dir}/A/train, {dir}/B/train) — the
pairing is ignored; any two image pools work.
"""

config = dict(
    task="gan",
    gan_kind="cyclegan",
    dataset="pairs",
    data_dir=None,
    image_size=256,
    generator_kwargs=dict(base_features=64, n_blocks=9),
    discriminator_kwargs=dict(base_features=64),
    batch_size=4,
    total_steps=100000,
    log_every=200,
    sample_every=2000,
    cycle_weight=10.0,
    identity_weight=0.5,
    gan_loss="lsgan",
    g_optimizer=dict(name="adam", b1=0.5, lr=2e-4),
    d_optimizer=dict(name="adam", b1=0.5, lr=2e-4),
    precision="bf16",
    seed=0,
)
