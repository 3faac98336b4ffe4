"""SN-GAN on CIFAR-10: spectral-normalized D + hinge objective."""

config = dict(
    task="gan",
    gan_kind="dcgan",
    dataset="cifar10",
    data_dir=None,
    latent_dim=128,
    image_size=32,
    generator_kwargs=dict(base_features=256),
    discriminator_kwargs=dict(base_features=64, spectral_norm=True),
    batch_size=64,
    total_steps=50000,
    log_every=200,
    sample_every=2000,
    gan_loss="hinge",
    g_optimizer=dict(name="adam", b1=0.0, b2=0.9, lr=2e-4),
    d_optimizer=dict(name="adam", b1=0.0, b2=0.9, lr=2e-4),
    precision="f32",
    seed=0,
)
