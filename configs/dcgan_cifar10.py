"""BASELINE config #5a: DCGAN adversarial training (fused dual-opt step)."""

config = dict(
    task="gan",
    gan_kind="dcgan",
    dataset="cifar10",
    data_dir=None,
    latent_dim=100,
    image_size=32,
    generator_kwargs=dict(base_features=256),
    discriminator_kwargs=dict(base_features=64),
    batch_size=128,
    total_steps=50000,
    log_every=200,
    g_optimizer=dict(name="adam", b1=0.5, lr=2e-4),
    d_optimizer=dict(name="adam", b1=0.5, lr=2e-4),
    precision="f32",
    seed=0,
)
