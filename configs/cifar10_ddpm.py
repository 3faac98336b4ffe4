"""DDPM on CIFAR-10 (Ho et al., 2020 — the paper's 35.7M-param UNet,
linear beta schedule, Adam 2e-4, EMA 0.9999).  Seventh task family,
beyond the reference's scope (SURVEY.md §0; train/diffusion.py).

Sampling: 50-step DDIM by default (sample_steps); set ddim_eta=1.0 and
sample_steps=None for ancestral DDPM sampling.

Class-conditional training (classifier-free guidance, Ho & Salimans
2022): set num_classes=10 — labels ride the batch and drop to the null
embedding with uncond_prob (default 0.1); at sampling,
guidance_scale=w > 0 extrapolates (1+w)*eps_cond - w*eps_null.
"""

config = dict(
    task="diffusion",
    model="ddpm_unet",
    dataset="cifar10",
    data_dir=None,
    image_size=32,
    model_kwargs=dict(base=128, channel_mults=(1, 2, 2, 2),
                      num_res_blocks=2, attn_resolutions=(16,),
                      dropout=0.1),
    diffusion_steps=1000,
    beta_schedule="linear",
    ema_decay=0.9999,
    sample_steps=50,       # DDIM stride at sampling time
    ddim_eta=0.0,
    batch_size=128,
    total_steps=800000,
    log_every=200,
    sample_every=5000,
    optimizer=dict(name="adam", lr=2e-4, clip_norm=1.0),
    precision="bf16",
    seed=0,
)
