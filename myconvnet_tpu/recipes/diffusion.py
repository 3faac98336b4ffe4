"""Diffusion family: DDPM step wiring and samplers.

Part of the recipes package — the reference's parameters.py + per-task
wiring (SURVEY.md §2#10) split by family; ``myconvnet_tpu.recipes``
re-exports every public name, so consumers are unchanged.
"""

from __future__ import annotations

import jax

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.core.precision import get_policy, policy_scope
from myconvnet_tpu.data.pipeline import DataSet
from myconvnet_tpu.subsets import cifar10
from myconvnet_tpu.recipes.common import make_optimizer

def _diffusion_model(cfg: dict):
    """The transformed epsilon-predictor for a diffusion config — one
    source of truth shared by build_diffusion and
    make_diffusion_sampler so restored states always apply."""
    name = cfg.get("model", "ddpm_unet")
    fn = models.DIFFUSION_MODELS.get(name)
    if fn is None:
        raise ValueError(f"unknown diffusion model {name!r}; valid: "
                         f"{sorted(models.DIFFUSION_MODELS)}")
    policy = get_policy(cfg.get("precision", "f32"))
    mkw = dict(cfg.get("model_kwargs", {}))
    if cfg.get("num_classes"):
        mkw["num_classes"] = int(cfg["num_classes"])

    def fwd(x, t, y=None, train=False):
        with policy_scope(policy):
            return fn(x.astype(policy.compute_dtype), t, y,
                      train=train, **mkw)

    return transform(fwd)


def build_diffusion(cfg: dict, synthetic: bool = False, mesh=None):
    """Diffusion recipe wiring (seventh task family, train/diffusion.py).

    Returns (state, step_fn, data_iter_fn, kind="ddpm").  Data rides
    the DCGAN value-space contract: uint8 corpus batches -> [-1, 1]
    floats on device.  With ``mesh``, batches shard over the data axis
    (GSPMD handles the rest — the step itself is mesh-agnostic).
    """
    from myconvnet_tpu.train import diffusion as diff_lib
    import jax.numpy as jnp

    size = cfg.get("image_size", 32)
    batch = cfg["batch_size"]
    sched = diff_lib.make_schedule(
        cfg.get("beta_schedule", "linear"),
        num_steps=cfg.get("diffusion_steps", 1000))
    ncls = int(cfg.get("num_classes", 0) or 0)
    model = _diffusion_model(cfg)
    opt = make_optimizer(cfg["optimizer"])
    state = diff_lib.init_diffusion_state(
        model, opt, jax.random.key(cfg.get("seed", 0)),
        jnp.zeros((batch, size, size, 3)), num_classes=ncls)
    step = diff_lib.make_ddpm_step(
        model, opt, sched, ema_decay=cfg.get("ema_decay", 0.9999),
        num_classes=ncls, uncond_prob=cfg.get("uncond_prob", 0.1))

    def data_iter():
        if cfg["dataset"] == "cifar10":
            src = cifar10.make_source(cfg.get("data_dir"), "train",
                                      synthetic=synthetic or
                                      cfg.get("data_dir") is None)
        elif cfg["dataset"] == "images":
            from myconvnet_tpu.subsets import images as images_mod
            src = images_mod.make_source(
                cfg.get("data_dir"), "train",
                synthetic=synthetic or cfg.get("data_dir") is None,
                raw_hw=(size, size))
        else:
            raise ValueError(f"diffusion dataset {cfg['dataset']!r}")
        ds = DataSet(src, seed=cfg.get("seed", 0))

        @jax.jit
        def prep(x_u8):
            # [-1,1] value space; resize on device if the corpus raw
            # size differs from image_size (e.g. CIFAR 32 -> tiny 8)
            x = jnp.asarray(x_u8, jnp.float32) / 127.5 - 1.0
            if x.shape[1:3] != (size, size):
                from myconvnet_tpu.ops.resize import resize_bilinear
                x = resize_bilinear(x, (size, size))
            return x

        put = None
        if mesh is not None:
            from myconvnet_tpu.parallel import shard_batch
            put = lambda b: shard_batch(mesh, b)  # noqa: E731
        it = ds.train_iter(batch, device_put_fn=put)
        try:
            for x, y in it:
                yield (prep(x), jnp.asarray(y)) if ncls else prep(x)
        finally:
            if hasattr(it, "close"):
                it.close()

    return state, step, data_iter, "ddpm"


def make_diffusion_sampler(cfg: dict):
    """``sample(state, n, seed) -> uint8 [n,H,W,3]`` via the DDIM scan
    (eta/sample_steps from the config; EMA params by default)."""
    from myconvnet_tpu.train import diffusion as diff_lib
    size = cfg.get("image_size", 32)
    sched = diff_lib.make_schedule(
        cfg.get("beta_schedule", "linear"),
        num_steps=cfg.get("diffusion_steps", 1000))
    return diff_lib.make_sampler(
        _diffusion_model(cfg), sched, shape=(size, size, 3),
        sample_steps=cfg.get("sample_steps"),
        eta=cfg.get("ddim_eta", 0.0),
        use_ema=cfg.get("sample_ema", True),
        num_classes=int(cfg.get("num_classes", 0) or 0),
        guidance_scale=cfg.get("guidance_scale", 0.0))


