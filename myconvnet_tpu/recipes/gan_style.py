"""GAN and style-transfer families (fused multi-net steps).

Part of the recipes package — the reference's parameters.py + per-task
wiring (SURVEY.md §2#10) split by family; ``myconvnet_tpu.recipes``
re-exports every public name, so consumers are unchanged.
"""

from __future__ import annotations

import jax
import numpy as np

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.core.precision import get_policy, policy_scope
from myconvnet_tpu.data.pipeline import DataSet
from myconvnet_tpu.subsets import cifar10
from myconvnet_tpu.train import gan as gan_lib
from myconvnet_tpu.recipes.common import make_optimizer

def gan_generator(cfg: dict):
    """The transformed generator for a GAN config — the single source of
    truth shared by build_gan (training), make_gan_sampler
    (visualization/generate.py) and test.py --export (StableHLO
    generator artifacts), so restored states always apply."""
    kind = cfg.get("gan_kind", "dcgan")
    policy = get_policy(cfg.get("precision", "f32"))
    size = cfg.get("image_size", 32)
    gkw = cfg.get("generator_kwargs", {})
    fwd_of = {
        "dcgan": lambda z, train=False: models.dcgan_generator(
            z, train=train, image_size=size, **gkw),
        "pix2pix": lambda x, train=False: models.unet_generator(
            x, train=train, **gkw),
        "cyclegan": lambda x, train=False: models.resnet_generator(
            x, train=train, **gkw),
        # SRGAN: mean-subtracted [0,1] LR -> [0,1] HR (SRResNet +
        # channel mean, the same forward shape as build_sr's wrapper so
        # g_pretrain checkpoints graft directly)
        "srgan": lambda x, train=False: models.srresnet(
            x, train=train,
            **{"scale": int(cfg.get("scale", 4)), **gkw})
        + jax.numpy.asarray(cfg.get("mean", (0.4488, 0.4371, 0.4040)),
                            x.dtype),
    }
    if kind not in fwd_of:
        raise ValueError(f"unknown gan kind {kind!r}")
    fwd = fwd_of[kind]

    def g_fwd(x, train=False):
        with policy_scope(policy):
            return fwd(x, train=train)

    return transform(g_fwd)


def build_gan(cfg: dict, synthetic: bool = False):
    """Returns (state, step_fn, data_iter_fn, kind)."""
    kind = cfg.get("gan_kind", "dcgan")
    policy = get_policy(cfg.get("precision", "f32"))
    size = cfg.get("image_size", 32)
    batch = cfg["batch_size"]

    if kind == "dcgan":
        dkw = cfg.get("discriminator_kwargs", {})

        def d_fwd(x, train=False):
            with policy_scope(policy):
                return models.dcgan_discriminator(x, train=train, **dkw)

        gen, disc = gan_generator(cfg), transform(d_fwd)
        g_opt = make_optimizer(cfg["g_optimizer"])
        d_opt = make_optimizer(cfg["d_optimizer"])
        latent = cfg.get("latent_dim", 100)
        import jax.numpy as jnp
        state = gan_lib.init_gan_state(
            gen, disc, g_opt, d_opt, jax.random.key(cfg.get("seed", 0)),
            jnp.zeros((batch, latent)), (jnp.zeros((batch, size, size, 3)),))
        step = gan_lib.make_dcgan_step(gen, disc, g_opt, d_opt, latent,
                                       gan_loss=cfg.get(
                                           "gan_loss", "nonsaturating"))

        def data_iter():
            if cfg["dataset"] == "cifar10":
                src = cifar10.make_source(cfg.get("data_dir"), "train",
                                          synthetic=synthetic or
                                          cfg.get("data_dir") is None)
            else:
                raise ValueError(f"dcgan dataset {cfg['dataset']!r}")
            ds = DataSet(src)
            for x, _ in ds.train_iter(batch):
                yield (np.float32(x) / 127.5 - 1.0
                       if isinstance(x, np.ndarray)
                       else x.astype("float32") / 127.5 - 1.0)

        return state, step, data_iter, kind

    if kind == "pix2pix":
        dkw = cfg.get("discriminator_kwargs", {})

        def d_fwd(a, b, train=False):
            with policy_scope(policy):
                return models.patchgan_discriminator(a, b, train=train,
                                                     **dkw)

        gen, disc = gan_generator(cfg), transform(d_fwd)
        g_opt = make_optimizer(cfg["g_optimizer"])
        d_opt = make_optimizer(cfg["d_optimizer"])
        import jax.numpy as jnp
        x0 = jnp.zeros((batch, size, size, 3))
        state = gan_lib.init_gan_state(
            gen, disc, g_opt, d_opt, jax.random.key(cfg.get("seed", 0)),
            x0, (x0, x0))
        step = gan_lib.make_pix2pix_step(gen, disc, g_opt, d_opt,
                                         cfg.get("l1_weight", 100.0),
                                         gan_loss=cfg.get(
                                             "gan_loss", "nonsaturating"))

        def data_iter():
            from myconvnet_tpu.subsets import pairs
            src = pairs.make_source(
                cfg.get("data_dir"), "train",
                synthetic=synthetic or cfg.get("data_dir") is None,
                raw_hw=(size, size))
            ds = DataSet(src, seed=cfg.get("seed", 0))
            for a, b in ds.train_iter(batch):
                # rescale WITHOUT leaving the device: np.asarray here
                # would round-trip every prefetched batch back to host
                a = a.astype("float32") / 127.5 - 1.0
                b = b.astype("float32") / 127.5 - 1.0
                yield (a, b)

        return state, step, data_iter, kind

    if kind == "srgan":
        # super-resolution GAN (Ledig et al.): the pix2pix fused
        # dual-optimizer step with an UNCONDITIONAL discriminator (D
        # scores HR images only — the LR input argument is ignored) and
        # a pixel content loss (l1_weight >> adversarial, the paper's
        # weighting).  Data: one unlabeled HR stream; LR synthesized by
        # exact area downsample.  Value space matches the SR task
        # family (mean-subtracted [0,1] in, [0,1] out) so a generator
        # pretrained via build_sr(model='srresnet') warm-starts
        # directly (cfg['g_pretrain'] = that checkpoint dir — the
        # paper's SRResNet-then-adversarial schedule).
        from myconvnet_tpu.models.sr import area_downsample
        dkw = cfg.get("discriminator_kwargs", {})
        scale = int(cfg.get("scale", 4))
        hr_size = int(cfg.get("hr_size", size))
        if hr_size % scale:
            raise ValueError(f"hr_size {hr_size} % scale {scale} != 0")
        lr_size = hr_size // scale
        import jax.numpy as jnp
        sr_mean = jnp.asarray(cfg.get("mean", (0.4488, 0.4371, 0.4040)),
                              jnp.float32)

        def d_fwd(a, b, train=False):
            del a  # unconditional: D never sees the LR input
            with policy_scope(policy):
                return models.sr_discriminator(b, train=train, **dkw)

        gen, disc = gan_generator(cfg), transform(d_fwd)
        g_opt = make_optimizer(cfg["g_optimizer"])
        d_opt = make_optimizer(cfg["d_optimizer"])
        lr0 = jnp.zeros((batch, lr_size, lr_size, 3))
        hr0 = jnp.zeros((batch, hr_size, hr_size, 3))
        state = gan_lib.init_gan_state(
            gen, disc, g_opt, d_opt, jax.random.key(cfg.get("seed", 0)),
            lr0, (lr0, hr0))
        if cfg.get("g_pretrain"):
            # warm-start the generator from a build_sr checkpoint
            # (same transform scopes + value space; shape-validated)
            import warnings

            from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
            with warnings.catch_warnings():
                # the SR checkpoint legitimately carries optimizer
                # state/step the graft has no slot for — the unused-key
                # warning targets architecture drift, not warm-starts
                warnings.filterwarnings(
                    "ignore", message=".*entries the target has no slot")
                restored = ckpt_lib.restore_checkpoint(
                    cfg["g_pretrain"], {"params": state.g_params,
                                        "model_state": state.g_state})
            state = state._replace(g_params=restored["params"],
                                   g_state=restored["model_state"])
        step = gan_lib.make_pix2pix_step(
            gen, disc, g_opt, d_opt, cfg.get("l1_weight", 1000.0),
            gan_loss=cfg.get("gan_loss", "nonsaturating"))

        def data_iter():
            from myconvnet_tpu.data.augment import batched_crop_resize
            from myconvnet_tpu.subsets import images as images_mod
            src = images_mod.make_source(
                cfg.get("data_dir"), "train",
                synthetic=synthetic or cfg.get("data_dir") is None,
                decode_mode="native_crop")
            ds = DataSet(src, seed=cfg.get("seed", 0))

            @jax.jit
            def prep(key, x_u8):
                # per-image random HR crops + hflips on device, then
                # the shared exact area downsample — same transform
                # family as build_sr's train_fn
                n, ih, iw, _ = x_u8.shape
                k_y, k_x, k_f = jax.random.split(key, 3)
                y0 = jax.random.randint(k_y, (n,), 0,
                                        max(ih - hr_size, 0) + 1)
                x0 = jax.random.randint(k_x, (n,), 0,
                                        max(iw - hr_size, 0) + 1)
                boxes = jnp.stack(
                    [y0.astype(jnp.float32), x0.astype(jnp.float32),
                     jnp.full((n,), float(hr_size)),
                     jnp.full((n,), float(hr_size))], axis=1)
                flip = jax.random.bernoulli(k_f, 0.5, (n,))
                hr01 = batched_crop_resize(x_u8, boxes,
                                           (hr_size, hr_size),
                                           flip) / 255.0
                return area_downsample(hr01, scale) - sr_mean, hr01

            root = jax.random.key(cfg.get("seed", 0))
            for i, (x, _) in enumerate(ds.train_iter(batch)):
                yield prep(jax.random.fold_in(root, i), x)

        return state, step, data_iter, kind

    if kind == "cyclegan":
        dkw = cfg.get("discriminator_kwargs", {})

        def d_fwd(x, train=False):
            with policy_scope(policy):
                return models.patchgan_discriminator(x, train=train,
                                                     norm="instance",
                                                     **dkw)

        gen, disc = gan_generator(cfg), transform(d_fwd)
        g_opt = make_optimizer(cfg["g_optimizer"])
        d_opt = make_optimizer(cfg["d_optimizer"])
        import jax.numpy as jnp
        x0 = jnp.zeros((batch, size, size, 3))
        state = gan_lib.init_cyclegan_state(
            gen, disc, g_opt, d_opt, jax.random.key(cfg.get("seed", 0)),
            x0)
        step = gan_lib.make_cyclegan_step(
            gen, disc, g_opt, d_opt,
            cycle_weight=cfg.get("cycle_weight", 10.0),
            identity_weight=cfg.get("identity_weight", 0.5),
            gan_loss=cfg.get("gan_loss", "lsgan"))

        def data_iter():
            from myconvnet_tpu.subsets import pairs
            # unpaired domains ride the pairs source (two-dir layout or
            # synthetic); paired=False zips the pools by order, so the
            # A/B files need not share names
            src = pairs.make_source(
                cfg.get("data_dir"), "train",
                synthetic=synthetic or cfg.get("data_dir") is None,
                raw_hw=(size, size), paired=False)
            ds = DataSet(src, seed=cfg.get("seed", 0))
            for a, b in ds.train_iter(batch):
                yield (a.astype("float32") / 127.5 - 1.0,
                       b.astype("float32") / 127.5 - 1.0)

        return state, step, data_iter, kind

    raise ValueError(f"unknown gan kind {kind!r}")


def make_gan_sampler(cfg: dict):
    """Sampling closure for in-run visualization and generate.py.

    dcgan: ``sample(state, n, seed) -> uint8 [n,H,W,3]`` from fresh
    latents.  pix2pix: ``sample(state, x) -> uint8`` translating input
    images.  cyclegan adds ``direction="ab"|"ba"``.  Shares the
    generator transform with build_gan (gan_generator), so restored
    states apply cleanly.
    """
    from myconvnet_tpu.utils.images import to_uint8
    kind = cfg.get("gan_kind", "dcgan")
    gen = gan_generator(cfg)

    if kind == "dcgan":
        def sample(state, n: int = 64, seed: int = 0):
            z = jax.random.normal(jax.random.key(seed),
                                  (n, cfg.get("latent_dim", 100)))
            imgs, _ = gen.apply(state.g_params, state.g_state, None, z,
                                False)
            return to_uint8(imgs)
    elif kind in ("pix2pix", "srgan"):
        # pix2pix lives in tanh [-1,1] space; srgan in the SR family's
        # [0,1] space (sample input = mean-subtracted [0,1] LR)
        vrange = (0.0, 1.0) if kind == "srgan" else (-1.0, 1.0)

        def sample(state, x):
            imgs, _ = gen.apply(state.g_params, state.g_state, None,
                                jax.numpy.asarray(x), False)
            return to_uint8(imgs, vrange)
    else:  # cyclegan (unknown kinds rejected by gan_generator)
        def sample(state, x, direction: str = "ab"):
            imgs, _ = gen.apply(state.g_params[direction],
                                state.g_state[direction], None,
                                jax.numpy.asarray(x), False)
            return to_uint8(imgs)

    return sample


# ------------------------------------------------- super-resolution (sr)


def procedural_style_image(hw=(256, 256), seed: int = 7):
    """Deterministic high-frequency colorful pattern (concentric waves
    + diagonal stripes per channel) — the no-egress stand-in for a
    painting: its Gram matrices are strongly structured and far from
    natural-image statistics, so style loss is meaningfully testable."""
    import numpy as np
    h, w = hw
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        cy, cx = rng.uniform(0.2, 0.8, 2) * (h, w)
        r = np.hypot(yy - cy, xx - cx)
        f1, f2 = rng.uniform(0.05, 0.2), rng.uniform(0.02, 0.1)
        ph = rng.uniform(0, 2 * np.pi)
        img[..., c] = (0.5 + 0.25 * np.sin(2 * np.pi * f1 * r)
                       + 0.25 * np.sin(2 * np.pi * f2 * (xx + yy) + ph))
    return np.clip(img, 0.0, 1.0).astype(np.float32)[None]


def build_style(cfg: dict, synthetic: bool = False):
    """Fast style transfer (twelfth task family).

    Returns ``(state, step, data_iter_fn, kind)`` — the custom-loop
    assembly shape the GAN/diffusion families use.  The VGG extractor
    starts random unless ``cfg['vgg_pretrained']`` names a torch
    VGG-16 checkpoint (models/pretrained.py layout); random features
    still define a valid optimization target (the math and the fused
    program are identical), pretrained features give the
    literature-quality stylization.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.subsets import images as images_mod
    from myconvnet_tpu.train import style as style_lib
    from myconvnet_tpu.train.perceptual import (STYLE_LAYERS,
                                                make_vgg_extractor)

    size = int(cfg.get("image_size", 256))
    if size % 4:
        raise ValueError(f"image_size {size} must be a multiple of 4")
    batch = cfg["batch_size"]
    width = int(cfg.get("gen_width", 32))
    n_res = int(cfg.get("gen_res_blocks", 5))

    def g_fwd(x, train=False):
        return models.transformer_net(x, width=width, n_res=n_res,
                                      train=train)

    gen = transform(g_fwd)
    from myconvnet_tpu.train.perceptual import CONTENT_LAYER
    style_layers = tuple(cfg.get("style_layers", STYLE_LAYERS))
    content_layer = cfg.get("content_layer", CONTENT_LAYER)
    # the extractor must tap the content layer even when the style set
    # omits it (style_layers=('relu3_3','relu4_3') is legal config)
    vgg, features_fn = make_vgg_extractor(
        tuple(dict.fromkeys(style_layers + (content_layer,))))
    opt = make_optimizer(cfg.get("optimizer",
                                 dict(name="adam", lr=1e-3)))
    state = style_lib.init_style_state(
        gen, vgg, opt, jax.random.key(cfg.get("seed", 0)),
        jnp.zeros((batch, size, size, 3)))

    if cfg.get("vgg_pretrained"):
        from myconvnet_tpu.models.pretrained import (
            import_torch_vgg16_features_file)
        state = state._replace(vgg_params=import_torch_vgg16_features_file(
            cfg["vgg_pretrained"], state.vgg_params))

    # style target: an image file, or the procedural fallback
    style_path = cfg.get("style_image")
    if style_path and not synthetic:
        src = images_mod.FileSource([style_path],
                                    np.zeros(1, np.int32),
                                    (size, size))
        s_img = src.get_batch(np.array([0]))[0].astype(np.float32) / 255.
    else:
        s_img = procedural_style_image((size, size),
                                       seed=cfg.get("style_seed", 7))
    grams = style_lib.style_grams(features_fn, state.vgg_params,
                                  state.vgg_state, jnp.asarray(s_img))
    # style targets only for the STYLE layers (the extractor also taps
    # the content layer, which must not enter the Gram term)
    grams = {k: v for k, v in grams.items() if k in style_layers}

    step = style_lib.make_style_step(
        gen, features_fn, opt, grams,
        content_weight=cfg.get("content_weight", 1.0),
        style_weight=cfg.get("style_weight", 5.0),
        tv_weight=cfg.get("tv_weight", 1e-4),
        content_layer=content_layer)

    def data_iter():
        src = images_mod.make_source(
            cfg.get("data_dir"), "train",
            synthetic=synthetic or cfg.get("data_dir") is None,
            synthetic_n=cfg.get("synthetic_n", 128),
            raw_hw=(size, size))
        ds = DataSet(src, seed=cfg.get("seed", 0))
        for x, _ in ds.train_iter(batch):
            yield x.astype("float32") / 255.0  # stays on device

    return state, step, data_iter, "johnson"


def make_stylizer_fn(cfg: dict):
    """-> jitted fn(params, model_state, x) -> stylized [0,1] batch.
    Build ONCE; params ride as traced arguments so evolving weights
    (mid-training sample grids) never force a recompile.  uint8 inputs
    are detected by their STATIC dtype and scaled /255."""
    import jax.numpy as jnp

    width = int(cfg.get("gen_width", 32))
    n_res = int(cfg.get("gen_res_blocks", 5))

    def g_fwd(x, train=False):
        return models.transformer_net(x, width=width, n_res=n_res,
                                      train=train)

    gen = transform(g_fwd)

    @jax.jit
    def stylize(params, model_state, x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            x = x.astype(jnp.float32) / 255.0
        else:
            x = x.astype(jnp.float32)
        y, _ = gen.apply(params, model_state, None, x, False)
        return y

    return stylize


def make_stylizer(cfg: dict, state):
    """Convenience wrapper closing over a fixed state:
    fn(x uint8/float[0,1]) -> stylized [0,1] (generate.py consumer)."""
    fn = make_stylizer_fn(cfg)
    return lambda x: fn(state.params, state.model_state, x)


# ---------------------------------------------------- semisup (fixmatch)

