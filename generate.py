#!/usr/bin/env python
"""GAN sample generation (reference-era workflow: restore G and write an
image grid).

    python generate.py --config configs/dcgan_cifar10.py --ckpt runs/gan \
        [--n 64] [--out samples.png]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--out", default="samples.png")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ema", action="store_true",
                    help="sample with the Polyak-averaged generator "
                         "(g_optimizer.ema_decay in the config)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib

    cfg = recipes.load_config(args.config)
    if cfg.get("task") != "gan":
        raise SystemExit("generate.py is for gan configs")
    cfg["batch_size"] = args.n
    state, _step, _iter, kind = recipes.build_gan(cfg, synthetic=True)
    restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
    state = type(state)(**restored)
    if args.ema:
        from myconvnet_tpu.train import optim as optim_lib
        ema = optim_lib.extract_ema(state.g_opt)
        state = state._replace(g_params=jax.tree.map(
            lambda p, e: e.astype(p.dtype), state.g_params, ema))
        print("sampling with EMA generator")

    # rebuild the generator transform to sample with restored params
    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.core.precision import get_policy, policy_scope
    policy = get_policy(cfg.get("precision", "f32"))
    size = cfg.get("image_size", 32)
    gkw = cfg.get("generator_kwargs", {})

    if kind == "dcgan":
        def g_fwd(z, train=False):
            with policy_scope(policy):
                return models.dcgan_generator(z, train=train,
                                              image_size=size, **gkw)
        gen = transform(g_fwd)
        z = jax.random.normal(jax.random.key(args.seed),
                              (args.n, cfg.get("latent_dim", 100)))
        imgs, _ = gen.apply(state.g_params, state.g_state, None, z, False)
    else:
        raise SystemExit("pix2pix generation needs input images; use the "
                         "library API")

    imgs = np.asarray((jnp.clip(imgs, -1, 1) + 1.0) * 127.5, np.uint8)
    side = int(math.ceil(math.sqrt(args.n)))
    h, w, c = imgs.shape[1:]
    grid = np.zeros((side * h, side * w, c), np.uint8)
    for i, img in enumerate(imgs):
        r, col = divmod(i, side)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
    from PIL import Image
    Image.fromarray(grid.squeeze()).save(args.out)
    print(f"wrote {args.n} samples to {args.out}")


if __name__ == "__main__":
    main()
