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

    import jax

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

    if kind != "dcgan":
        raise SystemExit("pix2pix generation needs input images; use the "
                         "library API (recipes.make_gan_sampler)")
    from myconvnet_tpu.utils.images import make_grid, save_png
    sampler = recipes.make_gan_sampler(cfg)
    imgs = sampler(state, args.n, seed=args.seed)
    save_png(args.out, make_grid(imgs, pad=0))
    print(f"wrote {args.n} samples to {args.out}")


if __name__ == "__main__":
    main()
