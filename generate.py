#!/usr/bin/env python
"""GAN sample generation / image translation (reference-era workflow:
restore G and write an image grid).

    # unconditional sampling (dcgan)
    python generate.py --config configs/dcgan_cifar10.py --ckpt runs/gan \
        [--n 64] [--out samples.png]

    # translation (pix2pix / cyclegan): --input is a directory of images
    # (or omit for synthetic inputs); writes an input|output grid
    python generate.py --config configs/cyclegan.py --ckpt runs/cyc \
        --input photos/ [--direction ab|ba] [--out translated.png]
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
    ap.add_argument("--input", default=None,
                    help="directory of images to translate "
                         "(pix2pix/cyclegan)")
    ap.add_argument("--direction", default="ab", choices=("ab", "ba"),
                    help="cyclegan translation direction")
    ap.add_argument("--ema", action="store_true",
                    help="sample with the Polyak-averaged generator "
                         "(g_optimizer.ema_decay in the config)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--set", action="append", default=None,
                    metavar="KEY=VALUE", dest="overrides",
                    help="override any config entry (repeatable)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax

    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib

    cfg = recipes.load_config(args.config)
    cfg = recipes.apply_overrides(cfg, args.overrides)
    if cfg.get("task") not in ("gan", "diffusion", "style"):
        raise SystemExit("generate.py is for gan/diffusion/style configs")
    cfg["batch_size"] = args.n

    if cfg["task"] == "style":
        import numpy as np

        from myconvnet_tpu.utils.images import make_grid, save_png
        state, _step, _iter, _kind = recipes.build_style(
            cfg, synthetic=True)
        restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
        state = type(state)(**restored)
        stylize = recipes.make_stylizer(cfg, state)
        size = int(cfg.get("image_size", 256))
        if args.input:
            import os

            from PIL import Image
            paths = sorted(
                os.path.join(args.input, f)
                for f in os.listdir(args.input)
                if f.lower().endswith((".jpg", ".jpeg", ".png")))[:args.n]
            if not paths:
                raise SystemExit(f"no images under {args.input!r}")
            raw = np.stack([
                np.asarray(Image.open(p).convert("RGB").resize(
                    (size, size), Image.BILINEAR), np.uint8)
                for p in paths])
        else:
            from myconvnet_tpu.subsets import images as images_mod
            src = images_mod.make_source(None, "val", synthetic=True,
                                         raw_hw=(size, size))
            raw = src.get_batch(np.arange(min(args.n, len(src))))[0]
        out = np.asarray(stylize(raw))
        out_u8 = (np.clip(out, 0.0, 1.0) * 255).astype(np.uint8)
        side_by_side = np.concatenate([raw, out_u8], axis=2)
        save_png(args.out, make_grid(side_by_side))
        print(f"wrote {len(raw)} stylizations to {args.out}")
        return

    if cfg["task"] == "diffusion":
        from myconvnet_tpu.utils.images import make_grid, save_png
        state, _step, _iter, _kind = recipes.build_diffusion(
            cfg, synthetic=True)
        restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
        state = type(state)(**restored)
        sampler = recipes.make_diffusion_sampler(cfg)
        save_png(args.out,
                 make_grid(sampler(state, args.n, seed=args.seed), pad=0))
        print(f"wrote {args.n} DDIM samples to {args.out}")
        return
    state, _step, _iter, kind = recipes.build_gan(cfg, synthetic=True)
    restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
    state = type(state)(**restored)
    if args.ema:
        from myconvnet_tpu.train import optim as optim_lib
        ema = optim_lib.extract_ema(state.g_opt)
        state = state._replace(g_params=jax.tree.map(
            lambda p, e: e.astype(p.dtype), state.g_params, ema))
        print("sampling with EMA generator")

    from myconvnet_tpu.utils.images import make_grid, save_png
    sampler = recipes.make_gan_sampler(cfg)
    if kind == "dcgan":
        imgs = sampler(state, args.n, seed=args.seed)
        save_png(args.out, make_grid(imgs, pad=0))
        print(f"wrote {args.n} samples to {args.out}")
        return

    # translation models: load inputs (or synthesize), write in|out pairs
    import numpy as np
    size = cfg.get("image_size", 32)
    if args.input:
        import os

        from PIL import Image
        paths = sorted(
            os.path.join(args.input, f) for f in os.listdir(args.input)
            if f.lower().endswith((".jpg", ".jpeg", ".png")))[:args.n]
        if not paths:
            raise SystemExit(f"no images under {args.input!r}")
        raw = np.stack([
            np.asarray(Image.open(p).convert("RGB").resize(
                (size, size), Image.BILINEAR), np.uint8) for p in paths])
    else:
        from myconvnet_tpu.subsets import pairs
        src = pairs.make_source(None, "val", synthetic=True,
                                raw_hw=(size, size))
        raw = src.get_batch(np.arange(min(args.n, len(src))))[0]
    x = raw.astype(np.float32) / 127.5 - 1.0
    out = (sampler(state, x, direction=args.direction)
           if kind == "cyclegan" else sampler(state, x))
    side_by_side = np.concatenate([raw, out], axis=2)  # input | output
    save_png(args.out, make_grid(side_by_side))
    print(f"wrote {len(raw)} translations to {args.out}")


if __name__ == "__main__":
    main()
