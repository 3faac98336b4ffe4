#!/usr/bin/env python
"""Serving entry point: run or benchmark a frozen StableHLO artifact.

    # export first (test-time):
    #   from myconvnet_tpu import serving; serving.export_inference(...)
    # then:
    python serve.py --artifact model.stablehlo --images photos/ \
        [--config C --topk 5]          # classify files
    python serve.py --artifact model.stablehlo --latency \
        [--sizes 1,8,32] [--hw 224,224]  # SLO numbers
    python serve.py --serve 127.0.0.1:8080 \
        --route cls=classify:resnet.stablehlo:configs/r50.py \
        --route det=detect:ssd.stablehlo \
        [--batch_window_ms 5]              # multi-artifact HTTP server
    python serve.py --artifact seg.stablehlo --segment --images d/
    python serve.py --artifact sr.stablehlo --translate --images d/
    python serve.py --artifact ddim.stablehlo --sample 64
    python serve.py --artifact depth.stablehlo --depth --images d/
    python serve.py --artifact flow.stablehlo --flow --images d/
    python serve.py --artifact audio.stablehlo --wav clips/
    python serve.py --artifact crnn.stablehlo --text --images lines/
    python serve.py --artifact video.stablehlo --clips clips/

The artifact reloads WITHOUT model code or weights (serving.py); the
bucketing wrapper serves arbitrary request sizes on fixed compiled
shapes.  ``--serve`` starts the stdlib HTTP model server
(serving_http.py): several artifacts behind one process, JSON
protocol, health/list/:predict endpoints.
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default=None,
                    help="StableHLO file from serving.export_inference")
    ap.add_argument("--serve", default=None, metavar="HOST:PORT",
                    help="start the multi-artifact HTTP model server "
                         "(serving_http.py) instead of one-shot "
                         "inference; artifacts come from --route (or "
                         "--artifact as the single 'default' route)")
    ap.add_argument("--route", action="append", default=[],
                    metavar="NAME=KIND:ARTIFACT[:CONFIG]",
                    help="--serve route, repeatable; KIND is classify, "
                         "detect, embed, track, segment, translate, "
                         "text, depth, flow or audio "
                         "(e.g. det=detect:ssd.stablehlo, "
                         "face=embed:arcface.stablehlo:configs/"
                         "faces_arcface_r50.py, "
                         "ocr=text:crnn.stablehlo:configs/"
                         "mjsynth_crnn.py)")
    ap.add_argument("--images", default=None,
                    help="directory of images to classify")
    ap.add_argument("--config", default=None,
                    help="recipe config (normalization stats + dataset "
                         "class names when known)")
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--calibration", default=None,
                    help="calibration.json from test.py --calibrate "
                         "(applies the fitted softmax temperature)")
    ap.add_argument("--detect", action="store_true",
                    help="the artifact is a detection export (test.py "
                         "--export): feed raw [0,1] images (it "
                         "normalizes internally) and print boxes")
    ap.add_argument("--det_threshold", type=float, default=0.5,
                    help="--detect: minimum score to print")
    ap.add_argument("--segment", action="store_true",
                    help="the artifact is a segmentation export "
                         "(test.py --export on a task='segmentation' "
                         "config): feed raw [0,1] images (it "
                         "normalizes internally), print per-image "
                         "class coverage and write VOC-palette mask "
                         "PNGs next to the inputs (--out overrides)")
    ap.add_argument("--out", default=None,
                    help="--segment: directory for the mask PNGs")
    ap.add_argument("--depth", action="store_true",
                    help="the artifact is a depth export (test.py "
                         "--export on a task='depth' config): feed raw "
                         "[0,1] images, print depth stats and write "
                         "<name>_depth.png normalized grayscale maps")
    ap.add_argument("--flow", action="store_true",
                    help="the artifact is an optical-flow export: pair "
                         "<name>_a.* / <name>_b.* frames under "
                         "--images, print mean |flow| and write "
                         "<name>_flow.png color-wheel maps")
    ap.add_argument("--clips", default=None, metavar="DIR",
                    help="the artifact is a video export (test.py "
                         "--export on a task='video' config): classify "
                         "each frame-subdirectory clip under DIR "
                         "(Kinetics layout; frames sampled like the "
                         "training ClipSource)")
    ap.add_argument("--text", action="store_true",
                    help="the artifact is an OCR export (test.py "
                         "--export on a task='ocr' config): read the "
                         "grayscale line images under --images and "
                         "print the CTC-decoded strings (charset from "
                         "--config when given)")
    ap.add_argument("--wav", default=None, metavar="DIR",
                    help="the artifact is an audio export (test.py "
                         "--export on a task='audio' config): classify "
                         "the .wav files under DIR (int16 mono; "
                         "padded/trimmed to the artifact's sample "
                         "count, /32768-normalized)")
    ap.add_argument("--translate", action="store_true",
                    help="the artifact is an image-to-image export "
                         "(test.py --export on style/sr/pix2pix/"
                         "cyclegan configs): feed raw [0,1] images, "
                         "write <name>_out.png next to the inputs "
                         "(--out overrides)")
    ap.add_argument("--sample", type=int, default=0, metavar="N",
                    help="the artifact is a latent-input generator "
                         "export (dcgan): draw N latents and write a "
                         "sample grid to --out (default samples.png)")
    ap.add_argument("--seed", type=int, default=0,
                    help="--sample: latent seed")
    ap.add_argument("--track", action="store_true",
                    help="the artifact is a tracking export (test.py "
                         "--export on a task='tracking' config): pair "
                         "<name>_search.* / <name>_exemplar.* images "
                         "under --images, print (dx, dy) offsets")
    ap.add_argument("--batch_window_ms", type=float, default=0.0,
                    help="--serve: cross-request micro-batching — "
                         "concurrent requests to one route arriving "
                         "within this window run as ONE device call "
                         "(trades up to the window of latency for "
                         "batch efficiency; 0 = off)")
    ap.add_argument("--latency", action="store_true",
                    help="measure p50/p95/p99 + throughput instead")
    ap.add_argument("--sizes", default="1,8,32",
                    help="request sizes for --latency")
    ap.add_argument("--hw", default=None,
                    help="input H,W for --latency (default: artifact's)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from myconvnet_tpu import serving

    if args.serve:
        return run_server(args)
    if not args.artifact:
        raise SystemExit("pass --artifact FILE (or --serve HOST:PORT "
                         "with --route specs)")
    fn = serving.load_inference(args.artifact)
    art_shape = fn.input_shapes[0]          # (B, H, W, C) — fixed

    if args.detect:
        return run_detect(fn, art_shape, args)
    if args.segment:
        return run_segment(fn, art_shape, args)
    if args.depth:
        return run_depth(fn, art_shape, args)
    if args.flow:
        return run_flow(fn, art_shape, args)
    if args.clips:
        return run_clips(fn, art_shape, args)
    if args.text:
        return run_text(fn, art_shape, args)
    if args.wav:
        return run_wav(fn, art_shape, args)
    if args.translate:
        return run_translate(fn, art_shape, args)
    if args.sample:
        return run_sample(fn, art_shape, args)
    if args.track:
        return run_track(fn, art_shape, args)
    # the artifact is compiled for one shape: the only valid bucket is
    # its batch (requests pad up / chunk through it)
    buckets = (art_shape[0],)
    serve = serving.make_batched_server(fn, batch_sizes=buckets)

    if args.latency:
        if args.calibration:
            print("note: --calibration has no effect on --latency "
                  "(it rescales logits, not compute)")
        if args.hw:
            h, w = (int(v) for v in args.hw.split(","))
            if (h, w) != tuple(art_shape[1:3]):
                raise SystemExit(
                    f"--hw {h},{w} does not match the artifact's fixed "
                    f"input {art_shape} — exported programs compile for "
                    "one shape; re-export for a different resolution")
        else:
            h, w = art_shape[1], art_shape[2]
        nch = art_shape[3] if len(art_shape) > 3 else 3
        sizes = tuple(int(s) for s in args.sizes.split(","))
        stats = serving.measure_latency(serve, (h, w, nch),
                                        request_sizes=sizes)
        for n, row in stats.items():
            print(f"n={n:<4d} p50={row['p50']:.2f}ms "
                  f"p95={row['p95']:.2f}ms p99={row['p99']:.2f}ms "
                  f"qps={row['qps']:.1f} "
                  f"images/s={row['images_per_sec']:.0f}")
        return

    if not args.images:
        raise SystemExit("pass --images DIR or --latency")
    import os

    from PIL import Image
    paths = sorted(
        os.path.join(args.images, f) for f in os.listdir(args.images)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if not paths:
        raise SystemExit(f"no images under {args.images!r}")

    names = None
    hw = (art_shape[1], art_shape[2])  # the artifact's shape is law
    # Resolve normalization exactly as training/eval do: through
    # make_augment + AugmentConfig defaults (IMAGENET_MEAN/STD when the
    # recipe's augment block omits mean/std).  Feeding raw [0,1] pixels
    # to a model trained on normalized inputs silently wrecks accuracy.
    from myconvnet_tpu.data.augment import AugmentConfig
    acfg = AugmentConfig()
    if args.config:
        from myconvnet_tpu import recipes
        cfg = recipes.load_config(args.config)
        acfg = recipes.make_augment(cfg.get("augment")) or acfg
        if cfg.get("dataset") == "fashion_mnist":
            from myconvnet_tpu.subsets.mnist import FASHION_CLASS_NAMES
            names = FASHION_CLASS_NAMES
    nch = art_shape[3] if len(art_shape) > 3 else 3
    mean = np.asarray(acfg.mean, np.float32)
    std = np.asarray(acfg.std, np.float32)
    if mean.ndim and mean.shape[0] != nch:
        # grayscale (or otherwise non-RGB) artifact with RGB stats:
        # collapse to the channel-averaged scalar rather than crash
        mean = np.full((nch,), float(mean.mean()), np.float32)
        std = np.full((nch,), float(std.mean()), np.float32)

    # load in the artifact's channel count: RGB normally, luminance
    # for 1-channel (e.g. mnist/fashion) artifacts
    pil_mode = "L" if nch == 1 else "RGB"
    raw = np.stack([
        np.asarray(Image.open(p).convert(pil_mode).resize(
            (hw[1], hw[0]), Image.BILINEAR), np.float32) / 255.0
        for p in paths])
    if nch == 1:
        raw = raw[..., None]
    x = (raw - mean) / std

    logits = np.asarray(serve(x))
    if args.calibration:
        import json
        with open(args.calibration) as f:
            temp = float(json.load(f)["temperature"])
        logits = logits / temp
        print(f"(temperature-calibrated, T={temp:.3f})")
    from myconvnet_tpu.eval.evaluators import decode_predictions
    names = names or [str(i) for i in range(logits.shape[-1])]
    for path, row in zip(paths,
                         decode_predictions(logits, names, args.topk)):
        pretty = ", ".join(f"{n}:{p:.2f}" for n, p in row)
        print(f"{os.path.basename(path)}: {pretty}")


def run_server(args):
    """--serve HOST:PORT: load every --route artifact into one process
    and block on the stdlib HTTP server (serving_http.py)."""
    from myconvnet_tpu import serving_http

    specs = list(args.route)
    if not specs and args.artifact:
        kind = ("detect" if args.detect else
                "segment" if args.segment else
                "translate" if args.translate else
                "track" if args.track else "classify")
        spec = f"default={kind}:{args.artifact}"
        if args.config:
            spec += f":{args.config}"
        specs = [spec]
    if not specs:
        raise SystemExit("--serve needs --route specs (or --artifact)")
    routes = [serving_http.parse_route_spec(
        s, topk=args.topk, threshold=args.det_threshold) for s in specs]
    server = serving_http.ModelServer(
        routes, batch_window_ms=args.batch_window_ms)
    host, _, port = args.serve.rpartition(":")
    httpd = serving_http.make_http_server(server, host or "127.0.0.1",
                                          int(port))
    bound = httpd.server_address
    names = ", ".join(server.routes)
    print(f"serving {len(routes)} route(s) [{names}] on "
          f"http://{bound[0]}:{bound[1]}  (GET /v1/models; "
          f"POST /v1/models/<name>:predict)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


def _iter_image_chunks(images_dir, batch, h, w, exclude_suffix=(),
                       nch=3, line_fit=False):
    """Yield (paths_chunk, [batch, h, w, nch] raw [0,1] float array)
    over every image in ``images_dir``, padded to the artifact's fixed
    batch.  ``exclude_suffix`` filters this tool's OWN outputs (e.g.
    '_mask.png'), so re-runs over the same directory don't ingest
    previous results as inputs.  ``nch=1`` loads grayscale (OCR line
    images); ``line_fit`` applies the TRAINING loader's line geometry
    (scale to height preserving aspect + right-pad/center-crop,
    subsets.ocr._fit_line) instead of an aspect-warping resize — a
    wide line squeezed 3x horizontally transcribes wrong with
    plausible confidence."""
    import os

    import numpy as np
    from PIL import Image

    if not images_dir:
        raise SystemExit("this mode needs --images DIR")
    paths = sorted(
        os.path.join(images_dir, f) for f in os.listdir(images_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
        and not any(f.lower().endswith(s) for s in exclude_suffix))
    if not paths:
        raise SystemExit(f"no images under {images_dir!r}")

    def load(p):
        mode = "L" if nch == 1 else "RGB"
        img = Image.open(p).convert(mode)
        if line_fit:
            from myconvnet_tpu.subsets.ocr import _fit_line
            arr = _fit_line(np.asarray(img, np.uint8), (h, w))
            return arr.astype(np.float32)[..., None] / 255.0
        x = np.asarray(img.resize((w, h), Image.BILINEAR),
                       np.float32) / 255.0
        return x[..., None] if nch == 1 else x

    for start in range(0, len(paths), batch):
        chunk_paths = paths[start:start + batch]
        chunk = np.stack([load(p) for p in chunk_paths])
        if len(chunk) < batch:
            chunk = np.concatenate(
                [chunk, np.zeros((batch - len(chunk), h, w, nch),
                                 np.float32)])
        yield chunk_paths, chunk


def run_detect(fn, art_shape, args):
    """Serve a detection artifact: chunk/pad the request through its
    fixed batch, print per-image boxes above --det_threshold.

    The artifact normalizes internally (serving.export_detection) —
    images go in as raw [0, 1] floats at the artifact's resolution.
    """
    import os

    import numpy as np

    names = None
    if args.config:
        from myconvnet_tpu import recipes
        cfg = recipes.load_config(args.config)
        if cfg.get("dataset") == "voc":
            from myconvnet_tpu.subsets.voc import DET_CLASS_NAMES
            names = DET_CLASS_NAMES
    batch, h, w = art_shape[0], art_shape[1], art_shape[2]

    for chunk_paths, chunk in _iter_image_chunks(args.images, batch,
                                                 h, w):
        # mask/keypoint/panoptic artifacts append extra outputs past
        # the common 4-tuple (per-detection masks, keypoints, semantic
        # map) — the box printout reads only the shared prefix
        boxes, scores, labels, valid, *_extra = (np.asarray(t)
                                                 for t in fn(chunk))
        for i in range(len(chunk_paths)):
            path = os.path.basename(chunk_paths[i])
            kept = [(float(s), int(l), b)
                    for b, s, l, v in zip(boxes[i], scores[i], labels[i],
                                          valid[i])
                    if v and s >= args.det_threshold]
            if not kept:
                print(f"{path}: no detections >= {args.det_threshold:g}")
                continue
            for s, l, b in kept:
                name = names[l - 1] if names and 1 <= l <= len(names) \
                    else str(l)
                print(f"{path}: {name} {s:.2f} "
                      f"[{b[0]:.3f},{b[1]:.3f},{b[2]:.3f},{b[3]:.3f}]")


def run_segment(fn, art_shape, args):
    """Serve a segmentation artifact: chunk/pad the request through its
    fixed batch, print per-image class coverage, write VOC-palette mask
    PNGs (serving.export_segmentation normalizes internally — images go
    in as raw [0, 1] floats at the artifact's resolution)."""
    import os

    import numpy as np

    from myconvnet_tpu.utils.images import colorize_mask, save_png

    names = None
    if args.config:
        from myconvnet_tpu import recipes
        cfg = recipes.load_config(args.config)
        if cfg.get("dataset") == "voc":
            from myconvnet_tpu.subsets.voc import SEG_CLASS_NAMES
            names = SEG_CLASS_NAMES
    if not args.images:
        raise SystemExit("--segment needs --images DIR")
    out_dir = args.out or args.images
    os.makedirs(out_dir, exist_ok=True)
    batch, h, w = art_shape[0], art_shape[1], art_shape[2]

    for chunk_paths, chunk in _iter_image_chunks(
            args.images, batch, h, w, exclude_suffix=("_mask.png",)):
        classes, conf = (np.asarray(t) for t in fn(chunk))
        for i in range(len(chunk_paths)):
            base = os.path.basename(chunk_paths[i])
            cls_i = classes[i]
            ids, counts = np.unique(cls_i, return_counts=True)
            order = np.argsort(-counts)
            parts = []
            for j in order[:5]:
                cid = int(ids[j])
                label = (names[cid] if names and cid < len(names)
                         else str(cid))
                pct = 100.0 * counts[j] / cls_i.size
                parts.append(f"{label}:{pct:.0f}%")
            mask_path = os.path.join(
                out_dir, os.path.splitext(base)[0] + "_mask.png")
            save_png(mask_path, colorize_mask(cls_i))
            print(f"{base}: {', '.join(parts)} "
                  f"(mean conf {conf[i].mean():.2f}) -> {mask_path}")


def run_depth(fn, art_shape, args):
    """Serve a depth artifact: raw [0,1] frames in, metric depth out;
    per-image min/mean/max print + normalized grayscale PNGs."""
    import os

    import numpy as np

    from myconvnet_tpu.utils.images import save_png

    if not args.images:
        raise SystemExit("--depth needs --images DIR")
    out_dir = args.out or args.images
    os.makedirs(out_dir, exist_ok=True)
    batch, h, w = art_shape[0], art_shape[1], art_shape[2]
    for chunk_paths, chunk in _iter_image_chunks(
            args.images, batch, h, w, exclude_suffix=("_depth.png",)):
        depth = np.asarray(fn(chunk))
        for i, path in enumerate(chunk_paths):
            d = depth[i]
            lo, hi = float(d.min()), float(d.max())
            norm = (d - lo) / max(hi - lo, 1e-6)
            base = os.path.splitext(os.path.basename(path))[0]
            dst = os.path.join(out_dir, base + "_depth.png")
            save_png(dst, (norm * 255).astype(np.uint8))
            print(f"{os.path.basename(path)}: depth [{lo:.2f}, "
                  f"{hi:.2f}]m mean {float(d.mean()):.2f}m -> {dst}")


def run_flow(fn, art_shape, args):
    """Serve an optical-flow artifact: <name>_a.* / <name>_b.* frame
    pairs packed as [N, H, W, 6], color-wheel PNGs out."""
    import os

    import numpy as np
    from PIL import Image

    from myconvnet_tpu.utils.images import flow_to_color, save_png

    if not args.images:
        raise SystemExit("--flow needs --images DIR with "
                         "<name>_a.* / <name>_b.* frame pairs")
    batch, h, w = art_shape[0], art_shape[1], art_shape[2]
    pairs = {}
    for f in sorted(os.listdir(args.images)):
        base, ext = os.path.splitext(f)
        if ext.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        for tag in ("a", "b"):
            if base.endswith("_" + tag):
                pairs.setdefault(base[:-2], {})[tag] = \
                    os.path.join(args.images, f)
    names = sorted(k for k, v in pairs.items() if "a" in v and "b" in v)
    if not names:
        raise SystemExit(f"no <name>_a/<name>_b frame pairs under "
                         f"{args.images!r}")
    out_dir = args.out or args.images
    os.makedirs(out_dir, exist_ok=True)

    def load(p):
        return np.asarray(Image.open(p).convert("RGB").resize(
            (w, h), Image.BILINEAR), np.float32) / 255.0

    for start in range(0, len(names), batch):
        chunk_names = names[start:start + batch]
        x = np.zeros((batch, h, w, 6), np.float32)
        for i, name in enumerate(chunk_names):
            x[i, :, :, :3] = load(pairs[name]["a"])
            x[i, :, :, 3:] = load(pairs[name]["b"])
        flow = np.asarray(fn(x))
        for i, name in enumerate(chunk_names):
            mag = float(np.sqrt((flow[i] ** 2).sum(-1)).mean())
            dst = os.path.join(out_dir, name + "_flow.png")
            save_png(dst, flow_to_color(flow[i]))
            print(f"{name}: mean |flow| {mag:.2f}px -> {dst}")


def run_clips(fn, art_shape, args):
    """Serve a video artifact (test.py --export on a task='video'
    config): each SUBDIRECTORY of --clips is one clip of pre-extracted
    frames (the Kinetics-style layout subsets/video.py reads);
    ``num_frames`` uniformly spaced frames are sampled exactly like
    the training ClipSource, the raw [0, 1] clip runs through the
    artifact (recipe normalization is baked in), top-k printed."""
    import os

    import numpy as np

    from myconvnet_tpu.data.pipeline import decode_image
    from myconvnet_tpu.subsets.video import _frame_paths

    batch, t, h, w = (art_shape[0], art_shape[1], art_shape[2],
                      art_shape[3])
    root = args.clips
    clip_dirs = sorted(
        os.path.join(root, d) for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)))
    if not clip_dirs:
        raise SystemExit(f"no clip subdirectories under {root!r}")
    names = None
    if args.config:
        from myconvnet_tpu import recipes
        cfg = recipes.load_config(args.config)
        if cfg.get("data_dir"):
            try:
                from myconvnet_tpu.subsets.video import read_subset
                names = read_subset(cfg["data_dir"], "train")[2]
            except Exception:
                names = None

    def load_clip(d):
        paths = _frame_paths(d)
        if not paths:
            raise SystemExit(f"no frames in {d!r}")
        idx = np.linspace(0, len(paths) - 1, t).round().astype(int)
        return np.stack([decode_image(paths[j], (h, w)) for j in idx])

    for start in range(0, len(clip_dirs), batch):
        chunk_dirs = clip_dirs[start:start + batch]
        x = np.stack([load_clip(d) for d in chunk_dirs]) \
            .astype(np.float32) / 255.0
        if len(x) < batch:
            x = np.concatenate(
                [x, np.zeros((batch - len(x), t, h, w, 3), np.float32)])
        logits = np.asarray(fn(x))
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        for i, d in enumerate(chunk_dirs):
            order = np.argsort(-probs[i])[:args.topk]
            row = ", ".join(
                f"{names[c] if names and c < len(names) else c}:"
                f"{probs[i, c]:.3f}" for c in order)
            print(f"{os.path.basename(d)}: {row}")


def run_text(fn, art_shape, args):
    """Serve an OCR artifact (test.py --export on a task='ocr'
    config): grayscale line images in, decoded strings out.  The
    artifact emits the per-frame argmax path (serving.export_ocr);
    the CTC collapse + charset decode run here, with the charset from
    --config (default: the MJSynth alphanumerics)."""
    import os

    import numpy as np

    from myconvnet_tpu.ops.ctc import collapse
    from myconvnet_tpu.subsets.ocr import DEFAULT_CHARSET, decode_ids

    charset = DEFAULT_CHARSET
    if args.config:
        from myconvnet_tpu import recipes
        charset = recipes.load_config(args.config).get(
            "charset", DEFAULT_CHARSET)
    batch, h, w = art_shape[0], art_shape[1], art_shape[2]
    for chunk_paths, chunk in _iter_image_chunks(
            args.images, batch, h, w, nch=1, line_fit=True):
        ids, conf = fn(chunk)
        ids, conf = np.asarray(ids), np.asarray(conf)
        for i, path in enumerate(chunk_paths):
            text = decode_ids(collapse(ids[i]), charset)
            print(f"{os.path.basename(path)}: {text!r} "
                  f"(conf {float(conf[i]):.4f})")


def run_wav(fn, art_shape, args):
    """Serve an audio artifact via the TRAINING-path wav loader
    (subsets.audio.load_wav: 16-bit check, mixdown, pad/center-crop,
    and the sample-rate guard — a mis-rated corpus must fail loudly,
    not classify time-dilated audio); /32768 normalize, print top-k."""
    import os

    import numpy as np

    from myconvnet_tpu.subsets.audio import load_wav

    paths = sorted(
        os.path.join(args.wav, f) for f in os.listdir(args.wav)
        if f.lower().endswith(".wav"))
    if not paths:
        raise SystemExit(f"no .wav files under {args.wav!r}")
    batch, t = art_shape[0], art_shape[1]
    names = None
    rate = None
    if args.config:
        from myconvnet_tpu import recipes
        cfg = recipes.load_config(args.config)
        names = cfg.get("class_names")
        rate = cfg.get("sample_rate")

    def load(p):
        clip = load_wav(p, t, sample_rate=rate)
        return clip.astype(np.float32)[:, None] / 32768.0

    from myconvnet_tpu.eval.evaluators import decode_predictions
    for start in range(0, len(paths), batch):
        chunk_paths = paths[start:start + batch]
        x = np.stack([load(p) for p in chunk_paths])
        if len(x) < batch:
            x = np.concatenate(
                [x, np.zeros((batch - len(x), t, 1), np.float32)])
        logits = np.asarray(fn(x))
        labels = names or [str(i) for i in range(logits.shape[-1])]
        for p, row in zip(chunk_paths,
                          decode_predictions(logits, labels,
                                             args.topk)):
            pretty = ", ".join(f"{n}:{pr:.2f}" for n, pr in row)
            print(f"{os.path.basename(p)}: {pretty}")


def run_translate(fn, art_shape, args):
    """Serve an image-to-image artifact (style/sr/pix2pix/cyclegan from
    test.py --export): raw [0,1] images in at the artifact's
    resolution, [0,1] images out (possibly upscaled — SR), written as
    <name>_out.png."""
    import os

    import numpy as np
    from PIL import Image

    if not args.images:
        raise SystemExit("--translate needs --images DIR")
    out_dir = args.out or args.images
    os.makedirs(out_dir, exist_ok=True)
    batch, h, w = art_shape[0], art_shape[1], art_shape[2]

    for chunk_paths, chunk in _iter_image_chunks(
            args.images, batch, h, w, exclude_suffix=("_out.png",)):
        out = np.asarray(fn(chunk))
        for i, path in enumerate(chunk_paths):
            base = os.path.splitext(os.path.basename(path))[0]
            dst = os.path.join(out_dir, base + "_out.png")
            Image.fromarray(
                (np.clip(out[i], 0.0, 1.0) * 255).astype(
                    np.uint8)).save(dst)
            oh, ow = out[i].shape[:2]
            print(f"{os.path.basename(path)}: "
                  f"{h}x{w} -> {oh}x{ow} -> {dst}")


def run_sample(fn, art_shape, args):
    """Serve a latent-input generator artifact (dcgan or a diffusion
    DDIM sampler from test.py --export): draw --sample N(0,1) latents
    — [B, D] vectors or [B, H, W, C] image-shaped noise, per the
    artifact's input — and write a grid PNG."""
    import numpy as np
    from PIL import Image

    from myconvnet_tpu.utils.images import make_grid

    batch, z_shape = art_shape[0], tuple(art_shape[1:])
    rng = np.random.RandomState(args.seed)
    outs = []
    need = args.sample
    while need > 0:
        z = rng.standard_normal((batch, *z_shape)).astype(np.float32)
        outs.append(np.asarray(fn(z))[:min(need, batch)])
        need -= batch
    imgs = (np.clip(np.concatenate(outs), 0.0, 1.0) * 255).astype(
        np.uint8)
    dst = args.out or "samples.png"
    Image.fromarray(make_grid(imgs)).save(dst)
    print(f"wrote {len(imgs)} samples to {dst}")


def run_track(fn, art_shape, args):
    """Serve a tracking artifact: pack <name>_search / <name>_exemplar
    image pairs into the [N, H, W, 6] blob wire format and print the
    predicted (dx, dy) pixel offsets + confidences.

    The exemplar corner size comes from the recipe config
    (model_kwargs.exemplar_hw) when --config is given, else half the
    artifact's search resolution (both shipped variants' ratio).
    """
    import os

    import numpy as np
    from PIL import Image

    if not args.images:
        raise SystemExit("--track needs --images DIR with "
                         "<name>_search.* / <name>_exemplar.* pairs")
    batch, h, w = art_shape[0], art_shape[1], art_shape[2]
    he, we = h // 2, w // 2
    if args.config:
        from myconvnet_tpu import recipes
        cfg = recipes.load_config(args.config)
        ehw = cfg.get("model_kwargs", {}).get("exemplar_hw")
        if ehw:
            he, we = int(ehw[0]), int(ehw[1])
    pairs = {}
    for f in sorted(os.listdir(args.images)):
        base, ext = os.path.splitext(f)
        if ext.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        for tag in ("search", "exemplar"):
            if base.endswith("_" + tag):
                pairs.setdefault(base[:-len(tag) - 1], {})[tag] = \
                    os.path.join(args.images, f)
    names = sorted(k for k, v in pairs.items()
                   if "search" in v and "exemplar" in v)
    if not names:
        raise SystemExit(f"no <name>_search/<name>_exemplar pairs "
                         f"under {args.images!r}")

    def load(p, hh, ww):
        return np.asarray(Image.open(p).convert("RGB").resize(
            (ww, hh), Image.BILINEAR), np.float32) / 255.0

    for start in range(0, len(names), batch):
        chunk_names = names[start:start + batch]
        blobs = np.zeros((batch, h, w, 6), np.float32)
        for i, name in enumerate(chunk_names):
            blobs[i, :, :, :3] = load(pairs[name]["search"], h, w)
            blobs[i, :he, :we, 3:] = load(pairs[name]["exemplar"],
                                          he, we)
        offsets, scores = (np.asarray(t) for t in fn(blobs))
        for i, name in enumerate(chunk_names):
            print(f"{name}: dx={offsets[i, 0]:+.1f}px "
                  f"dy={offsets[i, 1]:+.1f}px "
                  f"score={scores[i]:.3f}")


if __name__ == "__main__":
    main()
