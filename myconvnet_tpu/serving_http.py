"""Multi-artifact HTTP model server on the Python stdlib.

The reference framework stops at file-level inference (its test.py
prints predictions for a directory — SURVEY.md §2 #9); deployment
surfaces are this rebuild's extension of that entry point.  Several
exported StableHLO artifacts load behind ONE process, each at a named
route, speaking a JSON/HTTP protocol shaped like the common serving
conventions (health, model list, ``:predict``):

    GET  /healthz                    -> {"status": "ok"}
    GET  /v1/models                  -> {"models": [{name, kind, ...}]}
    POST /v1/models/<name>:predict
         body: a JPEG/PNG (Content-Type image/*), or JSON
         {"instances": [[H,W,C float rows], ...]} in [0, 1].
         classify -> {"predictions": [[{"label","prob"} x topk], ...]}
         detect   -> {"detections": [[{"box","score","label"}, ...]]}
         embed    -> {"embeddings": [[D floats], ...]}  (unit-norm;
                     metric-learning artifacts — face verification
                     compares these by cosine)
         track    -> {"tracks": [{"dx","dy","score"}, ...]}  (tracking
                     artifacts take [H,W,6] search+exemplar blobs —
                     JSON instances only, raw [0, 1])
         segment  -> {"segmentations": [{"size": [H, W], "rle":
                     [class, run, class, run, ...], "coverage":
                     {label: fraction}, "mean_conf"} , ...]}  (the
                     class map run-length encoded in row-major order;
                     segmentation artifacts normalize internally —
                     raw [0, 1] in, like detect)
         translate -> {"images": [base64 PNG, ...]}  (image-to-image
                     artifacts — style/SR/pix2pix/cyclegan from
                     test.py --export; raw [0, 1] in, [0, 1] out,
                     returned as base64-encoded PNGs)
         text     -> {"texts": [{"text", "conf"}, ...]}  (OCR
                     artifacts — raw [0, 1] grayscale line images in;
                     CTC collapse against the recipe charset runs
                     host-side per request)
         depth    -> {"depths": [{"size", "min", "max", "mean",
                     "png"}, ...]}  (metric depth + min/max-normalized
                     grayscale PNG, near = bright)
         flow     -> {"flows": [{"size", "mean_mag", "max_mag",
                     "png"}, ...]}  (JSON [H, W, 6] frame-pair
                     instances in; Middlebury color-wheel PNG out)
         audio    -> {"predictions": ...}  (waveform classifiers —
                     POST a 16-bit PCM WAV (Content-Type audio/*) or
                     JSON [T]/[T, 1] float instances in [-1, 1];
                     response shaped like classify)

No web framework — ``http.server.ThreadingHTTPServer`` plus one
dispatch lock: request decode/encode runs on handler threads, the
device executes one program at a time (honest per-request latency, no
interleaving).  Arbitrary request sizes pad/chunk through each
artifact's fixed compiled batch, pytree-aware (detection outputs are
4-tuples, so the classifier-only ``make_batched_server`` slice does
not apply here).  ``ModelServer(batch_window_ms=...)`` adds per-route
cross-request micro-batching (serve.py --batch_window_ms): concurrent
requests within the window coalesce into one device call.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import numpy as np


@dataclass
class Route:
    """One served artifact: the loaded program plus its request codec."""

    name: str
    # "classify" | "detect" | "embed" | "track" | "segment" |
    # "translate" | "text" | "depth" | "flow" | "audio"
    kind: str
    fn: Callable                   # load_inference product (fixed shapes)
    input_shape: tuple             # (B, H, W, C); audio: (B, T, 1)
    mean: np.ndarray = None        # classify: normalization applied here
    std: np.ndarray = None         # (detect artifacts normalize inside)
    class_names: Optional[Sequence[str]] = None
    topk: int = 5
    threshold: float = 0.5         # detect: default score floor
    charset: Optional[str] = None  # text: 1-based symbol table
    sample_rate: Optional[int] = None  # audio: wav-rate guard

    def describe(self) -> dict:
        return {"name": self.name, "kind": self.kind,
                "input": list(self.input_shape),
                "classes": len(self.class_names)
                if self.class_names else None}


def build_route(name: str, kind: str, artifact: str,
                config: Optional[str] = None, topk: int = 5,
                threshold: float = 0.5) -> Route:
    """Load an artifact and resolve its codec the way serve.py's
    one-shot path does: normalization through make_augment +
    AugmentConfig defaults (never silently unnormalized — ADVICE r1),
    class names from the recipe's dataset when known."""
    from myconvnet_tpu import serving

    if kind not in ("classify", "detect", "embed", "track", "segment",
                    "translate", "text", "depth", "flow", "audio"):
        raise ValueError(f"route {name!r}: unknown kind {kind!r}")
    fn = serving.load_inference(artifact)
    shape = fn.input_shapes[0]
    want_rank = 3 if kind == "audio" else 4
    if len(shape) != want_rank:
        # fail at startup, not with a 500 on the first request: the
        # image kinds decode [N, H, W, C] bodies, audio [N, T, 1]
        # waveforms (latent-input dcgan artifacts are a serve.py
        # --sample consumer, not a route; 5-D video artifacts are a
        # batch/offline consumer — docs/ROADMAP.md)
        raise ValueError(
            f"route {name!r}: artifact input {tuple(shape)} is not "
            f"rank-{want_rank} — {kind!r} routes serve "
            f"{'[N, T, 1] waveform' if kind == 'audio' else '[N, H, W, C] image'}"
            " artifacts only")
    mean = std = None
    names = None
    charset = sample_rate = None
    cfg = None
    if config:
        from myconvnet_tpu import recipes
        cfg = recipes.load_config(config)
        names = _dataset_class_names(cfg, kind)
    if kind == "text":
        from myconvnet_tpu.subsets.ocr import DEFAULT_CHARSET
        charset = (cfg or {}).get("charset", DEFAULT_CHARSET)
    if kind == "audio" and cfg:
        sample_rate = cfg.get("sample_rate")
    if kind in ("classify", "embed"):
        from myconvnet_tpu.data.augment import AugmentConfig
        acfg = AugmentConfig()
        if cfg:
            from myconvnet_tpu import recipes
            acfg = recipes.make_augment(cfg.get("augment")) or acfg
        nch = shape[3] if len(shape) > 3 else 3
        mean = np.asarray(acfg.mean, np.float32)
        std = np.asarray(acfg.std, np.float32)
        if mean.ndim and mean.shape[0] != nch:
            mean = np.full((nch,), float(mean.mean()), np.float32)
            std = np.full((nch,), float(std.mean()), np.float32)
    return Route(name=name, kind=kind, fn=fn, input_shape=shape,
                 mean=mean, std=std, class_names=names, topk=topk,
                 threshold=threshold, charset=charset,
                 sample_rate=sample_rate)


def _dataset_class_names(cfg: dict, kind: str = "classify"):
    ds = cfg.get("dataset")
    if ds == "fashion_mnist":
        from myconvnet_tpu.subsets.mnist import FASHION_CLASS_NAMES
        return FASHION_CLASS_NAMES
    if ds == "voc":
        from myconvnet_tpu.subsets.voc import (DET_CLASS_NAMES,
                                               SEG_CLASS_NAMES)
        return SEG_CLASS_NAMES if kind == "segment" else DET_CLASS_NAMES
    return None


def _run_chunked(fn, x: np.ndarray, batch: int):
    """Pad/chunk a request of any size through the artifact's fixed
    batch; pytree-aware output reassembly (classify: array; detect:
    tuple of arrays)."""
    import jax

    outs = []
    for i in range(0, len(x), batch):
        chunk = x[i:i + batch]
        n = len(chunk)
        if n < batch:
            chunk = np.concatenate(
                [chunk, np.zeros((batch - n, *x.shape[1:]), x.dtype)])
        out = fn(chunk)
        outs.append(jax.tree.map(lambda t: np.asarray(t)[:n], out))
    return jax.tree.map(lambda *ts: np.concatenate(ts), *outs)


def _rle_encode(flat: np.ndarray) -> list:
    """Row-major run-length encoding: [class, run, class, run, ...].
    Decode: np.repeat(rle[0::2], rle[1::2]).reshape(size)."""
    if flat.size == 0:
        return []
    change = np.flatnonzero(np.diff(flat)) + 1
    starts = np.concatenate([[0], change])
    runs = np.diff(np.concatenate([starts, [flat.size]]))
    out = np.empty(2 * len(starts), np.int64)
    out[0::2] = flat[starts]
    out[1::2] = runs
    return out.tolist()


def _class_coverage(cls: np.ndarray, names=None, top: int = 5) -> dict:
    ids, counts = np.unique(cls, return_counts=True)
    order = np.argsort(-counts)[:top]
    cov = {}
    for j in order:
        cid = int(ids[j])
        label = names[cid] if names and cid < len(names) else str(cid)
        cov[label] = round(float(counts[j]) / cls.size, 4)
    return cov


class _Batcher:
    """Cross-request micro-batching: requests to one route arriving
    within a window coalesce into ONE device call (the classic serving
    aggregator — trades up to ``window`` of latency for MXU batch
    efficiency on concurrent small requests).

    Leader-collects protocol: the first request into an empty epoch
    becomes the leader, sleeps the window while followers append their
    payloads, closes the epoch under the mutex, runs the concatenated
    batch once, and wakes the followers, each slicing its own rows
    back out (pytree-aware, so multi-output artifacts work).
    """

    def __init__(self, run, window_s: float):
        self.run = run          # fn(x_concat) -> outputs (pytree)
        self.window = window_s
        self._mu = threading.Lock()
        self._epoch = None

    def submit(self, x: np.ndarray):
        import time as _time

        with self._mu:
            epoch = self._epoch
            lead = epoch is None
            if lead:
                epoch = {"xs": [], "done": threading.Event(),
                         "outs": None, "err": None}
                self._epoch = epoch
            idx = len(epoch["xs"])
            epoch["xs"].append(x)
        if lead:
            _time.sleep(self.window)
            with self._mu:
                self._epoch = None      # epoch frozen; new ones open
            try:
                epoch["outs"] = self.run(np.concatenate(epoch["xs"]))
            except BaseException as e:  # wake followers with the error
                epoch["err"] = e
                raise
            finally:
                epoch["done"].set()
        else:
            epoch["done"].wait()
            if epoch["err"] is not None:
                raise RuntimeError(
                    f"batched device call failed: {epoch['err']}")
        import jax
        start = sum(len(a) for a in epoch["xs"][:idx])
        n = len(epoch["xs"][idx])
        return jax.tree.map(lambda t: t[start:start + n],
                            epoch["outs"])


class ModelServer:
    """The route table + device lock; http handlers delegate here.

    ``batch_window_ms > 0`` turns on per-route cross-request
    micro-batching (_Batcher): concurrent requests within the window
    run as one device call instead of serializing through the lock.
    """

    def __init__(self, routes: Sequence[Route],
                 batch_window_ms: float = 0.0):
        if not routes:
            raise ValueError("no routes")
        self.routes = {r.name: r for r in routes}
        if len(self.routes) != len(routes):
            raise ValueError("duplicate route names")
        self._lock = threading.Lock()
        self._batchers = {}
        if batch_window_ms > 0:
            for r in self.routes.values():
                self._batchers[r.name] = _Batcher(
                    self._runner(r), batch_window_ms / 1e3)

    def _runner(self, route: Route):
        def run(x):
            with self._lock:
                return _run_chunked(route.fn, x, route.input_shape[0])
        return run

    def _execute(self, route: Route, x: np.ndarray):
        """One device execution for this request's rows — direct (under
        the lock) or through the route's micro-batcher."""
        b = self._batchers.get(route.name)
        if b is not None:
            return b.submit(x)
        with self._lock:
            return _run_chunked(route.fn, x, route.input_shape[0])

    # ---------------------------------------------------------- codecs

    def _decode_body(self, route: Route, body: bytes,
                     content_type: str) -> np.ndarray:
        if route.kind == "audio":
            return self._decode_audio(route, body, content_type)
        h, w = route.input_shape[1], route.input_shape[2]
        nch = route.input_shape[3] if len(route.input_shape) > 3 else 3
        if content_type.startswith("image/"):
            if route.kind in ("track", "flow"):
                raise ValueError(
                    f"{route.kind} routes take JSON instances of "
                    f"[H, W, {nch}] blobs (two stacked frames), not a "
                    "single image")
            import io

            from PIL import Image
            mode = "L" if nch == 1 else "RGB"
            img = Image.open(io.BytesIO(body)).convert(mode)
            if route.kind == "text":
                # training-parity line geometry (subsets.ocr._fit_line:
                # scale to height preserving aspect, right-pad /
                # center-crop) — an aspect-warping resize squeezes wide
                # lines and transcribes wrong with plausible confidence
                from myconvnet_tpu.subsets.ocr import _fit_line
                arr = _fit_line(np.asarray(img, np.uint8), (h, w))
                return arr.astype(np.float32)[None, ..., None] / 255.0
            img = img.resize((w, h), Image.BILINEAR)
            x = np.asarray(img, np.float32)[None] / 255.0
            if nch == 1:
                x = x[..., None]
            return x
        payload = json.loads(body.decode("utf-8"))
        x = np.asarray(payload["instances"], np.float32)
        if x.ndim == 3:
            x = x[None]
        want = (h, w, nch)
        if x.ndim != 4 or x.shape[1:] != want:
            raise ValueError(
                f"instances shape {x.shape} != [N, {h}, {w}, {nch}]")
        return x

    def _decode_audio(self, route: Route, body: bytes,
                      content_type: str) -> np.ndarray:
        """Audio bodies: a 16-bit PCM WAV file (Content-Type audio/*),
        or JSON instances of [T] / [T, 1] float waveforms in [-1, 1].
        WAVs pad/center-crop to the artifact's sample count through the
        TRAINING-path loader (rate guard included when the route has a
        config)."""
        t = route.input_shape[1]
        if content_type.startswith(("audio/", "application/octet")):
            import io

            from myconvnet_tpu.subsets.audio import load_wav
            clip = load_wav(io.BytesIO(body), t,
                            sample_rate=route.sample_rate)
            return (clip.astype(np.float32) / 32768.0)[None, :, None]
        payload = json.loads(body.decode("utf-8"))
        x = np.asarray(payload["instances"], np.float32)
        if x.ndim == 1:
            x = x[None]
        if x.ndim == 2:
            x = x[..., None]
        if x.ndim != 3 or x.shape[1:] != (t, 1):
            raise ValueError(
                f"instances shape {x.shape} != [N, {t}, 1]")
        return x

    def predict(self, name: str, body: bytes,
                content_type: str = "application/json",
                threshold: Optional[float] = None) -> dict:
        route = self.routes.get(name)
        if route is None:
            raise KeyError(name)
        x = self._decode_body(route, body, content_type)
        if route.kind == "classify":
            x = (x - route.mean) / route.std
            logits = self._execute(route, x)
            from myconvnet_tpu.eval.evaluators import decode_predictions
            names = route.class_names or [
                str(i) for i in range(logits.shape[-1])]
            rows = decode_predictions(logits, names, route.topk)
            return {"predictions": [
                [{"label": n, "prob": round(float(p), 6)} for n, p in row]
                for row in rows]}
        if route.kind == "embed":
            x = (x - route.mean) / route.std
            emb = self._execute(route, x)
            # the artifact's eval forward already unit-normalizes;
            # renormalize so truncated-precision exports stay exactly
            # cosine-comparable
            emb = np.asarray(emb, np.float32)
            emb /= np.maximum(
                np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            return {"embeddings": [[round(float(v), 6) for v in row]
                                   for row in emb]}
        if route.kind == "track":
            # tracking artifacts decode the response peak on device:
            # raw [0, 1] [N, H, W, 6] blobs in, (offsets, scores) out
            offsets, scores = self._execute(route, x)
            return {"tracks": [
                {"dx": round(float(o[0]), 3),
                 "dy": round(float(o[1]), 3),
                 "score": round(float(s), 6)}
                for o, s in zip(offsets, scores)]}
        if route.kind == "translate":
            # image-to-image artifact: raw [0, 1] in, [0, 1] out
            import base64
            import io

            from PIL import Image
            out = self._execute(route, x)
            imgs = []
            for y in np.asarray(out):
                buf = io.BytesIO()
                Image.fromarray(
                    (np.clip(y, 0.0, 1.0) * 255).astype(
                        np.uint8)).save(buf, "PNG")
                imgs.append(base64.b64encode(
                    buf.getvalue()).decode("ascii"))
            return {"images": imgs}
        if route.kind == "segment":
            # artifact normalizes internally — raw [0, 1] in;
            # (classes [N,H,W] s32, conf [N,H,W] f32) out
            classes, conf = self._execute(route, x)
            out = []
            for i in range(len(x)):
                cls_i = np.asarray(classes[i])
                out.append({
                    "size": list(cls_i.shape),
                    "rle": _rle_encode(cls_i.reshape(-1)),
                    "coverage": _class_coverage(cls_i,
                                                route.class_names),
                    "mean_conf": round(float(np.mean(conf[i])), 4),
                })
            return {"segmentations": out}
        if route.kind == "audio":
            # waveform classifier: [-1, 1] floats in, logits out —
            # same response shape as classify
            logits = self._execute(route, x)
            from myconvnet_tpu.eval.evaluators import decode_predictions
            names = route.class_names or [
                str(i) for i in range(logits.shape[-1])]
            rows = decode_predictions(logits, names, route.topk)
            return {"predictions": [
                [{"label": n, "prob": round(float(p), 6)} for n, p in row]
                for row in rows]}
        if route.kind == "text":
            # OCR artifact: raw [0, 1] line images in, (per-frame
            # argmax ids, conf) out; collapse repeats+blanks against
            # the route's charset host-side (serving.export_ocr)
            from myconvnet_tpu.ops.ctc import collapse
            from myconvnet_tpu.subsets.ocr import decode_ids
            ids, conf = self._execute(route, x)
            out = []
            for i in range(len(x)):
                sym = collapse(np.asarray(ids[i]))
                out.append({"text": decode_ids(sym, route.charset),
                            "conf": round(float(conf[i]), 6)})
            return {"texts": out}
        if route.kind == "depth":
            # depth artifact: raw [0, 1] frames in, metric depth
            # [N, H, W] f32 out; PNG = per-image min/max-normalized
            # grayscale (near = bright), min/max let clients rescale
            import base64
            import io

            from PIL import Image
            d = np.asarray(self._execute(route, x), np.float32)
            out = []
            for i in range(len(x)):
                di = d[i]
                lo, hi = float(di.min()), float(di.max())
                vis = 1.0 - (di - lo) / max(hi - lo, 1e-6)
                buf = io.BytesIO()
                Image.fromarray((vis * 255).astype(np.uint8)).save(
                    buf, "PNG")
                out.append({
                    "size": list(di.shape),
                    "min": round(lo, 4), "max": round(hi, 4),
                    "mean": round(float(di.mean()), 4),
                    "png": base64.b64encode(
                        buf.getvalue()).decode("ascii")})
            return {"depths": out}
        if route.kind == "flow":
            # flow artifact: raw [0, 1] [H, W, 6] frame pairs in
            # (JSON instances), [N, H, W, 2] pixel flow out; PNG =
            # Middlebury color wheel
            import base64
            import io

            from PIL import Image

            from myconvnet_tpu.utils.images import flow_to_color
            f = np.asarray(self._execute(route, x), np.float32)
            out = []
            for i in range(len(x)):
                mag = np.sqrt((f[i] ** 2).sum(-1))
                buf = io.BytesIO()
                Image.fromarray(flow_to_color(f[i])).save(buf, "PNG")
                out.append({
                    "size": list(f[i].shape[:2]),
                    "mean_mag": round(float(mag.mean()), 4),
                    "max_mag": round(float(mag.max()), 4),
                    "png": base64.b64encode(
                        buf.getvalue()).decode("ascii")})
            return {"flows": out}
        # detect: artifact normalizes internally — raw [0, 1] in
        boxes, scores, labels, valid = self._execute(route, x)
        thr = route.threshold if threshold is None else threshold
        out = []
        for i in range(len(x)):
            dets = []
            for b, s, l, v in zip(boxes[i], scores[i], labels[i],
                                  valid[i]):
                if not v or s < thr:
                    continue
                name_l = (route.class_names[int(l) - 1]
                          if route.class_names
                          and 1 <= int(l) <= len(route.class_names)
                          else str(int(l)))
                dets.append({"box": [round(float(c), 5) for c in b],
                             "score": round(float(s), 5),
                             "label": name_l})
            out.append(dets)
        return {"detections": out}

    def models(self) -> dict:
        return {"models": [r.describe()
                           for r in self.routes.values()]}


def make_http_server(server: ModelServer, host: str = "127.0.0.1",
                     port: int = 0) -> ThreadingHTTPServer:
    """Bind the route table to a ThreadingHTTPServer (port 0 = ephemeral;
    read the bound port off ``httpd.server_address``).  Caller owns the
    serve_forever thread and shutdown."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: the CLI prints its own line
            pass

        def _send(self, code: int, payload: dict):
            blob = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/healthz":
                return self._send(200, {"status": "ok"})
            if self.path == "/v1/models":
                return self._send(200, server.models())
            return self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse
            parsed = urlparse(self.path)
            path = parsed.path
            if not (path.startswith("/v1/models/")
                    and path.endswith(":predict")):
                return self._send(404, {"error": f"no route {path}"})
            name = path[len("/v1/models/"):-len(":predict")]
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            ctype = self.headers.get("Content-Type",
                                     "application/json")
            qs = parse_qs(parsed.query)
            thr = (float(qs["threshold"][0])
                   if "threshold" in qs else None)
            try:
                result = server.predict(name, body, ctype, threshold=thr)
            except KeyError:
                return self._send(404, {"error": f"no model {name!r}"})
            except Exception as e:  # bad payload -> client error
                return self._send(400, {"error": str(e)})
            return self._send(200, result)

    return ThreadingHTTPServer((host, port), Handler)


def parse_route_spec(spec: str, topk: int = 5,
                     threshold: float = 0.5) -> Route:
    """CLI form: NAME=KIND:ARTIFACT[:CONFIG] (e.g.
    ``cls=classify:resnet.stablehlo:configs/imagenet_resnet50.py``)."""
    if "=" not in spec:
        raise ValueError(f"route spec {spec!r}: want NAME=KIND:ARTIFACT")
    name, rest = spec.split("=", 1)
    parts = rest.split(":")
    if len(parts) < 2:
        raise ValueError(f"route spec {spec!r}: want NAME=KIND:ARTIFACT")
    kind, artifact = parts[0], parts[1]
    config = parts[2] if len(parts) > 2 else None
    return build_route(name, kind, artifact, config=config, topk=topk,
                       threshold=threshold)
