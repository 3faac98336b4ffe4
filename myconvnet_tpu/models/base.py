"""ConvNet base class: the reference's public API over the JAX core.

BASELINE north_star: "preserve the ConvNet base-class public API
(build/train/predict, checkpoint save/restore) while replacing the TF
low-level graph with jitted JAX functions."  The reference's ConvNet
(SURVEY.md §2#1) builds a TF graph at construction, trains via an
Optimizer driver, predicts via Session.run, and saves/restores with
tf.train.Saver.  Here:

* ``build()``  — initializes params/state (the graph-build analogue; done
  lazily on first use, or explicitly).
* ``train()``  — wires DataSet + Evaluator + Trainer and runs the fitted
  loop (jitted step, on-device augmentation, best-ckpt retention).
* ``predict()`` — batched jitted inference.
* ``save()/restore()`` — full-train-state checkpoints.

Subclasses override ``_forward`` (the ``_build_model`` analogue) or pass
``model_fn``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu.core import transform
from myconvnet_tpu.core.precision import get_policy, policy_scope
from myconvnet_tpu.data.augment import AugmentConfig, augment_eval, \
    augment_train
from myconvnet_tpu.data.mix import MixConfig
from myconvnet_tpu.data.pipeline import DataSet
from myconvnet_tpu.eval.evaluators import AccuracyEvaluator, Evaluator
from myconvnet_tpu.parallel import mesh as mesh_lib
from myconvnet_tpu.train import optim as optim_lib
from myconvnet_tpu.train.losses import softmax_cross_entropy
from myconvnet_tpu.train.trainer import Trainer, TrainState, \
    init_train_state
from myconvnet_tpu.utils.logging import MetricLogger


class ConvNet:
    """Reference-compatible model wrapper.

    Example::

        net = ConvNet(models.resnet50, input_shape=(224, 224, 3),
                      num_classes=1000, precision="bf16")
        net.build()
        net.train(train_set, val_set, batch_size=256, total_steps=1000)
        logits = net.predict(images)
        net.save("ckpts/")
    """

    def __init__(self, model_fn: Callable | None = None, *,
                 input_shape: tuple[int, ...] = (32, 32, 3),
                 num_classes: int = 10, precision: str = "f32",
                 loss_fn: Callable | None = None,
                 augment: AugmentConfig | None = None,
                 mix: "MixConfig | None" = None,
                 erase_prob: float = 0.0,
                 paired_targets: bool = False,
                 augment_fns: tuple | None = None,
                 mesh=None, use_mesh: bool = False,
                 remat: bool = False, accum_steps: int = 1,
                 accum_dtype: str = "float32",
                 debug_checks: bool = False, spatial: bool = False,
                 zero_sharding: bool = False, sam_rho: float = 0.0,
                 chain_steps: int = 1,
                 accuracy_metric: bool = True,
                 cast_input: bool = True,
                 seed: int = 0, ckpt_dir: str | None = None,
                 log_dir: str | None = None, **model_kwargs):
        if model_fn is None and type(self)._forward is ConvNet._forward:
            raise ValueError("pass model_fn or subclass and override "
                             "_forward")
        self._model_fn = model_fn
        self.input_shape = tuple(input_shape)
        self.num_classes = num_classes
        self.policy = get_policy(precision)
        self.loss_fn = loss_fn or (
            lambda logits, y: softmax_cross_entropy(logits, y))
        self.augment = augment
        # batch-level label-mixing regularizers (MixUp/CutMix) + random
        # erasing — run inside the same jitted step as the per-image chain
        self.mix = mix
        self.erase_prob = erase_prob
        # paired_targets: labels are spatial masks sharing the random
        # geometry (segmentation) — image gets bilinear, mask nearest
        self.paired_targets = paired_targets
        # augment_fns: explicit (train_fn, eval_fn, predict_fn) triple
        # replacing the AugmentConfig-derived chain — for tasks whose
        # target is synthesized from the image itself (super-resolution
        # builds the LR input and HR target from one HR crop).
        # train_fn(key, x, y) -> (x, y); eval_fn(x, y) -> (x, y);
        # predict_fn(x) -> x.
        self.augment_fns = augment_fns
        self.mesh = mesh if mesh is not None else (
            mesh_lib.make_mesh() if use_mesh else None)
        self.remat = remat
        self.accum_steps = accum_steps
        self.accum_dtype = accum_dtype
        self.debug_checks = debug_checks
        self.spatial = spatial
        self.zero_sharding = zero_sharding
        self.sam_rho = sam_rho
        # dispatch chaining (steps-per-loop): K train steps per jitted
        # call over a pre-staged [K, B, ...] window — bounds host work
        # to one iteration per K steps (see Trainer.chain_steps)
        self.chain_steps = chain_steps
        self.accuracy_metric = accuracy_metric
        # cast_input=False skips the global input downcast and lets the
        # model manage precision: nn layers cast activations to the
        # compute dtype internally, so this only matters for models with
        # a precision-sensitive frontend (e.g. audio log-mel under bf16,
        # where an early bf16 cast would quantize the 16-bit waveform to
        # an 8-bit mantissa BEFORE the f32 STFT).
        self.cast_input = cast_input
        self.seed = seed
        self.ckpt_dir = ckpt_dir
        self.model_kwargs = model_kwargs
        self.logger = MetricLogger(log_dir=log_dir)
        # optional utils.preemption.PreemptionGuard threaded into the
        # Trainer so SIGTERM checkpoints and exits cleanly
        self.preemption_guard = None
        self._transformed = transform(self._wrapped_forward)
        self.state: TrainState | None = None
        self._trainer: Trainer | None = None

    # -------------------------------------------------------------- model

    def _forward(self, x: jax.Array, train: bool) -> jax.Array:
        """Subclass hook (the reference's abstract _build_model)."""
        return self._model_fn(x, self.num_classes, train=train,
                              **self.model_kwargs)

    def _wrapped_forward(self, x, train=False):
        with policy_scope(self.policy):
            if self.cast_input:
                x = self.policy.cast_to_compute(x)
            out = self._forward(x, train)
            return self.policy.cast_to_output(out)

    # -------------------------------------------------------------- build

    def build(self, optimizer: optim_lib.Optimizer | None = None,
              batch_size: int = 2) -> "ConvNet":
        """Initialize params/state (+optimizer state) — the graph-build
        analogue.  Idempotent."""
        if self.state is not None:
            return self
        opt = optimizer or optim_lib.momentum(0.01, 0.9)
        self._optimizer = opt
        rng = jax.random.key(self.seed)
        sample = jnp.zeros((batch_size, *self.input_shape),
                           self.policy.compute_dtype if self.cast_input
                           else jnp.float32)
        self.state = init_train_state(self._transformed, opt, rng, sample)
        return self

    def _make_trainer(self, evaluator: Evaluator | None) -> Trainer:
        aug_fn = None
        eval_aug_fn = None
        predict_fn = None
        if self.augment_fns is not None:
            aug_fn, eval_aug_fn, predict_fn = self.augment_fns
        elif self.augment is not None:
            cfg = self.augment
            if self.paired_targets:
                from myconvnet_tpu.data.augment import (augment_eval_pair,
                                                        augment_train_pair)
                aug_fn = lambda k, x, y: augment_train_pair(  # noqa: E731
                    k, x, y, cfg)
                eval_aug_fn = lambda x, y: augment_eval_pair(  # noqa: E731
                    x, y, cfg)
                predict_fn = lambda x: augment_eval(  # noqa: E731
                    x, cfg, crop_fraction=1.0)
            else:
                aug_fn = lambda k, x, y: (  # noqa: E731
                    augment_train(k, x, cfg), y)
                eval_aug_fn = lambda x, y: (  # noqa: E731
                    augment_eval(x, cfg), y)
        if (self.mix is not None or self.erase_prob > 0.0) \
                and not self.paired_targets and self.augment_fns is None:
            from myconvnet_tpu.data.mix import mixup_cutmix, random_erasing
            base_aug, mix_cfg = aug_fn, self.mix
            erase_prob, num_classes = self.erase_prob, self.num_classes

            def aug_fn(k, x, y):  # noqa: F811 — composed chain
                k_img, k_mix, k_erase = jax.random.split(k, 3)
                if base_aug is not None:
                    x, y = base_aug(k_img, x, y)
                if mix_cfg is not None:
                    x, y = mixup_cutmix(k_mix, x, y, num_classes, mix_cfg)
                if erase_prob > 0.0:
                    x = random_erasing(k_erase, x, prob=erase_prob)
                return x, y
        return Trainer(
            model=self._transformed, optimizer=self._optimizer,
            loss_fn=self.loss_fn, mesh=self.mesh, augment_fn=aug_fn,
            eval_augment_fn=eval_aug_fn, predict_augment_fn=predict_fn,
            evaluator=evaluator, ckpt_dir=self.ckpt_dir,
            remat=self.remat, accum_steps=self.accum_steps,
            accum_dtype=self.accum_dtype,
            debug_checks=self.debug_checks, spatial=self.spatial,
            zero_sharding=self.zero_sharding, sam_rho=self.sam_rho,
            chain_steps=self.chain_steps,
            accuracy_metric=self.accuracy_metric,
            preemption_guard=self.preemption_guard,
            logger=self.logger)

    # -------------------------------------------------------------- train

    def train(self, train_set: DataSet, val_set: DataSet | None = None, *,
              batch_size: int = 128, total_steps: int = 1000,
              epochs: int | None = None,
              optimizer: optim_lib.Optimizer | None = None,
              evaluator: Evaluator | None = None, val_every: int = 0,
              early_stop_patience: int = 0,
              plateau_factor: float = 0.0,
              plateau_patience: int = 0) -> TrainState:
        if epochs is not None:
            # reference-era epoch arithmetic: steps per epoch from the
            # train split size (drop-remainder batching).  NOTE: a
            # step-horizon LR schedule baked into `optimizer` is the
            # caller's concern here; train.py resolves epochs before
            # building the optimizer so recipes stay consistent.
            total_steps = epochs * max(len(train_set) // batch_size, 1)
        if optimizer is not None and optimizer is not getattr(
                self, "_optimizer", None):
            # a genuinely different optimizer invalidates opt state; the
            # same object (e.g. the resume flow: build(opt) -> restore ->
            # train(opt)) keeps the restored state
            self._optimizer = optimizer
            self.state = None
        self.build(getattr(self, "_optimizer", None))
        if evaluator is None:
            if self.paired_targets:  # segmentation default: mIoU
                from myconvnet_tpu.eval.evaluators import MeanIoUEvaluator
                evaluator = MeanIoUEvaluator(self.num_classes)
            else:
                evaluator = AccuracyEvaluator()
        trainer = self._make_trainer(evaluator)
        if plateau_factor and plateau_patience:
            trainer.plateau_factor = plateau_factor
            trainer.plateau_patience = plateau_patience
        self._trainer = trainer
        val_iter_fn = (lambda: val_set.eval_iter(batch_size)) \
            if val_set is not None else None
        chain = max(int(self.chain_steps), 1)
        # with a mesh, stage batches directly into the sharded layout on
        # the prefetch thread (the default single-device put would park
        # the whole window on chip 0 and reshard synchronously later)
        put_fn = None
        if self.mesh is not None:
            put_fn = trainer.shard_chain if chain > 1 \
                else trainer.shard_batch
        self.state = trainer.fit(
            self.state,
            train_set.train_iter(batch_size, window=chain,
                                 device_put_fn=put_fn),
            total_steps=total_steps, val_iter_fn=val_iter_fn,
            val_every=val_every, early_stop_patience=early_stop_patience)
        return self.state

    # ------------------------------------------------------------ inspect

    def count_params(self) -> int:
        """Total trainable parameter count (builds if needed)."""
        self.build()
        return int(sum(np.prod(p.shape) for b in self.state.params.values()
                       for p in b.values()))

    _flops_cache: dict | None = None

    def forward_flops(self, batch_size: int = 1) -> float | None:
        """Per-image forward FLOPs from the XLA cost analysis (None when
        the backend does not expose it).  Cached per batch size — the
        compile is the cost, and parameter shapes are fixed."""
        if self._flops_cache is None:
            self._flops_cache = {}
        if batch_size in self._flops_cache:
            return self._flops_cache[batch_size]
        self.build()
        from myconvnet_tpu.utils.mfu import compiled_flops
        x = jnp.zeros((batch_size, *self.input_shape),
                      self.policy.compute_dtype)
        # tracing errors are real model bugs and must propagate; only a
        # missing cost analysis degrades to None
        lowered = jax.jit(
            lambda p, s, x: self._transformed.apply(p, s, None, x,
                                                    False)[0]
        ).lower(self.state.params, self.state.model_state, x)
        try:
            flops = compiled_flops(lowered.compile())
        except Exception:
            flops = None
        out = flops / batch_size if flops else None
        self._flops_cache[batch_size] = out
        return out

    def summary(self, depth: int = 1, print_fn=print) -> str:
        """Per-scope parameter table (the era's model-summary habit).

        ``depth``: how many scope-path segments to group by (1 = top
        level: stem/stage1/.../logits).
        """
        self.build()
        groups: dict[str, tuple[int, list]] = {}
        order: list[str] = []
        for scope_name, entries in self.state.params.items():
            key = "/".join(scope_name.split("/")[:depth])
            n = sum(int(np.prod(p.shape)) for p in entries.values())
            if key not in groups:
                groups[key] = (0, [])
                order.append(key)
            tot, shapes = groups[key]
            groups[key] = (tot + n,
                           shapes + [tuple(p.shape)
                                     for p in entries.values()])
        state_n = sum(int(np.prod(p.shape))
                      for b in self.state.model_state.values()
                      for p in b.values())
        width = max([len(k) for k in order] + [10]) + 2
        lines = [f"{'scope':<{width}}{'params':>12}  largest shape",
                 "-" * (width + 30)]
        for k in order:
            tot, shapes = groups[k]
            big = max(shapes, key=np.prod) if shapes else ()
            lines.append(f"{k:<{width}}{tot:>12,}  {big}")
        lines.append("-" * (width + 30))
        lines.append(f"{'total':<{width}}{self.count_params():>12,}")
        if state_n:
            lines.append(f"{'(state: BN stats etc.)':<{width}}"
                         f"{state_n:>12,}")
        flops = self.forward_flops()
        if flops:
            lines.append(f"{'forward GFLOPs/img':<{width}}"
                         f"{flops / 1e9:>12.2f}")
        text = "\n".join(lines)
        if print_fn:
            print_fn(text)
        return text

    # ------------------------------------------------------------ predict

    def predict(self, images, batch_size: int = 256,
                tta: str | None = None) -> np.ndarray:
        """Batched inference -> logits ndarray (reference
        ConvNet.predict).

        tta: None (plain), 'flip' (average over horizontal mirror) or
        'ten_crop' (4 corners + center, each mirrored — the classic
        AlexNet/VGG eval protocol).  Under TTA the returned array holds
        log of the view-averaged softmax (same argmax semantics).
        Image-output nets (augment_fns recipes, e.g. super-resolution)
        instead average PREDICTED IMAGES over inverse-transformed views:
        'flip' (x2) or 'x8' (4 rotations x mirror — EDSR's geometric
        self-ensemble).
        """
        self.build()
        trainer = self._trainer or self._make_trainer(None)
        self._trainer = trainer
        images = np.asarray(images)
        step = None
        if tta is not None:
            step = self._tta_step(tta)
        outs = []
        n = len(images)
        # pad the tail batch to keep shapes static (single compile)
        for i in range(0, n, batch_size):
            chunk = images[i:i + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]),
                                     chunk.dtype)])
            if step is not None:
                logits = np.asarray(step(self.state, jnp.asarray(chunk)))
            else:
                logits = next(iter(trainer.predict(self.state,
                                                   [(chunk,)])))
            outs.append(logits[:len(images[i:i + batch_size])])
        return np.concatenate(outs)

    def _tta_step(self, mode: str):
        """Jitted TTA inference step (cached per mode): build all views
        on-device, run the forward over them with lax.map (one compile,
        batch-sized working set), average the probabilities."""
        cache = getattr(self, "_tta_cache", None)
        if cache is None:
            cache = self._tta_cache = {}
        if mode in cache:
            return cache[mode]
        if mode not in ("flip", "x8", "ten_crop"):
            raise ValueError(f"unknown tta mode {mode!r}")
        if self.augment_fns is not None:
            # image-output nets (super-resolution): geometric
            # self-ensemble in OUTPUT space — transform the input,
            # invert the transform on the prediction, average images
            # (EDSR's eval protocol).  Softmax averaging over logits
            # would be meaningless here.
            if mode == "ten_crop":
                raise ValueError("ten_crop TTA is a classification "
                                 "protocol; image-output nets support "
                                 "'flip' (x2) or 'x8' self-ensemble")
            model = self._transformed
            predict_fn = self.augment_fns[2]

            def step(state, x):
                xin = predict_fn(x)

                def fwd(v):
                    out, _ = model.apply(state.params, state.model_state,
                                         None, v, False)
                    return out.astype(jnp.float32)

                outs = [fwd(xin), fwd(xin[:, :, ::-1])[:, :, ::-1]]
                if mode == "x8":
                    for k in (1, 2, 3):
                        r = jnp.rot90(xin, k, axes=(1, 2))
                        outs.append(jnp.rot90(fwd(r), -k, axes=(1, 2)))
                        rf = r[:, :, ::-1]
                        outs.append(jnp.rot90(fwd(rf)[:, :, ::-1], -k,
                                              axes=(1, 2)))
                return sum(outs) / len(outs)

            cache[mode] = jax.jit(step)
            return cache[mode]
        if mode == "x8":
            raise ValueError("x8 self-ensemble is an image-output "
                             "protocol (super-resolution); classifiers "
                             "support 'flip' or 'ten_crop'")
        if mode == "ten_crop" and self.augment is None:
            raise ValueError("ten_crop TTA needs an augment config "
                             "(raw-image inputs)")
        model, cfg = self._transformed, self.augment
        from myconvnet_tpu.data.augment import batched_crop_resize, \
            normalize

        def views_fn(x):
            if cfg is None:  # pre-processed float inputs: mirror only
                return jnp.stack([x, x[:, :, ::-1, :]])
            if mode == "flip":
                v = augment_eval(x, cfg)
                return jnp.stack([v, v[:, :, ::-1, :]])
            n, h, w, _ = x.shape
            side = 0.875 * min(h, w)
            ys = (0.0, h - side, (h - side) / 2.0)
            xs = (0.0, w - side, (w - side) / 2.0)
            views = []
            for by, bx in ((0, 0), (0, 1), (1, 0), (1, 1), (2, 2)):
                box = jnp.asarray([ys[by], xs[bx], side, side],
                                  jnp.float32)
                v = batched_crop_resize(
                    x, jnp.broadcast_to(box[None], (n, 4)), cfg.out_hw)
                v = normalize(v * (1.0 / 255.0), cfg.mean,
                              cfg.std).astype(cfg.out_dtype)
                views.append(v)
                views.append(v[:, :, ::-1, :])
            return jnp.stack(views)

        def step(state, x):
            views = views_fn(x)

            def fwd(v):
                logits, _ = model.apply(state.params, state.model_state,
                                        None, v, False)
                return jax.nn.softmax(logits.astype(jnp.float32))

            probs = jax.lax.map(fwd, views)
            return jnp.log(jnp.mean(probs, axis=0) + 1e-12)

        cache[mode] = jax.jit(step)
        return cache[mode]

    def predict_segmentation(self, images, *, scales=(1.0,),
                             flip: bool = False,
                             tile_hw: tuple[int, int] | None = None,
                             batch_size: int = 16) -> np.ndarray:
        """Per-pixel class map [N, H, W] with the DeepLab eval protocol:
        probability averaging over ``scales`` (and mirrors when
        ``flip``), or an overlapping sliding window when ``tile_hw`` is
        given (for frames larger than the training crop).

        Input images are raw uint8/float frames; normalization uses the
        net's augment config when present (mean/std only — geometry is
        handled by the protocol itself).
        """
        from myconvnet_tpu.data.augment import normalize
        from myconvnet_tpu.eval.seg_inference import (multiscale_logits,
                                                      sliding_window_logits)
        self.build()
        images = np.asarray(images)
        model, state, cfg = self._transformed, self.state, self.augment

        # cache the jitted forward across calls (per-batch closures would
        # re-trace the whole model each predict_segmentation call); pass
        # params/state as arguments so later restores don't stale it
        if getattr(self, "_seg_forward", None) is None:
            @jax.jit
            def _seg_fwd(params, mstate, x):
                logits, _ = model.apply(params, mstate, None, x, False)
                return logits

            self._seg_forward = _seg_fwd

        def forward(x):
            if self.mesh is not None:
                # eval-path sharding parity with training: spatial mode
                # shards image rows over the model axis too (the 513x513
                # inference case this path exists for)
                sh = (mesh_lib.spatial_input_sharding(self.mesh)
                      if self.spatial
                      else mesh_lib.batch_sharding(self.mesh))
                x = jax.device_put(x, sh)
            return self._seg_forward(state.params, state.model_state, x)

        outs = []
        for i in range(0, len(images), batch_size):
            chunk = images[i:i + batch_size].astype(np.float32)
            if images.dtype == np.uint8:
                chunk = chunk * (1.0 / 255.0)
            x = jnp.asarray(chunk)
            if cfg is not None:
                x = normalize(x, cfg.mean, cfg.std)
            if tile_hw is not None:
                logits = sliding_window_logits(forward, np.asarray(x),
                                               tile_hw)
                pred = np.argmax(logits, -1)
            else:
                lp = multiscale_logits(forward, x, scales=scales,
                                       flip=flip)
                pred = np.asarray(jnp.argmax(lp, -1))
            outs.append(pred)
        return np.concatenate(outs)

    def features(self, images, batch_size: int = 256,
                 tag: str = "features") -> np.ndarray:
        """Tagged backbone feature maps (transfer learning / retrieval).

        Zoo backbones tag their pre-pooling map as 'features'; models
        can tag more via ``nn.tag_intermediate``.
        """
        from myconvnet_tpu.core.module import collecting
        self.build()
        model, state = self._transformed, self.state
        images = np.asarray(images)

        @jax.jit
        def feats_fn(params, mstate, x):
            with collecting() as c:
                model.apply(params, mstate, None, x, False)
            matches = [k for k in c
                       if k.endswith("/" + tag) or k == tag]
            if not matches:
                raise ValueError(f"no intermediate tagged {tag!r}; "
                                 f"found {sorted(c)}")
            return c[matches[-1]]

        outs = []
        for i in range(0, len(images), batch_size):
            chunk = images[i:i + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]),
                                     chunk.dtype)])
            f = np.asarray(feats_fn(state.params, state.model_state,
                                    jnp.asarray(chunk)))
            outs.append(f[:len(images[i:i + batch_size])])
        return np.concatenate(outs)

    def evaluate(self, data_set: DataSet, evaluator: Evaluator | None = None,
                 batch_size: int = 256) -> float:
        self.build()
        evaluator = evaluator or AccuracyEvaluator()
        if self._trainer is None:
            self._trainer = self._make_trainer(evaluator)
        # the jitted eval step is evaluator-independent: swap in place to
        # reuse the compiled program across evaluate() calls
        self._trainer.evaluator = evaluator
        return self._trainer.evaluate(self.state,
                                      data_set.eval_iter(batch_size))

    # --------------------------------------------------------------- ckpt

    def save(self, path: str | None = None) -> str:
        from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
        assert self.state is not None, "nothing to save; call build/train"
        directory = path or self.ckpt_dir
        assert directory, "no checkpoint directory given"
        return ckpt_lib.save_checkpoint(directory, int(self.state.step),
                                        self.state._asdict())

    def restore(self, path: str | None = None) -> "ConvNet":
        from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
        self.build()
        directory = path or self.ckpt_dir
        restored = ckpt_lib.restore_checkpoint(directory,
                                               self.state._asdict())
        self.state = TrainState(**restored)
        return self

    def close(self):  # reference-API parity (Session.close analogue)
        self.state = None
        self._trainer = None
        self._seg_forward = None
        self._tta_cache = {}
