"""Training driver: the rebuild of the reference's ``Optimizer`` class.

The reference's driver (SURVEY.md §2#6, §3.1) owns the epoch/step loop,
calls ``Session.run(train_op)`` per step, updates the LR schedule,
validates periodically, keeps the best checkpoint and early-stops.

TPU-native shape of the same capability:

* ONE jitted ``train_step``: on-device augmentation + forward + backward +
  optimizer update + BN-stat update in a single XLA program.  The LR
  schedule is evaluated *inside* the program from the step counter — the
  driver never touches device state between steps.
* GSPMD data parallelism: the batch is sharded over the mesh's ``data``
  axis, params replicated (or model-axis sharded when wide enough);
  XLA inserts the gradient all-reduce over ICI.  This subsumes the
  reference's multi-GPU towers (§2#12) and comm backend (§2#13).
* The step loop never blocks on device results: metrics are fetched with
  a 1-step lag so host logging overlaps device compute.
* Validation runs a jitted eval_step over the val set; best-checkpoint
  retention and early stopping mirror the reference's Evaluator-driven
  policy.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
from myconvnet_tpu.core.module import Transformed
from myconvnet_tpu.eval.evaluators import Evaluator
from myconvnet_tpu.parallel import mesh as mesh_lib
from myconvnet_tpu.train.optim import Optimizer
from myconvnet_tpu.utils import logging as log_lib


class TrainState(NamedTuple):
    """Full training state (one pytree — checkpoint unit, SURVEY §5)."""
    params: Any
    model_state: Any     # BN moving statistics etc.
    opt_state: Any
    step: jax.Array      # int32 scalar
    rng: jax.Array       # PRNG key data (uint32), np-serializable


def init_train_state(model: Transformed, optimizer: Optimizer,
                     rng: jax.Array, sample_input: jax.Array) -> TrainState:
    params, model_state = model.init(rng, sample_input, True)
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.key_data(rng),
    )


@dataclass
class Trainer:
    """Drives training of a transformed model (forward: fn(x, train))."""

    model: Transformed
    optimizer: Optimizer
    loss_fn: Callable[..., jax.Array]  # (logits, labels) -> scalar
    mesh: Any = None                   # jax.sharding.Mesh or None
    # batch-level augmentation hooks: (key, x, y) -> (x, y) so paired
    # transforms (segmentation masks) share the random geometry
    augment_fn: Callable | None = None
    eval_augment_fn: Callable | None = None   # (x, y) -> (x, y)
    predict_augment_fn: Callable | None = None  # (x) -> x (inference)
    evaluator: Evaluator | None = None
    ckpt_dir: str | None = None
    keep_checkpoints: int = 3
    log_every: int = 50
    logger: Any = None
    # rematerialize the forward in backward (jax.checkpoint): cuts stored
    # activations to ~inputs-only at ~1.3x FLOPs — the TPU lever for big
    # batches and 513x513 segmentation where HBM, not MXU, is scarce
    remat: bool = False
    # gradient accumulation: split each batch into this many microbatches
    # and lax.scan fwd+bwd over them before ONE optimizer update — the
    # other HBM lever (activation memory scales with the microbatch, the
    # update sees the full-batch average gradient). BN statistics update
    # sequentially per microbatch, matching the semantics of running the
    # microbatches as separate steps.
    accum_steps: int = 1
    # dtype of the accumulated-gradient carry. f32 (default) is the
    # safe standard; "bfloat16" halves the accumulator's HBM traffic
    # (the carry is read+written once per microbatch — ~1.2 GB/step for
    # ResNet-50 at accum 6), at ~3 fewer mantissa digits on the summed
    # gradient. Measured effect on the bench step + a trajectory-delta
    # test gate the option; it is opt-in, never a silent default.
    accum_dtype: str = "float32"
    # debug sanitizer (SURVEY §5): check the post-step state for NaN/inf
    # on-device and raise a named NonFiniteError host-side. One fused
    # reduction per tensor — a debug switch, not a production default.
    debug_checks: bool = False
    # False for tasks whose train-mode output is not class logits
    # (triplet embeddings): suppresses the argmax train-accuracy column
    accuracy_metric: bool = True
    # spatial partitioning (needs mesh): shard image rows over the model
    # axis in addition to batch over data — XLA's SPMD partitioner
    # inserts the conv halo exchanges (parallel/mesh.py
    # spatial_input_sharding). The HBM lever for 513x513 segmentation.
    spatial: bool = False
    # ZeRO-style optimizer-state sharding (needs mesh): moments and
    # accumulators shard over the data axis (parallel/mesh.py
    # zero_state_sharding) so per-chip optimizer memory drops by the dp
    # degree; params stay replicated and GSPMD inserts the gathers.
    # Numerics are identical to unsharded training (tested).
    zero_sharding: bool = False
    # sharpness-aware minimization (Foret et al.): rho > 0 takes the
    # descent gradient at the l2-worst-case point within radius rho
    # (2x compute per step, both passes in one XLA program)
    sam_rho: float = 0.0
    # dispatch chaining (the steps-per-loop idiom): run this many train
    # steps inside ONE jitted program — lax.scan over a [K, B, ...]
    # window the data pipeline stages BEFORE the prefetch transfer.
    # Measured honestly on this chip: per-dispatch overhead is ~0 with
    # device-resident data (async dispatch pipelines), so this is NOT a
    # raw-throughput lever there; its value is bounding HOST work to one
    # Python iteration + one transfer per K steps — relevant when the
    # host is weak (1-core CI: input_wait_frac 0.54 -> ~0 measured at
    # K=16 on the audio recipe) or when per-step host jitter must not
    # reach the device (pods).  Semantics match chain_steps=1 (same
    # train_step body, same per-step RNG folds, sequential BN updates;
    # trajectory-parity tested); validation/logging/preemption/plateau
    # act at window boundaries, so chain_steps must divide val_every.
    # Costs K batches of HBM staging; incompatible with spatial=True.
    chain_steps: int = 1
    # evaluate/predict with the Polyak-averaged parameters when the
    # optimizer is wrapped with optim.with_ema (no-op otherwise)
    eval_with_ema: bool = False
    # reduce-on-plateau LR decay (reference driver: decay LR when the
    # validation score stops improving). Requires the optimizer to be
    # wrapped with optim.with_plateau; the host rewrites the scale leaf
    # between steps — no recompile. factor=0 disables.
    plateau_factor: float = 0.0
    plateau_patience: int = 0
    min_lr_scale: float = 1e-4
    # write checkpoints on a background thread (device->host readback of
    # the full state can take seconds on slow links; jax arrays are
    # immutable, so a snapshot taken while training continues is safe)
    async_checkpoints: bool = True
    # graceful preemption (utils/preemption.py): when the guard trips,
    # fit() stops dispatching, saves the full state and returns — pair
    # with train.py --max_restarts for exact resume after SIGTERM
    preemption_guard: Any = None

    _train_step: Callable = field(init=False, default=None)
    _eval_step: Callable = field(init=False, default=None)

    def __post_init__(self):
        if self.logger is None:
            self.logger = log_lib.MetricLogger()
        self._build_steps()

    # ------------------------------------------------------------ compile

    def _build_steps(self):
        model, optimizer = self.model, self.optimizer
        loss_fn, augment_fn = self.loss_fn, self.augment_fn
        eval_augment_fn = self.eval_augment_fn

        def loss_and_state(params, model_state, key, x, y):
            apply = model.apply
            if self.remat:
                apply = jax.checkpoint(
                    lambda p, s, k, x: model.apply(p, s, k, x, True))
                logits, new_state = apply(params, model_state, key, x)
            else:
                logits, new_state = apply(params, model_state, key, x,
                                          True)
            loss = loss_fn(logits, y)
            return loss, (new_state, logits)

        accum = max(int(self.accum_steps), 1)
        zero_rule = (mesh_lib.zero_state_sharding(self.mesh)
                     if self.zero_sharding and self.mesh is not None
                     else None)
        sam_rho = float(self.sam_rho)

        base_grad_fn = jax.value_and_grad(loss_and_state, has_aux=True)
        if sam_rho > 0.0:
            # Sharpness-aware minimization (Foret et al.): ascend to the
            # worst-case point within an l2 ball of radius rho, take the
            # descent gradient THERE.  Both passes live in the same XLA
            # program (2x compute); with accumulation this is per-
            # microbatch m-SAM.  BN statistics come from the second
            # (perturbed) pass — the standard implementation choice.
            def grad_fn(params, mstate, key, x, y):
                _, g1 = base_grad_fn(params, mstate, key, x, y)
                gn = jnp.sqrt(sum(jnp.sum(
                    jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree.leaves(g1)))
                scale = sam_rho / jnp.maximum(gn, 1e-12)
                perturbed = jax.tree.map(
                    lambda p, g: (p.astype(jnp.float32)
                                  + scale * g.astype(jnp.float32))
                    .astype(p.dtype), params, g1)
                return base_grad_fn(perturbed, mstate, key, x, y)
        else:
            grad_fn = base_grad_fn

        def train_step(state: TrainState, batch) -> tuple[TrainState, dict]:
            x, y = batch
            base = jax.random.wrap_key_data(state.rng)
            key = jax.random.fold_in(base, state.step)
            k_aug, k_model = jax.random.split(key)
            if augment_fn is not None:
                x, y = augment_fn(k_aug, x, y)
            if accum == 1:
                (loss, (new_mstate, logits)), grads = grad_fn(
                    state.params, state.model_state, k_model, x, y)
            else:
                # microbatch scan: grads accumulate in f32, BN stats
                # thread through the carry; activation memory is 1/accum
                n = x.shape[0]
                assert n % accum == 0, (n, accum)
                xm = x.reshape(accum, n // accum, *x.shape[1:])
                ym = y.reshape(accum, n // accum, *y.shape[1:])
                keys = jax.random.split(k_model, accum)

                acc_dt = jnp.dtype(self.accum_dtype)

                def micro(carry, xyk):
                    mstate, gacc, lacc = carry
                    xi, yi, ki = xyk
                    (l, (mstate, logits)), g = grad_fn(
                        state.params, mstate, ki, xi, yi)
                    gacc = jax.tree.map(
                        lambda a, b: a + b.astype(acc_dt), gacc, g)
                    return (mstate, gacc, lacc + l), logits

                zeros = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, acc_dt),
                    state.params)
                (new_mstate, gsum, lsum), logits_m = jax.lax.scan(
                    micro, (state.model_state, zeros, 0.0),
                    (xm, ym, keys))
                grads = jax.tree.map(lambda g: g / accum, gsum)
                loss = lsum / accum
                logits = logits_m.reshape(n, *logits_m.shape[2:])
            new_params, new_opt = optimizer.update(
                grads, state.opt_state, state.params, state.step)
            if zero_rule is not None:
                # keep the optimizer state sharded across steps (the
                # constraint pins what input-sharding propagation
                # usually infers, so the memory saving is guaranteed)
                new_opt = jax.tree.map(
                    lambda t: jax.lax.with_sharding_constraint(
                        t, zero_rule(t)), new_opt)
            metrics = {"loss": loss}
            if not self.accuracy_metric:
                pass
            elif logits.ndim == y.ndim + 1:  # per-example/pixel class labels
                metrics["accuracy"] = jnp.mean(
                    (jnp.argmax(logits, -1) == y).astype(jnp.float32))
            elif logits.ndim == 2 and y.ndim == 2 \
                    and y.dtype in (jnp.float32, jnp.bfloat16):
                # soft labels (MixUp/CutMix, [N, C]): agreement with the
                # dominant mix component.  Dense-regression targets
                # (super-resolution [N, H, W, C]) get no accuracy column
                metrics["accuracy"] = jnp.mean(
                    (jnp.argmax(logits, -1) == jnp.argmax(y, -1))
                    .astype(jnp.float32))
            return TrainState(new_params, new_mstate, new_opt,
                              state.step + 1, state.rng), metrics

        def eval_step(state: TrainState, batch):
            x, y = batch
            if eval_augment_fn is not None:
                x, y = eval_augment_fn(x, y)
            logits, _ = model.apply(state.params, state.model_state, None,
                                    x, False)
            return logits, y

        predict_augment_fn = self.predict_augment_fn
        if predict_augment_fn is None and eval_augment_fn is not None:
            # default: run the eval transform with dummy int labels and
            # keep only x (correct for label-independent transforms;
            # paired/segmentation recipes set predict_augment_fn
            # explicitly to an image-only transform)
            def predict_augment_fn(x, _fn=eval_augment_fn):
                dummy = jnp.zeros((x.shape[0],), jnp.int32)
                return _fn(x, dummy)[0]

        def predict_step(state: TrainState, x):
            if predict_augment_fn is not None:
                x = predict_augment_fn(x)
            logits, _ = model.apply(state.params, state.model_state, None,
                                    x, False)
            return logits

        # GSPMD propagates from sharded inputs in both layouts.
        self._zero_rule = zero_rule
        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        if self.debug_checks:
            from myconvnet_tpu.utils.debugging import nan_guard
            self._train_step = nan_guard(self._train_step)
        if int(self.chain_steps) > 1:
            if self.spatial:
                raise ValueError("chain_steps > 1 is incompatible with "
                                 "spatial=True (stacked batches carry "
                                 "the window axis in front of the rows)")

            def chain_step(state: TrainState, batches):
                """K steps in one program: scan train_step over batches
                stacked on a leading window axis [K, B, ...].  Returns
                the final state and the [K]-stacked metrics."""
                return jax.lax.scan(train_step, state, batches)

            # one compiled program per distinct window length (the full
            # chain_steps plus at most a few boundary remainders)
            self._chain_step = jax.jit(chain_step, donate_argnums=(0,))
            if self.debug_checks:
                # the sanitizer must cover the chained path too (it
                # checks the post-dispatch state, so the same wrapper
                # applies)
                from myconvnet_tpu.utils.debugging import nan_guard
                self._chain_step = nan_guard(self._chain_step)
        else:
            self._chain_step = None
        self._eval_step = jax.jit(eval_step)
        self._predict_step = jax.jit(predict_step)

    # ------------------------------------------------------------- running

    def shard_batch(self, batch):
        if self.mesh is None:
            return batch
        if self.spatial:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sp = mesh_lib.spatial_input_sharding(self.mesh)
            dp = NamedSharding(self.mesh, P(mesh_lib.DATA_AXIS))

            def put(x):
                # spatial tensors ([N,H,...]) shard rows too; vectors
                # (labels) shard batch only
                return jax.device_put(x, sp if jnp.ndim(x) >= 3 else dp)

            return jax.tree.map(put, batch)
        return mesh_lib.shard_batch(self.mesh, batch)

    def shard_chain(self, batch):
        """Place a window-stacked batch [K, B, ...]: the window axis is
        scanned sequentially (replicated), the batch axis shards over
        data — each chip holds [K, B/dp, ...] of the staged window."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, mesh_lib.DATA_AXIS))
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    def fit(self, state: TrainState, train_iter: Iterable, *,
            total_steps: int, val_iter_fn: Callable[[], Iterable]
            | None = None, val_every: int = 0,
            early_stop_patience: int = 0) -> TrainState:
        """Run the step loop; returns the final state.

        ``train_iter`` yields (x, y) host batches.  ``val_iter_fn`` is a
        callable returning a fresh validation iterator (epoch-style).
        """
        best = self.evaluator.worst_score() if self.evaluator else None
        bad_rounds = 0
        plateau_bad = 0
        if self.plateau_factor and self.plateau_patience:
            # fail fast: a missing with_plateau wrapper would otherwise
            # only surface hours in, at the first plateau
            from myconvnet_tpu.train.optim import plateau_scale
            plateau_scale(state.opt_state)
        if self._zero_rule is not None:
            # initial ZeRO placement: each chip holds only its shard of
            # the moments from step 0 (restores included — the npz
            # checkpoint is host-global, this re-places it)
            state = state._replace(opt_state=jax.tree.map(
                lambda t: jax.device_put(t, self._zero_rule(t)),
                state.opt_state))
        # pending: (end_step, start_step, metrics) fetched with a lag of
        # one dispatch so host logging overlaps device compute
        pending = None
        t0 = time.perf_counter()
        window = 0
        input_wait = 0.0  # host time blocked on the data iterator
        # host-side step mirror: int(state.step) per iteration would sync
        # the host to every device step and kill async dispatch; read the
        # device counter once (resume support) and count locally after.
        step_idx = int(state.step)
        chain = max(int(self.chain_steps), 1)
        if chain > 1 and val_every and val_every % chain != 0:
            raise ValueError(
                f"chain_steps={chain} must divide val_every={val_every} "
                f"(windows are staged before dispatch and cannot be "
                f"split at a validation boundary)")

        it = iter(train_iter)
        while True:
            if step_idx >= total_steps:
                break
            if self.preemption_guard is not None \
                    and self.preemption_guard.preempted:
                self.logger.log(step_idx, {"preempted": 1.0})
                break
            t_in = time.perf_counter()
            try:
                item = next(it)
            except StopIteration:
                break
            input_wait += time.perf_counter() - t_in
            if self.preemption_guard is not None \
                    and self.preemption_guard.preempted:
                # the signal landed while we were blocked on the data
                # iterator: do NOT dispatch new device work inside the
                # grace window — checkpoint what already finished
                self.logger.log(step_idx, {"preempted": 1.0})
                break
            if chain > 1:
                # item is a staged window [K, B, ...] (DataSet.train_iter
                # window=chain stacks BEFORE the prefetch transfer)
                x = item[0]
                k = int(x.shape[0])
                if k > chain:
                    raise ValueError(
                        f"chain_steps={chain} but the iterator yielded "
                        f"an item with leading axis {k} — pass "
                        f"DataSet.train_iter(..., window=chain_steps) "
                        f"(a plain batch iterator would be misread as "
                        f"a window of single examples)")
                left = total_steps - step_idx
                if k > left:  # terminal partial window (device slice)
                    item = jax.tree.map(lambda a: a[:left], item)
                    k = left
                state, ms = self._chain_step(
                    state, self.shard_chain(item))
                # last step's metrics (async device slice — no fetch)
                metrics = jax.tree.map(lambda a: a[-1], ms)
                n_imgs = k * int(x.shape[1])
            else:
                x, y = item
                batch = self.shard_batch((x, y))
                state, metrics = self._train_step(state, batch)
                k, n_imgs = 1, int(x.shape[0])
            prev_step = step_idx
            step_idx += k
            window += n_imgs
            if pending is not None and (
                    pending[0] // self.log_every
                    > pending[1] // self.log_every):
                self._log_train(pending[0], pending[2], window, t0,
                                input_wait)
                window, t0, input_wait = 0, time.perf_counter(), 0.0
            pending = (step_idx, prev_step, metrics)

            # boundary-crossing form (== `% val_every == 0` for k=1):
            # a resume from a truncation-misaligned step (chain mode's
            # terminal partial window) must not silently disable
            # validation/best-ckpt/early-stop for the rest of the run
            if (val_every
                    and step_idx // val_every > prev_step // val_every
                    and val_iter_fn is not None and self.evaluator):
                score = self.evaluate(state, val_iter_fn())
                self.logger.log(step_idx,
                                {f"val_{self.evaluator.name}": score})
                improved = self.evaluator.is_better(score, best)
                if improved:
                    best, bad_rounds, plateau_bad = score, 0, 0
                else:
                    bad_rounds += 1
                    plateau_bad += 1
                if (self.plateau_factor and self.plateau_patience
                        and plateau_bad >= self.plateau_patience):
                    from myconvnet_tpu.train.optim import (plateau_scale,
                                                           set_plateau_scale)
                    new_scale = max(
                        plateau_scale(state.opt_state) * self.plateau_factor,
                        self.min_lr_scale)
                    state = state._replace(opt_state=set_plateau_scale(
                        state.opt_state, new_scale))
                    self.logger.log(step_idx, {"lr_scale": new_scale})
                    plateau_bad = 0
                if self.ckpt_dir:
                    self.save(state, metric=score, is_best=improved)
                if early_stop_patience and bad_rounds >= early_stop_patience:
                    self.logger.log(step_idx, {"early_stop": 1.0})
                    break
        if pending is not None:
            self._log_train(pending[0], pending[2], window, t0, input_wait)
        if self.ckpt_dir:
            # always persist the final state (validation-cadence saves may
            # predate the last steps)
            self.save(state)
        self.wait_for_saves()
        if hasattr(train_iter, "close"):
            train_iter.close()  # release a prefetcher worker thread
        return state

    def _log_train(self, step, metrics, window, t0, input_wait=0.0):
        host = {k: float(v) for k, v in metrics.items()}
        dt = time.perf_counter() - t0
        if window and dt > 0:
            host["images_per_sec"] = window / dt
            # fraction of wall time the host sat waiting on input — the
            # north-star "input-bound stall" indicator (target ~0)
            host["input_wait_frac"] = input_wait / dt
            if self._step_flops:
                from myconvnet_tpu.utils.mfu import device_peak_flops
                n_dev = (self.mesh.size if self.mesh is not None
                         else 1)
                host["mfu"] = (self._step_flops * (window / dt) /
                               self._flops_batch /
                               (device_peak_flops() * n_dev))
        self.logger.log(step, host)

    _step_flops: float | None = None
    _flops_batch: int = 1

    def measure_flops(self, state: TrainState, sample_batch) -> float | None:
        """Record the compiled step's FLOPs (XLA cost analysis) so
        subsequent logs include an MFU column (north-star observability).
        """
        from myconvnet_tpu.utils.mfu import compiled_flops
        try:
            batch = self.shard_batch(sample_batch)
            compiled = self._train_step.lower(state, batch).compile()
            flops = compiled_flops(compiled)
        except Exception:
            return None
        if flops:
            self._step_flops = flops
            self._flops_batch = int(sample_batch[0].shape[0])
        return flops

    def _eval_state(self, state: TrainState) -> TrainState:
        if not self.eval_with_ema:
            return state
        from myconvnet_tpu.train.optim import EmaOptState, extract_ema
        if not isinstance(state.opt_state, EmaOptState):
            return state
        ema = extract_ema(state.opt_state)
        params = jax.tree.map(lambda p, e: e.astype(p.dtype),
                              state.params, ema)
        return state._replace(params=params)

    def evaluate(self, state: TrainState, data_iter: Iterable) -> float:
        assert self.evaluator is not None, "no evaluator configured"
        state = self._eval_state(state)
        self.evaluator.reset()
        full_batch = None
        for x, y in data_iter:
            x = jnp.asarray(x)
            y = jnp.asarray(y)
            n = x.shape[0]
            if full_batch is None:
                full_batch = n
            if n < full_batch:
                # pad the tail batch to the compiled shape, slice after —
                # keeps one compile AND counts every example
                pad = full_batch - n
                x = jnp.concatenate(
                    [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)])
                y = jnp.concatenate(
                    [y, jnp.zeros((pad, *y.shape[1:]), y.dtype)])
            logits, labels = self._eval_step(state,
                                             self.shard_batch((x, y)))
            self.evaluator.update(logits[:n], labels[:n])
        return self.evaluator.score()

    def predict(self, state: TrainState, data_iter: Iterable):
        """Yield per-batch predictions (reference ConvNet.predict).

        Goes through :meth:`shard_batch` so ``spatial=True`` inference
        shards image rows exactly like training (the 513x513 case)."""
        state = self._eval_state(state)
        for batch in data_iter:
            x = batch[0] if isinstance(batch, tuple) else batch
            if self.mesh is not None:
                x = self.shard_batch((x,))[0]
            yield jax.device_get(self._predict_step(state, x))

    # -------------------------------------------------------- checkpointing

    _checkpointer: Any = None

    def save(self, state: TrainState, metric: float | None = None,
             is_best: bool = False) -> str:
        """Synchronous or background save; async rides the shared
        ckpt.AsyncCheckpointer (one write in flight, synchronous
        device->host snapshot — the next train_step donates the state's
        buffers — and write failures re-raised on the next save/wait
        instead of dying silently in the daemon thread)."""
        assert self.ckpt_dir
        step = int(state.step)
        if not self.async_checkpoints:
            return ckpt_lib.save_checkpoint(
                self.ckpt_dir, step, state._asdict(),
                keep=self.keep_checkpoints, metric=metric, is_best=is_best)
        if self._checkpointer is None:
            self._checkpointer = ckpt_lib.AsyncCheckpointer()
        self._checkpointer.save(self.ckpt_dir, step, state._asdict(),
                                keep=self.keep_checkpoints, metric=metric,
                                is_best=is_best)
        import os
        return os.path.join(self.ckpt_dir, f"ckpt-{step}.npz")

    def wait_for_saves(self) -> None:
        if self._checkpointer is not None:
            self._checkpointer.wait()

    def restore(self, state_template: TrainState,
                path: str | None = None) -> TrainState:
        self.wait_for_saves()
        assert self.ckpt_dir or path
        target = state_template._asdict()
        restored = ckpt_lib.restore_checkpoint(path or self.ckpt_dir, target)
        return TrainState(**restored)
