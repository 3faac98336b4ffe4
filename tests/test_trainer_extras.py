"""Trainer extras: remat equivalence, MFU counter, stall detector."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.train import optim
from myconvnet_tpu.train.losses import softmax_cross_entropy
from myconvnet_tpu.train.trainer import Trainer, init_train_state
from myconvnet_tpu.utils.profiling import StallDetector


def _setup(remat):
    model = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    opt = optim.sgd(0.1)
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy, remat=remat)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((8, 32, 32, 3)))
    return t, state


def test_remat_matches_plain():
    """jax.checkpoint must not change the math, only the memory plan."""
    x = np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32)
    y = np.arange(8) % 10
    t1, s1 = _setup(False)
    t2, s2 = _setup(True)
    s1b, m1 = t1._train_step(s1, (jnp.asarray(x), jnp.asarray(y)))
    s2b, m2 = t2._train_step(s2, (jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for scope in s1b.params:
        for name in s1b.params[scope]:
            np.testing.assert_allclose(s1b.params[scope][name],
                                       s2b.params[scope][name], rtol=1e-5,
                                       atol=1e-6)


def test_measure_flops_enables_mfu_logging():
    t, state = _setup(False)
    x = jnp.zeros((8, 32, 32, 3))
    y = jnp.zeros((8,), jnp.int32)
    flops = t.measure_flops(state, (x, y))
    assert flops is None or flops > 1e6  # cost analysis may be absent
    if flops:
        assert t._step_flops == flops and t._flops_batch == 8


def test_stall_detector():
    det = StallDetector(device_step_time=0.1)
    import time
    for i in range(3):
        det.host_wait_begin()
        if i == 1:
            time.sleep(0.02)  # 20% of a step -> stall
        det.host_wait_end()
    rep = det.report()
    assert det.stalled_steps == 1
    assert 0 < rep["stall_fraction"] < 1


def test_evaluate_counts_tail_batch():
    """70 examples at batch 32 -> all 70 evaluated (tail padded+sliced)."""
    from myconvnet_tpu.data.pipeline import ArraySource, DataSet
    from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
    t, state = _setup(False)
    t.evaluator = AccuracyEvaluator()
    rng = np.random.RandomState(0)
    imgs = rng.rand(70, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 10, 70).astype(np.int32)
    ds = DataSet(ArraySource(imgs, labels))
    t.evaluate(state, ds.eval_iter(32, prefetch=0))
    assert t.evaluator._total == 70


def test_plot_curves(tmp_path):
    import json
    from myconvnet_tpu.utils.plots import plot_curves, read_metrics
    p = str(tmp_path / "train.jsonl")
    with open(p, "w") as f:
        for s in range(5):
            f.write(json.dumps({"step": s, "time": 0.0,
                                "loss": 2.0 - 0.3 * s,
                                "accuracy": 0.1 * s}) + "\n")
    series = read_metrics(p)
    assert len(series["loss"]) == 5
    out = plot_curves(p)
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_async_checkpoint_save(tmp_path):
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    t, state = _setup(False)
    t.ckpt_dir = str(tmp_path)
    t.async_checkpoints = True
    t.save(state, metric=0.5, is_best=True)
    t.wait_for_saves()
    assert ckpt_lib.latest_checkpoint(str(tmp_path))
    assert ckpt_lib.best_checkpoint(str(tmp_path))
    restored = t.restore(state)
    assert int(restored.step) == int(state.step)


def test_async_save_safe_with_donated_state(tmp_path):
    """Save then immediately train (donating the saved state's buffers):
    the checkpoint must still be complete and correct."""
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    t, state = _setup(False)
    t.ckpt_dir = str(tmp_path)
    x = np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32)
    y = (np.arange(8) % 10).astype(np.int32)
    snap_w = np.asarray(state.params["conv"]["w"])
    t.save(state)                      # async write begins
    state2, _ = t._train_step(state, (jnp.asarray(x), jnp.asarray(y)))
    t.wait_for_saves()
    restored = t.restore(state2)
    np.testing.assert_array_equal(
        np.asarray(restored.params["conv"]["w"]), snap_w)


def test_distributed_helpers_single_process():
    from myconvnet_tpu.parallel import distributed as dist
    dist.initialize()  # no-op single process
    info = dist.process_info()
    assert info["process_index"] == 0 and info["process_count"] == 1
    assert dist.is_primary()


def test_profiling_trace_writes_files(tmp_path):
    import glob
    from myconvnet_tpu.utils import profiling
    with profiling.trace(str(tmp_path)):
        _ = jnp.sum(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    files = glob.glob(str(tmp_path / "**" / "*"), recursive=True)
    assert files, "profiler trace produced no files"


def test_plot_curves_selected_keys(tmp_path):
    import json
    from myconvnet_tpu.utils.plots import plot_curves
    p = str(tmp_path / "m.jsonl")
    with open(p, "w") as f:
        for s in range(3):
            f.write(json.dumps({"step": s, "loss": 1.0, "lr": 0.1}) + "\n")
    out = plot_curves(p, keys=["loss"])
    import os
    assert os.path.exists(out)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no plottable"):
        plot_curves(p, keys=["nonexistent"])


def _setup_accum(accum):
    # BN-free net: microbatch stat updates would legitimately differ;
    # without state the accumulated step must match the full batch
    # exactly (equal-size microbatches average to the same mean loss)
    def fwd(x, train=False):
        from myconvnet_tpu import nn
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.dense(x, 32, name="fc1"))
        return nn.dense(x, 10, name="fc2")

    model = transform(fwd)
    opt = optim.momentum(0.1, 0.9)
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy, accum_steps=accum)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((8, 8, 8, 3)))
    return t, state


def test_gradient_accumulation_matches_full_batch():
    x = np.random.RandomState(1).rand(8, 8, 8, 3).astype(np.float32)
    y = np.arange(8) % 10
    t1, s1 = _setup_accum(1)
    t4, s4 = _setup_accum(4)
    batch = (jnp.asarray(x), jnp.asarray(y))
    s1b, m1 = t1._train_step(s1, batch)
    s4b, m4 = t4._train_step(s4, batch)
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m4["accuracy"]),
                               float(m1["accuracy"]), atol=1e-6)
    for scope in s1b.params:
        for name in s1b.params[scope]:
            np.testing.assert_allclose(
                np.asarray(s4b.params[scope][name]),
                np.asarray(s1b.params[scope][name]), rtol=1e-4,
                atol=1e-6, err_msg=f"{scope}/{name}")


def test_gradient_accumulation_bf16_buffers_close_to_f32():
    """accum_dtype='bfloat16' (the HBM-traffic probe knob) must stay
    within bf16 rounding of the f32 accumulator over real update steps
    — same trajectory to ~2 decimal digits, exactness not expected."""
    x = np.random.RandomState(1).rand(8, 8, 8, 3).astype(np.float32)
    y = np.arange(8) % 10
    tf32, sf32 = _setup_accum(4)
    tb16, sb16 = _setup_accum(4)
    tb16.accum_dtype = "bfloat16"
    batch = (jnp.asarray(x), jnp.asarray(y))
    for _ in range(5):
        sf32, mf = tf32._train_step(sf32, batch)
        sb16, mb = tb16._train_step(sb16, batch)
    np.testing.assert_allclose(float(mb["loss"]), float(mf["loss"]),
                               rtol=2e-2)
    for scope in sf32.params:
        for name in sf32.params[scope]:
            np.testing.assert_allclose(
                np.asarray(sb16.params[scope][name]),
                np.asarray(sf32.params[scope][name]), rtol=0.05,
                atol=5e-3, err_msg=f"{scope}/{name}")


def test_gradient_accumulation_with_bn_trains():
    """With BN the semantics are sequential microbatch steps — just
    verify it runs, updates stats, and the loss is finite."""
    model = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    opt = optim.sgd(0.1)
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy, accum_steps=2)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((8, 32, 32, 3)))
    x = np.random.RandomState(2).rand(8, 32, 32, 3).astype(np.float32)
    y = np.arange(8) % 10
    new_state, m = t._train_step(state, (jnp.asarray(x), jnp.asarray(y)))
    assert np.isfinite(float(m["loss"]))
    assert int(new_state.step) == 1


def test_debug_checks_catch_divergence():
    """debug_checks=True raises NonFiniteError when the step poisons the
    state (astronomical LR -> inf/NaN params)."""
    from myconvnet_tpu.utils.debugging import NonFiniteError

    model = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    opt = optim.sgd(1e30)
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy, debug_checks=True)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((8, 32, 32, 3)))
    x = np.random.RandomState(3).rand(8, 32, 32, 3).astype(np.float32)
    y = np.arange(8) % 10
    import pytest
    with pytest.raises(NonFiniteError) as e:
        for _ in range(4):  # a few insane steps guarantee overflow
            state, _ = t._train_step(state, (jnp.asarray(x),
                                             jnp.asarray(y)))
    assert "non-finite" in str(e.value)


def test_eval_with_ema_uses_averaged_params():
    """Trainer(eval_with_ema=True): evaluation reads the Polyak copy, so
    after a large last step the eval result tracks the average, not the
    live params."""
    from myconvnet_tpu.eval.evaluators import AccuracyEvaluator

    def fwd(x, train=False):
        from myconvnet_tpu import nn
        return nn.dense(x.reshape(x.shape[0], -1), 2, name="fc")

    model = transform(fwd)
    opt = optim.with_ema(optim.sgd(100.0), decay=1.0)  # EMA frozen at init
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy,
                evaluator=AccuracyEvaluator(), eval_with_ema=True)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((4, 2, 2, 1)))
    x = jnp.asarray(np.random.RandomState(0).rand(4, 2, 2, 1)
                    .astype(np.float32))
    y = jnp.asarray([0, 1, 0, 1])
    # logits with INIT params (what decay=1.0 EMA preserves)
    init_logits, _ = model.apply(state.params, state.model_state, None, x)
    state, _ = t._train_step(state, (x, y))  # huge step changes live params
    ev_state = t._eval_state(state)
    ema_logits, _ = model.apply(ev_state.params, state.model_state,
                                None, x)
    np.testing.assert_allclose(np.asarray(ema_logits),
                               np.asarray(init_logits), rtol=1e-5,
                               atol=1e-6)
    live_logits, _ = model.apply(state.params, state.model_state, None, x)
    assert not np.allclose(np.asarray(live_logits),
                           np.asarray(init_logits))


def test_per_class_iou_accessor():
    from myconvnet_tpu.eval.evaluators import MeanIoUEvaluator

    e = MeanIoUEvaluator(3, ignore_label=None)
    pred = np.array([[0, 0, 1, 1]])
    truth = np.array([[0, 1, 1, 1]])
    e.update(jnp.asarray(pred), jnp.asarray(truth))
    iou = e.per_class_iou()
    np.testing.assert_allclose(iou[0], 0.5)       # 1 inter / 2 union
    np.testing.assert_allclose(iou[1], 2 / 3)     # 2 inter / 3 union
    assert np.isnan(iou[2])                       # class absent


def test_plateau_decay_fires_in_fit():
    """A never-improving validation score must shrink the LR scale on the
    plateau cadence (the reference driver's decay-on-plateau policy)."""
    from myconvnet_tpu.eval.evaluators import AccuracyEvaluator

    model = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    opt = optim.with_plateau(optim.sgd(0.1))
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy,
                evaluator=AccuracyEvaluator(),
                plateau_factor=0.1, plateau_patience=2)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((4, 32, 32, 3)))

    rs = np.random.RandomState(0)
    x = rs.rand(4, 32, 32, 3).astype(np.float32)

    def batches(n):
        for _ in range(n):
            yield x, rs.randint(0, 10, size=4)

    # constant-label validation: after the first round the accuracy score
    # can't improve, so every later validation is a "bad" round
    vx = x
    vy = np.zeros(4, np.int64)
    state = t.fit(state, batches(8), total_steps=8,
                  val_iter_fn=lambda: iter([(vx, vy)]), val_every=2)
    # 4 validations: first sets best, then 3 bad rounds -> one decay at
    # patience=2 (counter resets after firing)
    assert np.isclose(optim.plateau_scale(state.opt_state), 0.1)


def test_preemption_guard_checkpoints_and_stops(tmp_path):
    """A tripped guard must stop the loop early and leave a restorable
    checkpoint of the full state (the SIGTERM grace-window path)."""
    from myconvnet_tpu.utils.preemption import PreemptionGuard

    model = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    opt = optim.sgd(0.1)
    guard = PreemptionGuard()
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy, ckpt_dir=str(tmp_path),
                preemption_guard=guard)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((4, 32, 32, 3)))
    rs = np.random.RandomState(0)
    x = rs.rand(4, 32, 32, 3).astype(np.float32)

    def batches():
        for i in range(100):
            if i == 5:
                guard.trigger()  # "SIGTERM" after 5 steps
            yield x, rs.randint(0, 10, 4)

    state = t.fit(state, batches(), total_steps=100)
    assert int(state.step) == 5  # stopped early, not after 100
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    path = ckpt_lib.latest_checkpoint(str(tmp_path))
    assert path is not None
    restored = ckpt_lib.restore_checkpoint(path, state._asdict())
    assert int(restored["step"]) == 5


def test_preemption_guard_signal_handler():
    """Real signal delivery sets the flag; handlers restore on exit."""
    import os
    import signal

    from myconvnet_tpu.utils.preemption import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.preempted
        os.kill(os.getpid(), signal.SIGTERM)
        # delivery is synchronous for the current thread on CPython
        assert g.preempted
    assert signal.getsignal(signal.SIGTERM) is prev


def test_plateau_without_wrapper_fails_fast():
    """plateau_factor/patience with an unwrapped optimizer must raise at
    fit() start, not hours in at the first plateau."""
    import pytest

    from myconvnet_tpu.eval.evaluators import AccuracyEvaluator

    model = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    opt = optim.sgd(0.1)  # NOT with_plateau
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy,
                evaluator=AccuracyEvaluator(),
                plateau_factor=0.1, plateau_patience=2)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((4, 32, 32, 3)))
    with pytest.raises(ValueError, match="plateau"):
        t.fit(state, iter([]), total_steps=1)


def test_sam_update_matches_hand_computed_quadratic():
    """SAM on L(w) = 0.5*a*w^2: first gradient a*w, perturbation
    rho*sign(w) (normalized), final gradient a*(w + rho*sign(w)) —
    exactly what the step must apply."""
    from myconvnet_tpu.core.module import transform
    from myconvnet_tpu.train import optim
    from myconvnet_tpu.train.trainer import Trainer, init_train_state
    from myconvnet_tpu import nn

    a = 2.0
    rho = 0.1

    def fwd(x, train=False):
        w = nn.param("w", (), jnp.float32,
                     lambda key, shape, dtype: jnp.asarray(3.0))
        return jnp.broadcast_to(w, (x.shape[0], 1))

    model = transform(lambda x, train=False: _scoped(fwd, x, train))

    def _scoped(f, x, train):
        with nn.scope_named("lin"):
            return f(x, train)

    def loss_fn(logits, y):
        return 0.5 * a * jnp.mean(logits) ** 2

    opt = optim.sgd(0.5)
    t = Trainer(model=model, optimizer=opt, loss_fn=loss_fn, sam_rho=rho)
    t.logger.stdout = False
    s = init_train_state(model, opt, jax.random.key(0),
                         jnp.zeros((2, 1)))
    x = jnp.zeros((2, 1))
    y = jnp.zeros((2,), jnp.int32)
    s2, m = t._train_step(s, (x, y))
    w0 = 3.0
    # g1 = a*w0 = 6; ||g1|| = 6 -> eps = rho*g1/||g1|| = rho
    # g2 = a*(w0 + rho) = 6.2;  w1 = w0 - 0.5*g2
    expected = w0 - 0.5 * a * (w0 + rho)
    np.testing.assert_allclose(float(s2.params["lin"]["w"]), expected,
                               rtol=1e-5)


def test_sam_trains_and_differs_from_plain():
    from myconvnet_tpu import models
    from myconvnet_tpu.core.module import transform
    from myconvnet_tpu.train import optim
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    from myconvnet_tpu.train.trainer import Trainer, init_train_state

    model = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    opt = optim.momentum(0.05, 0.9)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, 8))

    def run(rho, accum=1):
        t = Trainer(model=model, optimizer=opt,
                    loss_fn=softmax_cross_entropy, sam_rho=rho,
                    accum_steps=accum)
        t.logger.stdout = False
        s = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((8, 16, 16, 3)))
        losses = []
        for _ in range(4):
            s, m = t._train_step(s, (x, y))
            losses.append(float(m["loss"]))
        return losses

    plain = run(0.0)
    sam = run(0.2)
    sam_accum = run(0.2, accum=2)
    assert all(np.isfinite(sam)) and all(np.isfinite(sam_accum))
    assert sam[-1] < sam[0]                      # still learns
    assert abs(sam[1] - plain[1]) > 1e-6         # and really differs
