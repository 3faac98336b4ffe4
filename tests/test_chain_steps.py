"""Dispatch chaining (Trainer.chain_steps, the steps-per-loop idiom):
K train steps inside one jitted program must be SEMANTICALLY IDENTICAL
to K single-step dispatches — same per-step RNG folds, sequential BN
updates, same optimizer trajectory — while cutting host work to one
Python iteration + one staged transfer per K steps."""

import numpy as np
import jax
import pytest

from myconvnet_tpu import models, recipes
from myconvnet_tpu.data.pipeline import DataSet
from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
from myconvnet_tpu.models.base import ConvNet
from myconvnet_tpu.parallel import make_mesh


class _CountingSource:
    """Deterministic synthetic source; counts get_batch calls."""

    def __init__(self, n=128, num_classes=4, hw=(8, 8), seed=0):
        rng = np.random.RandomState(seed)
        self.x = rng.randint(0, 256, (n, *hw, 3), np.uint8)
        self.y = rng.randint(0, num_classes, n).astype(np.int32)
        self.calls = 0

    def __len__(self):
        return len(self.x)

    def get_batch(self, idx):
        self.calls += 1
        return self.x[idx], self.y[idx]


def _net(chain_steps, mesh=None, seed=0):
    return ConvNet(models.smallnet, input_shape=(8, 8, 3),
                   num_classes=4, precision="f32", width=4,
                   dropout_rate=0.0, chain_steps=chain_steps,
                   mesh=mesh, seed=seed)


def _train(chain_steps, mesh=None, total_steps=9, val_every=0):
    net = _net(chain_steps, mesh=mesh)
    ds = DataSet(_CountingSource(), seed=3)
    val = DataSet(_CountingSource(seed=9))
    opt = recipes.make_optimizer(dict(name="momentum",
                                      momentum_coef=0.9, lr=0.05))
    net.train(ds, val, batch_size=16, total_steps=total_steps,
              optimizer=opt, evaluator=AccuracyEvaluator(),
              val_every=val_every)
    return net


def _params_flat(net):
    return np.concatenate([np.asarray(p).ravel()
                           for p in jax.tree.leaves(net.state.params)])


def test_chain_matches_single_step_exactly():
    """Same data order + same seeds: the chained trajectory must equal
    the single-step trajectory (same train_step body, same RNG folds,
    scan is sequential; tolerance covers scan-body vs standalone XLA
    fusion differences at the last float bit)."""
    a = _train(1)
    b = _train(4)
    assert int(a.state.step) == int(b.state.step) == 9
    np.testing.assert_allclose(_params_flat(a), _params_flat(b),
                               atol=2e-6)


def test_chain_val_cadence_preserved():
    """chain=3 with val_every=3: validation sees the state at exactly
    steps 3/6/9 and scores match the single-step run."""
    scores = {}
    for k in (1, 3):
        net = _net(k)
        recorded = []
        orig_log = net.logger.log
        net.logger.log = lambda s, m: (recorded.append((s, dict(m))),
                                       orig_log(s, m))[1]
        ds = DataSet(_CountingSource(), seed=3)
        val = DataSet(_CountingSource(seed=9))
        opt = recipes.make_optimizer(dict(name="momentum",
                                          momentum_coef=0.9, lr=0.05))
        net.train(ds, val, batch_size=16, total_steps=9,
                  optimizer=opt, evaluator=AccuracyEvaluator(),
                  val_every=3)
        scores[k] = [(s, m["val_accuracy"]) for s, m in recorded
                     if "val_accuracy" in m]
    assert [s for s, _ in scores[3]] == [3, 6, 9]
    assert [s for s, _ in scores[1]] == [3, 6, 9]
    np.testing.assert_allclose([v for _, v in scores[1]],
                               [v for _, v in scores[3]], atol=1e-3)


def test_chain_rejects_misaligned_val_cadence():
    """Windows are staged before dispatch; a val cadence that splits a
    window is a config error, not a silent reslice."""
    with pytest.raises(ValueError, match="divide val_every"):
        _train(4, total_steps=9, val_every=3)


def test_chain_with_mesh_matches_unsharded():
    """The stacked window shards over the data axis; numerics match the
    meshless run."""
    mesh = make_mesh()
    a = _train(4, mesh=None)
    b = _train(4, mesh=mesh)
    np.testing.assert_allclose(_params_flat(a), _params_flat(b),
                               atol=2e-5)


def test_chain_handles_partial_final_window():
    """total_steps not a multiple of chain: the last window truncates
    (7 = 4 + 3) and the step counter is exact."""
    net = _train(4, total_steps=7)
    assert int(net.state.step) == 7
    ref = _train(1, total_steps=7)
    np.testing.assert_allclose(_params_flat(net), _params_flat(ref),
                               atol=2e-6)


def test_chain_rejects_spatial():
    from myconvnet_tpu.train.trainer import Trainer
    net = _net(2, mesh=make_mesh())
    net.spatial = True
    with pytest.raises(ValueError, match="spatial"):
        net.build()
        net._make_trainer(AccuracyEvaluator())


def test_window_batches_groups_and_tail():
    from myconvnet_tpu.data.pipeline import _window_batches
    batches = [(np.full((2, 3), i, np.uint8),
                np.full((2,), i, np.int32)) for i in range(7)]
    wins = list(_window_batches(iter(batches), 3))
    assert [w[0].shape for w in wins] == [(3, 2, 3), (3, 2, 3),
                                          (1, 2, 3)]
    np.testing.assert_array_equal(wins[1][1][:, 0], [3, 4, 5])


def test_chain_dispatches_once_per_window():
    """The feature's point: ONE jitted dispatch (and one staged
    window) per K steps — a regression to per-batch dispatch would
    pass the parity tests but fail this count."""
    net = _net(4)
    ds = DataSet(_CountingSource(), seed=3)
    opt = recipes.make_optimizer(dict(name="momentum",
                                      momentum_coef=0.9, lr=0.05))
    net.build(opt)
    trainer = net._make_trainer(AccuracyEvaluator())
    net._trainer = trainer
    calls = []
    orig = trainer._chain_step
    trainer._chain_step = lambda s, b: calls.append(
        b[0].shape) or orig(s, b)
    trainer.fit(net.state, ds.train_iter(16, window=4),
                total_steps=8, val_every=0)
    assert calls == [(4, 16, 8, 8, 3), (4, 16, 8, 8, 3)]


def test_chain_rejects_unwindowed_iterator():
    """A plain batch iterator under chain mode must fail loudly, not
    be misread as a window of single examples."""
    net = _net(4)
    ds = DataSet(_CountingSource(), seed=3)
    opt = recipes.make_optimizer(dict(name="momentum",
                                      momentum_coef=0.9, lr=0.05))
    net.build(opt)
    trainer = net._make_trainer(AccuracyEvaluator())
    with pytest.raises(ValueError, match="leading axis"):
        trainer.fit(net.state, ds.train_iter(16), total_steps=8,
                    val_every=0)


def test_chain_val_fires_after_misaligned_resume():
    """Boundary-crossing validation trigger: a resume from a step not
    on the chain grid (terminal truncated window) must still validate
    at the next boundary crossing instead of never again."""
    net = _net(2)
    ds = DataSet(_CountingSource(), seed=3)
    val = DataSet(_CountingSource(seed=9))
    opt = recipes.make_optimizer(dict(name="momentum",
                                      momentum_coef=0.9, lr=0.05))
    # land on step 3 (odd — off the chain=2 grid)
    net.train(ds, val, batch_size=16, total_steps=3, optimizer=opt,
              evaluator=AccuracyEvaluator(), val_every=0)
    assert int(net.state.step) == 3
    recorded = []
    trainer = net._make_trainer(AccuracyEvaluator())
    orig_log = trainer.logger.log
    trainer.logger.log = lambda s, m: (recorded.append((s, dict(m))),
                                       orig_log(s, m))[1]
    net.state = trainer.fit(
        net.state, ds.train_iter(16, window=2), total_steps=9,
        val_iter_fn=lambda: val.eval_iter(16), val_every=4)
    # windows advance 3->5->7->9; the 4- and 8-boundaries are crossed
    # mid-window and must still fire (at steps 5 and 9)
    val_steps = [s for s, m in recorded if "val_accuracy" in m]
    assert val_steps == [5, 9], val_steps


def test_chain_debug_checks_guard_covers_chained_path():
    """debug_checks must sanitize chained dispatches too."""
    from myconvnet_tpu.utils.debugging import NonFiniteError
    net = _net(4)
    net.debug_checks = True
    opt = recipes.make_optimizer(dict(
        name="momentum", momentum_coef=0.9, lr=1e30))  # forced blowup
    ds = DataSet(_CountingSource(), seed=3)
    with pytest.raises(NonFiniteError):
        net.train(ds, None, batch_size=16, total_steps=4,
                  optimizer=opt, evaluator=AccuracyEvaluator(),
                  val_every=0)
