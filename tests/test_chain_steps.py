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
    """Deterministic synthetic source that counts get_batch calls."""

    def __init__(self, n=128, num_classes=4, hw=(8, 8), seed=0):
        rng = np.random.RandomState(seed)
        self.x = rng.randint(0, 256, (n, *hw, 3), np.uint8)
        self.y = rng.randint(0, num_classes, n).astype(np.int32)

    def __len__(self):
        return len(self.x)

    def get_batch(self, idx):
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
