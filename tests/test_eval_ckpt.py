import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.ckpt import checkpoint as ckpt
from myconvnet_tpu.eval import evaluators as ev


def test_accuracy_evaluator():
    e = ev.AccuracyEvaluator()
    logits = jnp.asarray([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    labels = jnp.asarray([1, 0, 0])
    e.update(logits, labels)
    assert e.score() == pytest.approx(2 / 3)
    e.update(logits, jnp.asarray([1, 0, 1]))
    assert e.score() == pytest.approx(5 / 6)
    assert e.is_better(0.9, 0.8)


def test_top5_accuracy():
    e = ev.AccuracyEvaluator(k=5)
    logits = jnp.asarray([np.arange(10.0)])
    e.update(logits, jnp.asarray([5]))   # 5 in top-5 (5..9)
    e.update(logits, jnp.asarray([4]))   # 4 not in top-5
    assert e.score() == pytest.approx(0.5)


def test_error_rate_direction():
    e = ev.ErrorRateEvaluator()
    assert not e.higher_is_better
    assert e.is_better(0.1, 0.2)
    assert e.worst_score() == np.inf


def test_miou_evaluator():
    e = ev.MeanIoUEvaluator(num_classes=3, ignore_label=255)
    pred = jnp.asarray([[0, 0, 1, 1, 2, 2]])
    truth = jnp.asarray([[0, 0, 1, 2, 2, 255]])
    e.update(pred, truth)
    # class0: i=2,u=2 -> 1.0 ; class1: i=1,u=2 -> 0.5 ; class2: i=1,u=2 -> 0.5
    assert e.score() == pytest.approx((1.0 + 0.5 + 0.5) / 3)
    assert e.pixel_accuracy() == pytest.approx(4 / 5)


def test_miou_from_logits():
    e = ev.MeanIoUEvaluator(num_classes=2, ignore_label=None)
    logits = jnp.zeros((1, 2, 2, 2)).at[..., 1].set(1.0)  # predicts class 1
    labels = jnp.ones((1, 2, 2), jnp.int32)
    e.update(logits, labels)
    assert e.score() == pytest.approx(1.0)


def test_make_evaluator():
    assert isinstance(ev.make_evaluator("accuracy"), ev.AccuracyEvaluator)
    with pytest.raises(ValueError):
        ev.make_evaluator("f1")


def _state(seed=0):
    k = jax.random.key(seed)
    return {
        "params": {"conv": {"w": jax.random.normal(k, (3, 3, 2, 4))}},
        "opt": (jnp.zeros((3,)), {"mu": jnp.ones((2, 2))}),
        "step": jnp.asarray(7),
        "rng": jax.random.key_data(jax.random.key(1)),
    }


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path)
    state = _state()
    ckpt.save_checkpoint(d, 7, state)
    target = jax.tree.map(jnp.zeros_like, _state(1))
    restored = ckpt.restore_checkpoint(os.path.join(d, "ckpt-7.npz"), target)
    np.testing.assert_array_equal(restored["params"]["conv"]["w"],
                                  state["params"]["conv"]["w"])
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(restored["rng"], state["rng"])


def test_checkpoint_latest_best_prune(tmp_path):
    d = str(tmp_path)
    state = _state()
    for s in (1, 2, 3, 4):
        ckpt.save_checkpoint(d, s, state, keep=2, metric=0.1 * s,
                             is_best=(s == 3))
    assert ckpt.all_steps(d) == [3, 4]
    assert ckpt.latest_checkpoint(d).endswith("ckpt-4.npz")
    assert ckpt.best_checkpoint(d).endswith("best.npz")
    assert ckpt.checkpoint_step(ckpt.best_checkpoint(d)) == 3
    restored = ckpt.restore_checkpoint(d, jax.tree.map(jnp.zeros_like,
                                                       _state(1)))
    assert int(restored["step"]) == 7


def test_checkpoint_shape_mismatch(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, 1, {"w": jnp.zeros((2, 2))})
    with pytest.raises(ValueError, match="shape mismatch"):
        ckpt.restore_checkpoint(d, {"w": jnp.zeros((3, 3))})


def test_checkpoint_missing_key(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, 1, {"w": jnp.zeros((2, 2))})
    with pytest.raises(ValueError, match="missing keys"):
        ckpt.restore_checkpoint(d, {"w": jnp.zeros((2, 2)),
                                    "v": jnp.zeros((1,))})


def test_orbax_backend_roundtrip(tmp_path):
    """Optional Orbax backend: save/restore preserves values, shardings,
    and prunes old steps."""
    pytest.importorskip("orbax.checkpoint")
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from myconvnet_tpu.ckpt import orbax_io
    from myconvnet_tpu.parallel.mesh import make_mesh

    d = str(tmp_path / "orbax")
    state = {"params": {"w": jnp.arange(16.0).reshape(4, 4),
                        "b": jnp.ones(4)},
             "step": jnp.asarray(7, jnp.int32)}
    orbax_io.save(d, 7, state)
    orbax_io.save(d, 8, state)
    orbax_io.save(d, 9, state, keep=2)
    assert orbax_io.all_steps(d) == [8, 9]
    assert orbax_io.checkpoint_step(orbax_io.latest(d)) == 9

    template = jax.tree.map(jnp.zeros_like, state)
    restored = orbax_io.restore(d, template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7

    if len(jax.devices()) >= 8:
        mesh = make_mesh(8, 1)
        sh = NamedSharding(mesh, P("data"))
        sharded = {"x": jax.device_put(jnp.arange(32.0), sh)}
        orbax_io.save(d + "_sh", 1, sharded)
        out = orbax_io.restore(d + "_sh",
                               {"x": jax.device_put(jnp.zeros(32), sh)})
        assert out["x"].sharding == sh
        np.testing.assert_array_equal(np.asarray(out["x"]),
                                      np.arange(32.0))


def test_accuracy_evaluator_spatial_logits_bounded():
    """[N,H,W,C] logits / [N,H,W] labels: accuracy counts pixels and
    stays in [0,1] (it used to divide pixel-corrects by batch size)."""
    e = ev.AccuracyEvaluator()
    logits = np.zeros((2, 4, 4, 3), np.float32)
    logits[..., 1] = 1.0                       # predict class 1 everywhere
    labels = np.ones((2, 4, 4), np.int64)
    labels[0, 0, :] = 0                        # 4 wrong pixels of 32
    e.update(logits, labels)
    assert abs(e.score() - 28 / 32) < 1e-6
    # top-k with spatial labels also stays bounded
    e5 = ev.AccuracyEvaluator(k=2)
    e5.update(logits, labels)
    assert 0.0 <= e5.score() <= 1.0


def test_decode_predictions():
    logits = np.array([[0.0, 2.0, 1.0], [3.0, 0.0, 0.0]], np.float32)
    out = ev.decode_predictions(logits, ["a", "b", "c"], top=2)
    assert out[0][0][0] == "b" and out[0][1][0] == "c"
    assert out[1][0][0] == "a"
    assert 0.0 < out[0][0][1] <= 1.0


def test_confusion_matrix_evaluator_report():
    from myconvnet_tpu.eval.evaluators import (ConfusionMatrixEvaluator,
                                               make_evaluator)
    ev = make_evaluator("confusion", num_classes=3)
    assert isinstance(ev, ConfusionMatrixEvaluator)
    # logits whose argmax gives pred = [0, 1, 1, 2]; truth = [0, 1, 2, 2]
    logits = np.eye(3, dtype=np.float32)[[0, 1, 1, 2]]
    labels = np.asarray([0, 1, 2, 2])
    ev.update(logits, labels)
    assert np.isclose(ev.score(), 0.75)
    pc = ev.per_class()
    # class 1: predicted twice, one correct -> precision 0.5, recall 1.0
    np.testing.assert_allclose(pc["precision"], [1.0, 0.5, 1.0])
    np.testing.assert_allclose(pc["recall"], [1.0, 1.0, 0.5])
    np.testing.assert_allclose(pc["support"], [1, 1, 2])
    f1_c2 = 2 * 1.0 * 0.5 / 1.5
    assert np.isclose(ev.macro_f1(), np.mean([1.0, 2 / 3, f1_c2]))
    rep = ev.report(["cat", "dog", "bird"])
    assert "dog" in rep and "macro f1" in rep and "0.7500" in rep
    # matrix rows are truth: truth=2 predicted as 1 once
    assert ev.matrix[2, 1] == 1.0
    # accumulates across update calls
    ev.update(logits, labels)
    np.testing.assert_allclose(pc["support"] * 2, ev.per_class()["support"])


def test_average_checkpoints(tmp_path):
    from myconvnet_tpu.ckpt.checkpoint import (average_checkpoints,
                                               save_checkpoint)
    d = str(tmp_path)

    def state(v, step):
        return {"params": {"layer": {"w": np.full((2, 2), v, np.float32)}},
                "opt": {"m": np.full((2, 2), v * 10, np.float32)},
                "step": np.asarray(step, np.int32)}

    for i, v in enumerate([1.0, 2.0, 6.0]):
        save_checkpoint(d, i + 1, state(v, i + 1), keep=10)
    template = state(0.0, 0)
    # average all 3: params mean = 3.0; opt/step from the newest
    avg = average_checkpoints(d, template)
    np.testing.assert_allclose(avg["params"]["layer"]["w"], 3.0)
    np.testing.assert_allclose(avg["opt"]["m"], 60.0)
    assert int(avg["step"]) == 3
    # last 2 only: mean = 4.0
    avg2 = average_checkpoints(d, template, n_last=2)
    np.testing.assert_allclose(avg2["params"]["layer"]["w"], 4.0)
    # n_last=1 degenerates to plain restore of the newest
    avg1 = average_checkpoints(d, template, n_last=1)
    np.testing.assert_allclose(avg1["params"]["layer"]["w"], 6.0)
    with pytest.raises(FileNotFoundError):
        average_checkpoints(str(tmp_path / "none"), template)


def test_top_confusions():
    from myconvnet_tpu.eval.evaluators import ConfusionMatrixEvaluator
    ev2 = ConfusionMatrixEvaluator(3)
    # truth 0 predicted as 2 five times; truth 1->0 twice; diagonal noise
    logits = np.eye(3, dtype=np.float32)
    preds = [2] * 5 + [0] * 2 + [1] * 4
    truth = [0] * 5 + [1] * 2 + [1] * 4
    ev2.update(logits[preds], np.asarray(truth))
    top = ev2.top_confusions(2, ["a", "b", "c"])
    assert top == [("a", "c", 5), ("b", "a", 2)]
    assert ev2.top_confusions(10)[0] == ("0", "2", 5)


def test_joint_evaluator_scores_primary_reports_secondary():
    from myconvnet_tpu.eval.evaluators import (AccuracyEvaluator,
                                               ConfusionMatrixEvaluator,
                                               JointEvaluator)
    top2 = AccuracyEvaluator(k=2)
    cm = ConfusionMatrixEvaluator(3)
    ev = JointEvaluator(top2, cm)
    logits = np.asarray([[0.1, 0.9, 0.0],   # true 0: top1 wrong, top2 hit
                         [0.0, 0.2, 0.8],   # true 2: top1 hit
                         [0.9, 0.0, 0.05]])  # true 1: top2 miss
    labels = np.asarray([0, 2, 1])
    ev.update(logits, labels)
    assert ev.name == "top2_accuracy"
    assert abs(ev.score() - 2 / 3) < 1e-9          # top-2 accuracy
    assert abs(top2.score() - cm.score()) > 1e-6   # cm holds top-1 (1/3)
    rep = ev.report(["a", "b", "c"])
    assert "precision" in rep and "macro f1" in rep
    ev.reset()
    assert ev.score() == 0.0


def test_async_checkpointer_roundtrip(tmp_path):
    """AsyncCheckpointer: background write lands the same artifact
    save_checkpoint would; donation-safe (state mutated right after
    save); write failures surface on wait()."""
    import numpy as np
    import pytest

    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib

    state = {"params": {"w": np.arange(6.0).reshape(2, 3)},
             "step": np.asarray(7)}
    ac = ckpt_lib.AsyncCheckpointer()
    ac.save(str(tmp_path), 7, state, keep=2)
    # mutate the live buffers immediately — the snapshot must protect us
    state["params"]["w"] += 100.0
    ac.wait()
    latest = ckpt_lib.latest_checkpoint(str(tmp_path))
    got = ckpt_lib.restore_checkpoint(
        latest, {"params": {"w": np.zeros((2, 3))},
                 "step": np.asarray(0)})
    np.testing.assert_array_equal(got["params"]["w"],
                                  np.arange(6.0).reshape(2, 3))
    assert int(got["step"]) == 7
    # failure surfaces on wait
    ac.save("/proc/definitely-not-writable/x", 8, state)
    with pytest.raises(BaseException):
        ac.wait()
    # ...and the checkpointer is reusable afterwards
    ac.save(str(tmp_path), 9, state, keep=2)
    ac.wait()
    assert ckpt_lib.checkpoint_step(
        ckpt_lib.latest_checkpoint(str(tmp_path))) == 9
