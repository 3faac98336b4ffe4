import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.train import optim


def _quadratic_params():
    return {"lin": {"w": jnp.asarray([3.0, -2.0]), "b": jnp.asarray(1.5)}}


def _grad(params):
    # grad of 0.5*||p||^2 is p itself
    return params


@pytest.mark.parametrize("name,kwargs", [
    ("sgd", {}), ("momentum", {}), ("adam", {}), ("adamw", {}),
    ("rmsprop", {}),
])
def test_optimizers_descend(name, kwargs):
    opt = optim.make_optimizer(name, 0.1, **kwargs)
    params = _quadratic_params()
    state = opt.init(params)

    def norm(p):
        return float(sum(jnp.sum(x ** 2) for b in p.values()
                         for x in b.values()))

    n0 = norm(params)
    for step in range(50):
        params, state = opt.update(_grad(params), state, params,
                                   jnp.asarray(step))
    assert norm(params) < 0.05 * n0


def test_sgd_momentum_matches_formula():
    opt = optim.momentum(1.0, 0.9)
    p = {"a": {"w": jnp.asarray(1.0)}}
    s = opt.init(p)
    g = {"a": {"w": jnp.asarray(0.5)}}
    p1, s1 = opt.update(g, s, p, jnp.asarray(0))
    # m1 = 0.5, p1 = 1 - 0.5
    np.testing.assert_allclose(p1["a"]["w"], 0.5)
    p2, s2 = opt.update(g, s1, p1, jnp.asarray(1))
    # m2 = 0.9*0.5 + 0.5 = 0.95; p2 = 0.5 - 0.95
    np.testing.assert_allclose(p2["a"]["w"], -0.45, rtol=1e-6)


def test_weight_decay_coupled():
    opt = optim.sgd(0.1, weight_decay=0.5)
    p = {"a": {"w": jnp.asarray(2.0)}}
    g = {"a": {"w": jnp.asarray(0.0)}}
    p1, _ = opt.update(g, opt.init(p), p, jnp.asarray(0))
    # effective grad = 0 + 0.5*2 = 1; p1 = 2 - 0.1
    np.testing.assert_allclose(p1["a"]["w"], 1.9, rtol=1e-6)


def test_adam_bias_correction_first_step():
    opt = optim.adam(1e-1)
    p = {"a": {"w": jnp.asarray(0.0)}}
    g = {"a": {"w": jnp.asarray(1.0)}}
    p1, _ = opt.update(g, opt.init(p), p, jnp.asarray(0))
    # with bias correction, first step ~= -lr * g/|g| = -0.1
    np.testing.assert_allclose(p1["a"]["w"], -0.1, rtol=1e-4)


def test_schedules():
    s = optim.step_decay(1.0, [10, 20], [0.1, 0.01])
    assert float(s(jnp.asarray(0))) == 1.0
    assert float(s(jnp.asarray(10))) == pytest.approx(0.1)
    assert float(s(jnp.asarray(25))) == pytest.approx(0.01)

    c = optim.cosine_decay(2.0, 100)
    assert float(c(jnp.asarray(0))) == pytest.approx(2.0)
    assert float(c(jnp.asarray(50))) == pytest.approx(1.0)
    assert float(c(jnp.asarray(100))) == pytest.approx(0.0, abs=1e-6)

    w = optim.warmup(optim.constant(1.0), 10)
    assert float(w(jnp.asarray(0))) == pytest.approx(0.1)
    assert float(w(jnp.asarray(9))) == pytest.approx(1.0)
    assert float(w(jnp.asarray(500))) == pytest.approx(1.0)

    poly = optim.polynomial_decay(1.0, 100, end_lr=0.1, power=1.0)
    assert float(poly(jnp.asarray(50))) == pytest.approx(0.55)

    cfg = {"kind": "cosine", "lr": 0.4, "total_steps": 10,
           "warmup_steps": 2}
    s2 = optim.make_schedule(cfg)
    assert float(s2(jnp.asarray(0))) == pytest.approx(0.2)


def test_update_is_jittable():
    opt = optim.adam(optim.cosine_decay(0.1, 100))
    p = {"a": {"w": jnp.ones((4, 4))}}
    s = opt.init(p)

    @jax.jit
    def step(p, s, i):
        g = jax.tree.map(jnp.ones_like, p)
        return opt.update(g, s, p, i)

    p1, s1 = step(p, s, jnp.asarray(0))
    assert p1["a"]["w"].shape == (4, 4)
    assert float(jnp.max(p1["a"]["w"])) < 1.0


def test_unknown_names_raise():
    with pytest.raises(ValueError, match="unknown optimizer"):
        optim.make_optimizer("lion", 0.1)
    with pytest.raises(ValueError, match="unknown schedule"):
        optim.make_schedule({"kind": "sawtooth", "lr": 1.0})


def test_weight_decay_exclusion_mask():
    opt = optim.momentum(1.0, 0.0, weight_decay=0.1,
                         weight_decay_exclude=optim.norm_and_bias_exclusion)
    p = {"conv": {"w": jnp.ones((3, 3, 4, 8)), "b": jnp.ones(8)},
         "bn": {"gamma": jnp.ones(8), "beta": jnp.ones(8)}}
    g = jax.tree.map(jnp.zeros_like, p)
    p2, _ = opt.update(g, opt.init(p), p, jnp.asarray(0))
    np.testing.assert_allclose(p2["conv"]["w"], 0.9, rtol=1e-6)
    for scope, name in (("conv", "b"), ("bn", "gamma"), ("bn", "beta")):
        np.testing.assert_allclose(p2[scope][name], 1.0)


def test_clip_by_global_norm():
    g = {"a": {"w": jnp.asarray([3.0, 4.0])}}  # norm 5
    clipped, norm = optim.clip_by_global_norm(g, 1.0)
    np.testing.assert_allclose(float(norm), 5.0, rtol=1e-6)
    np.testing.assert_allclose(clipped["a"]["w"], [0.6, 0.8], rtol=1e-6)
    # under the limit -> unchanged
    same, _ = optim.clip_by_global_norm(g, 10.0)
    np.testing.assert_allclose(same["a"]["w"], [3.0, 4.0])


def test_with_gradient_clipping_descends():
    opt = optim.with_gradient_clipping(optim.sgd(0.5), max_norm=1.0)
    p = {"a": {"w": jnp.asarray([30.0, 40.0])}}
    s = opt.init(p)
    p2, _ = opt.update(p, s, p, jnp.asarray(0))  # grad = p, norm 50 -> clip
    # step = 0.5 * unit vector
    np.testing.assert_allclose(p2["a"]["w"], [30.0 - 0.5 * 0.6,
                                              40.0 - 0.5 * 0.8], rtol=1e-5)


def test_ema():
    p = {"a": {"w": jnp.asarray(1.0)}}
    e = optim.ema_init(p)
    p2 = {"a": {"w": jnp.asarray(2.0)}}
    e2 = optim.ema_update(e, p2, decay=0.9)
    np.testing.assert_allclose(float(e2["a"]["w"]), 1.1, rtol=1e-6)


def test_lars_trust_ratio_scales_update():
    """LARS update magnitude tracks ||w||/||g||: same gradient direction,
    10x bigger weights -> 10x bigger step."""
    opt = optim.lars(1.0, momentum_coef=0.0, eta=0.01)
    g = {"w": jnp.asarray([1.0, 0.0])}
    small = {"w": jnp.asarray([3.0, 4.0])}     # norm 5
    big = {"w": jnp.asarray([30.0, 40.0])}     # norm 50
    s1, _ = opt.update(g, opt.init(small), small, jnp.asarray(0))
    s2, _ = opt.update(g, opt.init(big), big, jnp.asarray(0))
    d1 = float(small["w"][0] - s1["w"][0])
    d2 = float(big["w"][0] - s2["w"][0])
    np.testing.assert_allclose(d2 / d1, 10.0, rtol=1e-4)
    np.testing.assert_allclose(d1, 0.01 * 5.0, rtol=1e-4)  # eta*||w||*g/||g||


def test_lars_excluded_params_get_plain_momentum():
    opt = optim.lars(0.5, momentum_coef=0.0, eta=0.001, weight_decay=0.1,
                     weight_decay_exclude=optim.norm_and_bias_exclusion)
    p = {"bn": {"gamma": jnp.asarray([2.0])}}
    g = {"bn": {"gamma": jnp.asarray([1.0])}}
    p2, _ = opt.update(g, opt.init(p), p, jnp.asarray(0))
    # no decay, no trust ratio: w - lr*g
    np.testing.assert_allclose(p2["bn"]["gamma"], [2.0 - 0.5], rtol=1e-6)


def test_lars_converges_on_quadratic():
    opt = optim.lars(0.05, momentum_coef=0.9, eta=0.1)
    p = {"w": jnp.asarray([5.0, -3.0, 2.0])}
    s = opt.init(p)
    for i in range(200):
        g = jax.tree.map(lambda w: 2.0 * w, p)   # d/dw ||w||^2
        p, s = opt.update(g, s, p, jnp.asarray(i))
    assert float(jnp.sum(jnp.square(p["w"]))) < 1e-2


def test_lars_zero_grad_keeps_params():
    opt = optim.lars(1.0, momentum_coef=0.0, eta=0.01)
    p = {"w": jnp.asarray([1.0, 2.0])}
    g = {"w": jnp.zeros(2)}
    p2, _ = opt.update(g, opt.init(p), p, jnp.asarray(0))
    np.testing.assert_allclose(p2["w"], p["w"])


def test_cosine_restarts_schedule():
    sched = optim.cosine_restarts(1.0, first_decay_steps=100, t_mul=2.0,
                                  m_mul=0.5)
    # cycle starts: step 0 -> lr; step 100 -> restart at lr*m_mul
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(100))), 0.5,
                               atol=1e-5)
    # end of first cycle decays toward 0
    assert float(sched(jnp.asarray(99))) < 0.01
    # second cycle is 200 steps: step 300 -> third cycle at 0.25
    np.testing.assert_allclose(float(sched(jnp.asarray(300))), 0.25,
                               atol=1e-5)
    # monotone decay within a cycle
    vals = [float(sched(jnp.asarray(s))) for s in range(100, 300, 25)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_cosine_restarts_tmul_one():
    sched = optim.cosine_restarts(2.0, first_decay_steps=50, t_mul=1.0)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 2.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(50))), 2.0,
                               atol=1e-5)
    np.testing.assert_allclose(float(sched(jnp.asarray(125))),
                               float(sched(jnp.asarray(25))), atol=1e-5)


def test_lars_registry():
    opt = optim.make_optimizer("lars", 0.1, eta=0.01)
    assert isinstance(opt, optim.Optimizer)
    sched = optim.make_schedule({"kind": "cosine_restarts", "lr": 0.1,
                                 "first_decay_steps": 10})
    assert float(sched(jnp.asarray(0))) > 0


def test_with_ema_combinator_tracks_params():
    opt = optim.with_ema(optim.sgd(0.5), decay=0.5)
    p = {"w": jnp.asarray([2.0])}
    s = opt.init(p)
    np.testing.assert_allclose(optim.extract_ema(s)["w"], [2.0])
    g = {"w": jnp.asarray([1.0])}
    p1, s1 = opt.update(g, s, p, jnp.asarray(0))   # p -> 1.5
    np.testing.assert_allclose(p1["w"], [1.5], rtol=1e-6)
    # ema = 0.5*2.0 + 0.5*1.5 = 1.75
    np.testing.assert_allclose(optim.extract_ema(s1)["w"], [1.75],
                               rtol=1e-6)
    with np.testing.assert_raises(Exception):
        optim.extract_ema(s1.inner)


def test_ema_state_checkpoints(tmp_path):
    """EmaOptState rides the normal checkpoint path (it is a pytree)."""
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    opt = optim.with_ema(optim.momentum(0.1, 0.9), decay=0.9)
    p = {"layer": {"w": jnp.ones((2, 2))}}
    s = opt.init(p)
    state = {"params": p, "opt": s}
    ckpt_lib.save_checkpoint(str(tmp_path), 1, state)
    restored = ckpt_lib.restore_checkpoint(str(tmp_path), state)
    np.testing.assert_allclose(
        np.asarray(optim.extract_ema(restored["opt"])["layer"]["w"]),
        np.ones((2, 2)))


def test_with_plateau_identity_at_scale_one():
    base = optim.momentum(0.1, 0.9)
    wrapped = optim.with_plateau(base)
    p0 = _quadratic_params()
    sb, sw = base.init(p0), wrapped.init(p0)
    pb, pw = p0, p0
    for step in range(5):
        pb, sb = base.update(_grad(pb), sb, pb, jnp.asarray(step))
        pw, sw = wrapped.update(_grad(pw), sw, pw, jnp.asarray(step))
    for a, b in zip(jax.tree.leaves(pb), jax.tree.leaves(pw)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.parametrize("name", ["momentum", "adam", "rmsprop"])
def test_with_plateau_halves_delta_exactly(name):
    # moments accumulate raw grads, so delta-scaling == lr-scaling: one
    # step at scale 0.5 must equal one step at lr/2 from the same state
    opt_full = optim.make_optimizer(name, 0.1)
    opt_half = optim.make_optimizer(name, 0.05)
    wrapped = optim.with_plateau(opt_full)
    p0 = _quadratic_params()
    sw = optim.set_plateau_scale(wrapped.init(p0), 0.5)
    assert optim.plateau_scale(sw) == 0.5
    ph, _ = opt_half.update(_grad(p0), opt_half.init(p0), p0,
                            jnp.asarray(0))
    pw, _ = wrapped.update(_grad(p0), sw, p0, jnp.asarray(0))
    for a, b in zip(jax.tree.leaves(ph), jax.tree.leaves(pw)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_plateau_scale_nested_in_ema():
    opt = optim.with_ema(optim.with_plateau(optim.momentum(0.1)), 0.99)
    p0 = _quadratic_params()
    state = opt.init(p0)
    assert optim.plateau_scale(state) == 1.0
    state = optim.set_plateau_scale(state, 0.25)
    assert optim.plateau_scale(state) == 0.25
    # still a valid EmaOptState for eval-time extraction
    optim.extract_ema(state)
    # and the wrapped update runs
    p1, state = opt.update(_grad(p0), state, p0, jnp.asarray(0))
    assert jax.tree.structure(p1) == jax.tree.structure(p0)


def test_plateau_scale_missing_raises():
    opt = optim.momentum(0.1)
    with pytest.raises(ValueError, match="plateau"):
        optim.set_plateau_scale(opt.init(_quadratic_params()), 0.5)


def test_adagrad_matches_formula_and_descends():
    opt = optim.adagrad(0.5, initial_accumulator=0.1)
    p = {"a": {"w": jnp.asarray(2.0)}}
    state = opt.init(p)
    np.testing.assert_allclose(state["a"]["w"], 0.1)
    g = {"a": {"w": jnp.asarray(1.0)}}
    p1, s1 = opt.update(g, state, p, jnp.asarray(0))
    # acc = 0.1 + 1 = 1.1; w = 2 - 0.5 * 1/sqrt(1.1)
    np.testing.assert_allclose(float(p1["a"]["w"]),
                               2.0 - 0.5 / np.sqrt(1.1), rtol=1e-6)
    np.testing.assert_allclose(float(s1["a"]["w"]), 1.1, rtol=1e-6)
    # registry + convergence on the quadratic
    opt = optim.make_optimizer("adagrad", 1.0)
    params = _quadratic_params()
    state = opt.init(params)
    for step in range(200):
        params, state = opt.update(_grad(params), state, params,
                                   jnp.asarray(step))
    n = float(sum(jnp.sum(x ** 2) for b in params.values()
                  for x in b.values()))
    assert n < 0.05


def test_with_frozen_freezes_by_prefix_and_moments_stay_at_rest():
    params = {"backbone": {"w": jnp.asarray([1.0, 2.0])},
              "head": {"w": jnp.asarray([3.0])}}
    grads = {"backbone": {"w": jnp.asarray([1.0, 1.0])},
             "head": {"w": jnp.asarray([1.0])}}
    opt = optim.with_frozen(optim.momentum(0.1, 0.9), ["backbone"])
    state = opt.init(params)
    p, state = opt.update(grads, state, params, jnp.asarray(0))
    np.testing.assert_array_equal(p["backbone"]["w"], [1.0, 2.0])  # frozen
    assert float(p["head"]["w"][0]) < 3.0                          # trains
    # frozen momentum buffer accumulated nothing
    np.testing.assert_array_equal(state["backbone"]["w"], [0.0, 0.0])
    # several more steps: frozen leaves bit-identical
    for i in range(1, 4):
        p, state = opt.update(grads, state, p, jnp.asarray(i))
    np.testing.assert_array_equal(p["backbone"]["w"], [1.0, 2.0])

    # predicate form + jit
    opt2 = optim.with_frozen(optim.sgd(0.1),
                             lambda path, p: p.size > 1)
    s2 = opt2.init(params)
    p2, _ = jax.jit(lambda g, s, p: opt2.update(g, s, p, jnp.asarray(0))
                    )(grads, s2, params)
    np.testing.assert_array_equal(p2["backbone"]["w"], [1.0, 2.0])
    assert float(p2["head"]["w"][0]) < 3.0


def test_frozen_grads_excluded_from_clip_norm():
    """recipes composition: freeze wraps OUTSIDE clipping, so a huge
    frozen-backbone gradient must not scale down the head's update."""
    from myconvnet_tpu import recipes

    opt = recipes.make_optimizer(dict(name="sgd", lr=0.1,
                                      clip_norm=1.0,
                                      freeze=["backbone"]))
    params = {"backbone": {"w": jnp.zeros(4)}, "head": {"w": jnp.zeros(2)}}
    grads = {"backbone": {"w": jnp.full(4, 1e6)},   # would dominate norm
             "head": {"w": jnp.asarray([0.3, 0.4])}}  # norm 0.5 < clip
    state = opt.init(params)
    p, _ = opt.update(grads, state, params, jnp.asarray(0))
    np.testing.assert_array_equal(p["backbone"]["w"], 0.0)
    # head unclipped: delta == -lr * g exactly
    np.testing.assert_allclose(np.asarray(p["head"]["w"]),
                               [-0.03, -0.04], rtol=1e-5)


def test_frozen_weight_decay_moments_at_rest():
    """ADVICE r1: with freeze, the inner optimizer's weight decay must
    also skip frozen leaves — otherwise wd*p accumulates phantom
    momentum for frozen subtrees.  make_optimizer composes the frozen
    prefixes into weight_decay_exclude."""
    from myconvnet_tpu import recipes

    opt = recipes.make_optimizer(dict(name="momentum", lr=0.1,
                                      weight_decay=0.1,
                                      freeze=["backbone"]))
    params = {"backbone": {"w": jnp.asarray([2.0, 4.0])},
              "head": {"w": jnp.asarray([3.0])}}
    grads = {"backbone": {"w": jnp.asarray([1.0, 1.0])},
             "head": {"w": jnp.asarray([1.0])}}
    state = opt.init(params)
    p = params
    for i in range(3):
        p, state = opt.update(grads, state, p, jnp.asarray(i))
    np.testing.assert_array_equal(p["backbone"]["w"], [2.0, 4.0])
    # the frozen momentum buffer is EXACTLY zero (no wd*p leakage);
    # momentum state mirrors the param tree, so index it directly
    np.testing.assert_array_equal(np.asarray(state["backbone"]["w"]),
                                  [0.0, 0.0])
    # head decays + trains normally
    assert float(p["head"]["w"][0]) < 3.0


def test_lookahead_sync_semantics():
    """Slow weights move slow_step toward fast every sync_period steps
    and the fast weights reset onto them (Zhang et al.)."""
    p = {"w": jnp.asarray([0.0])}
    g = {"w": jnp.asarray([1.0])}
    opt = optim.with_lookahead(optim.sgd(0.1), sync_period=3,
                               slow_step=0.5)
    s = opt.init(p)
    traj = []
    for i in range(6):
        p, s = opt.update(g, s, p, jnp.asarray(i))
        traj.append(float(p["w"][0]))
    # inner sgd alone: -0.1 per step.  After step 3 (fast=-0.3):
    # slow = 0 + 0.5*(-0.3) = -0.15, fast resets to -0.15.
    np.testing.assert_allclose(traj[:3], [-0.1, -0.2, -0.15], atol=1e-6)
    # steps 4,5 continue from -0.15; step 6 syncs again:
    # fast = -0.45, slow = -0.15 + 0.5*(-0.3) = -0.30
    np.testing.assert_allclose(traj[3:], [-0.25, -0.35, -0.30], atol=1e-6)


def test_lookahead_jits_and_registry():
    from myconvnet_tpu import recipes
    opt = recipes.make_optimizer(dict(name="momentum", lr=0.1,
                                      lookahead=5))
    p = {"a": {"w": jnp.ones((4,))}}
    s = opt.init(p)
    step = jax.jit(lambda g, s, p, i: opt.update(g, s, p, i))
    g = {"a": {"w": jnp.ones((4,))}}
    for i in range(7):
        p, s = step(g, s, p, jnp.asarray(i))
    assert np.isfinite(np.asarray(p["a"]["w"])).all()
    assert float(p["a"]["w"][0]) < 1.0


def test_frozen_predicate_string_is_one_prefix():
    """freeze='backbone' (a bare string) must mean ONE prefix, not a
    set of single-character prefixes."""
    pred = optim.as_frozen_predicate("backbone")
    assert pred("backbone/conv/w", None)
    assert not pred("classifier/w", None)   # 'c' must NOT match
