"""GSPMD data/model parallelism on the 8-virtual-device CPU mesh
(SURVEY.md §4 'distributed without a real cluster')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.data.pipeline import ArraySource, DataSet
from myconvnet_tpu.parallel import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                                    local_batch_size, make_mesh,
                                    param_sharding, shard_batch)
from myconvnet_tpu.subsets import cifar10
from myconvnet_tpu.train import optim
from myconvnet_tpu.train.trainer import Trainer, init_train_state
from myconvnet_tpu.train.losses import softmax_cross_entropy


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {DATA_AXIS: 8, MODEL_AXIS: 1}
    mesh2 = make_mesh(n_model=2)
    assert mesh2.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_model=2)
    assert local_batch_size(mesh2, 64) == 16
    with pytest.raises(ValueError):
        local_batch_size(mesh2, 63)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    x = np.zeros((16, 4, 4, 3), np.float32)
    sx = shard_batch(mesh, (x,))[0]
    assert sx.sharding.spec == P(DATA_AXIS)
    assert len(sx.addressable_shards) == 8
    assert sx.addressable_shards[0].data.shape == (2, 4, 4, 3)


def test_param_sharding_rules():
    mesh = make_mesh(n_model=2)
    params = {
        "big": {"w": jnp.zeros((512, 1024))},     # shardable
        "tiny": {"w": jnp.zeros((3, 3, 4, 8))},   # too small -> replicated
        "odd": {"w": jnp.zeros((2048, 1001))},    # 1001 % 2 -> replicated
    }
    sh = param_sharding(mesh, params)
    assert sh["big"]["w"].spec == P(None, MODEL_AXIS)
    assert sh["tiny"]["w"].spec == P()
    assert sh["odd"]["w"].spec == P()


def test_dp_train_step_matches_single_device():
    """The GSPMD-sharded step must compute the same update as unsharded."""
    mesh = make_mesh()

    def fwd(x, train=False):
        return models.smallnet(x, 4, train=train, width=8, dropout_rate=0.0)

    model = transform(fwd)
    opt = optim.sgd(0.1)
    rng = jax.random.key(0)
    imgs, labels = cifar10.synthetic_subset(16, 0)
    x = imgs.astype(np.float32) / 255.0
    y = labels % 4

    def make_state():
        return init_train_state(model, opt, rng,
                                jnp.zeros((16, 32, 32, 3)))

    def loss_fn(p, s, key, x, y):
        logits, s2 = model.apply(p, s, key, x, True)
        return softmax_cross_entropy(logits, y), s2

    @jax.jit
    def step(state, x, y):
        (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.model_state, None, x, y)
        new_p, new_o = opt.update(g, state.opt_state, state.params,
                                  state.step)
        return new_p, l

    # single-device reference
    p_ref, loss_ref = step(make_state(), jnp.asarray(x), jnp.asarray(y))

    # sharded: batch over 8 devices, params replicated
    xs, ys = shard_batch(mesh, (jnp.asarray(x), jnp.asarray(y)))
    state = make_state()
    state = jax.device_put(state, NamedSharding(mesh, P()))
    p_sh, loss_sh = step(state, xs, ys)

    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-5)
    for scope in p_ref:
        for name in p_ref[scope]:
            np.testing.assert_allclose(
                p_sh[scope][name], p_ref[scope][name], rtol=1e-4,
                atol=1e-5)


def test_trainer_with_mesh_runs():
    mesh = make_mesh()

    def fwd(x, train=False):
        return models.smallnet(x, 10, train=train, width=8,
                               dropout_rate=0.0)

    model = transform(fwd)
    opt = optim.momentum(0.05, 0.9)
    trainer = Trainer(model=model, optimizer=opt,
                      loss_fn=softmax_cross_entropy, mesh=mesh)
    trainer.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((16, 32, 32, 3)))
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, P()))
    ds = DataSet(ArraySource(*cifar10.synthetic_subset(64, 0)))
    losses = []
    orig = trainer.logger.log
    trainer.logger.log = lambda s, m: losses.append(m.get("loss"))
    state = trainer.fit(state, ds.train_iter(16, prefetch=0),
                        total_steps=12)
    assert int(state.step) == 12
    assert losses and losses[-1] is not None


def test_model_axis_sharded_dense_matches():
    """2-D mesh: model-axis-sharded wide dense layer == replicated math."""
    mesh = make_mesh(n_model=2)
    w = jax.random.normal(jax.random.key(0), (512, 1024))
    x = jax.random.normal(jax.random.key(1), (16, 512))

    @jax.jit
    def f(x, w):
        return jnp.dot(x, w, precision="highest")

    ref = f(x, w)
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None)))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, MODEL_AXIS)))
    out = f(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_gan_step_sharded_matches_single_device():
    """The fused dual-optimizer GAN step under batch sharding must match
    the unsharded update (GSPMD covers the GAN path too)."""
    from myconvnet_tpu import models
    from myconvnet_tpu.train import gan

    mesh = make_mesh()
    gen = transform(lambda z, train: models.dcgan_generator(
        z, train=train, image_size=16, base_features=32))
    disc = transform(lambda x, train: models.dcgan_discriminator(
        x, train=train, base_features=16))
    g_opt = optim.adam(2e-4, b1=0.5)
    d_opt = optim.adam(2e-4, b1=0.5)

    def make_state():
        return gan.init_gan_state(gen, disc, g_opt, d_opt,
                                  jax.random.key(0), jnp.zeros((8, 32)),
                                  (jnp.zeros((8, 16, 16, 3)),))

    step = gan.make_dcgan_step(gen, disc, g_opt, d_opt, latent_dim=32)
    real = jax.random.uniform(jax.random.key(1), (8, 16, 16, 3)) * 2 - 1

    ref_state, ref_m = step(make_state(), real)
    ref_g = jax.tree.map(np.asarray, ref_state.g_params)

    sh_state = jax.device_put(make_state(), NamedSharding(mesh, P()))
    real_sh = shard_batch(mesh, (real,))[0]
    out_state, out_m = step(sh_state, real_sh)
    np.testing.assert_allclose(float(out_m["d_loss"]),
                               float(ref_m["d_loss"]), rtol=1e-4)
    for scope in ref_g:
        for name in ref_g[scope]:
            np.testing.assert_allclose(
                np.asarray(out_state.g_params[scope][name]),
                ref_g[scope][name], rtol=2e-4, atol=2e-5)


def test_gspmd_spatial_partitioning_matches_single_device():
    """Input sharded (data=4, H over model=2): XLA's SPMD partitioner
    inserts the conv halo exchanges; the full train step (ResNet block
    stack at tiny size) must match unsharded numerics."""
    from myconvnet_tpu.parallel.mesh import spatial_input_sharding

    mesh = make_mesh(4, 2)

    def fwd(x, train=False):
        return models.smallnet(x, 10, train=train, width=8,
                               dropout_rate=0.0)

    model = transform(fwd)
    opt = optim.momentum(0.1, 0.9)
    x = np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32)
    y = (np.arange(8) % 10).astype(np.int32)

    def one_step(sharding):
        state = init_train_state(model, opt, jax.random.key(0),
                                 jnp.zeros((8, 16, 16, 3)))
        xb = jnp.asarray(x) if sharding is None else jax.device_put(
            jnp.asarray(x), sharding)

        def step(state, xb, yb):
            def loss_fn(p, s):
                logits, ns = model.apply(p, s, None, xb, True)
                return softmax_cross_entropy(logits, yb), ns
            (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.model_state)
            new_p, new_o = opt.update(g, state.opt_state, state.params,
                                      state.step)
            return state._replace(params=new_p, model_state=ns,
                                  opt_state=new_o,
                                  step=state.step + 1), l

        new_state, loss = jax.jit(step)(state, xb, jnp.asarray(y))
        return float(loss), jax.device_get(new_state.params)

    l_ref, p_ref = one_step(None)
    l_sp, p_sp = one_step(spatial_input_sharding(mesh))
    np.testing.assert_allclose(l_sp, l_ref, rtol=1e-5)
    for scope in p_ref:
        for name in p_ref[scope]:
            np.testing.assert_allclose(p_sp[scope][name],
                                       p_ref[scope][name], rtol=1e-4,
                                       atol=1e-6,
                                       err_msg=f"{scope}/{name}")


def test_trainer_spatial_sharding_matches_plain():
    """Trainer(spatial=True) on a (4,2) mesh: same losses as meshless
    training for several steps (paired-mask batch shards rows too)."""
    from myconvnet_tpu.data.augment import AugmentConfig
    from myconvnet_tpu.data.augment import augment_train_pair

    mesh = make_mesh(4, 2)
    cfg = AugmentConfig(out_hw=(16, 16), area_range=None, flip=False)

    def fwd(x, train=False):
        return models.smallnet(x, 4, train=train, width=8,
                               dropout_rate=0.0)

    rng = np.random.RandomState(7)
    x = rng.randint(0, 256, (8, 16, 16, 3), np.uint8)
    y = (np.arange(8) % 4).astype(np.int32)

    def run(mesh_arg, spatial):
        model = transform(fwd)
        opt = optim.momentum(0.05, 0.9)
        t = Trainer(model=model, optimizer=opt,
                    loss_fn=softmax_cross_entropy, mesh=mesh_arg,
                    spatial=spatial,
                    augment_fn=lambda k, xx, yy: (
                        jnp.asarray(xx, jnp.float32) / 255.0, yy))
        t.logger.stdout = False
        state = init_train_state(model, opt, jax.random.key(0),
                                 jnp.zeros((8, 16, 16, 3)))
        losses = []
        for i in range(3):
            batch = t.shard_batch((jnp.asarray(x), jnp.asarray(y)))
            state, m = t._train_step(state, batch)
            losses.append(float(m["loss"]))
        return losses

    l_plain = run(None, False)
    l_spatial = run(mesh, True)
    np.testing.assert_allclose(l_spatial, l_plain, rtol=1e-4)


@pytest.mark.parametrize("seg_model", ["unet", "fcn"])
@pytest.mark.slow
def test_new_segmenters_spatial_sharding_matches_plain(seg_model):
    """U-Net / FCN under Trainer(spatial=True): H-sharded training must
    reproduce the unsharded losses (the upsample matmuls and pool
    windows cross shard boundaries, so GSPMD has to insert the right
    collectives)."""
    from myconvnet_tpu.train.losses import pixel_cross_entropy

    mesh = make_mesh(4, 2)

    if seg_model == "unet":
        def fwd(x, train=False):
            return models.unet(x, 4, train=train, base_features=4,
                               depth=2)
    else:
        def fwd(x, train=False):
            return models.fcn(x, 4, train=train, backbone_depth=18,
                              head_features=8, dropout_rate=0.0)

    rng = np.random.RandomState(11)
    x = rng.rand(8, 16, 16, 3).astype(np.float32)
    y = rng.randint(0, 4, (8, 16, 16)).astype(np.int32)

    def run(mesh_arg, spatial):
        model = transform(fwd)
        opt = optim.momentum(0.05, 0.9)
        t = Trainer(model=model, optimizer=opt,
                    loss_fn=pixel_cross_entropy, mesh=mesh_arg,
                    spatial=spatial)
        t.logger.stdout = False
        state = init_train_state(model, opt, jax.random.key(0),
                                 jnp.zeros((8, 16, 16, 3)))
        losses = []
        for i in range(2):
            batch = t.shard_batch((jnp.asarray(x), jnp.asarray(y)))
            state, m = t._train_step(state, batch)
            losses.append(float(m["loss"]))
        return losses

    l_plain = run(None, False)
    l_spatial = run(mesh, True)
    np.testing.assert_allclose(l_spatial, l_plain, rtol=1e-4)


# ------------------------------------------------------------------
# Checkpoint resharding (round 2, VERDICT r1 next #3): save under one
# mesh, restore under another, training continues IDENTICALLY.
# ------------------------------------------------------------------

def _wide_model():
    from myconvnet_tpu import nn
    from myconvnet_tpu.core import transform

    def fwd(x, train=False):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.dense(x, 512, name="wide"))  # sharded on (.,2)
        return nn.dense(x, 10, name="logits")

    return transform(fwd)


def _place(state, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    return state._replace(
        params=jax.tree.map(jax.device_put, state.params,
                            param_sharding(mesh, state.params)),
        model_state=jax.device_put(state.model_state, repl),
        opt_state=jax.tree.map(jax.device_put, state.opt_state,
                               param_sharding(mesh, state.opt_state)),
        step=jax.device_put(state.step, repl),
        rng=jax.device_put(state.rng, repl),
    )


def _reshard_setup():
    from myconvnet_tpu.train import optim
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    from myconvnet_tpu.train.trainer import init_train_state

    model = _wide_model()
    opt = optim.momentum(0.05, 0.9, weight_decay=1e-4)

    def train_step(state, x, y):
        def loss_fn(params):
            logits, _ = model.apply(params, state.model_state, None,
                                    x, False)
            return softmax_cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_p, new_o = opt.update(grads, state.opt_state, state.params,
                                  state.step)
        return state._replace(params=new_p, opt_state=new_o,
                              step=state.step + 1), loss

    step = jax.jit(train_step)
    state0 = init_train_state(model, opt, jax.random.key(0),
                              jnp.zeros((8, 16, 16, 3)))
    rng = np.random.RandomState(0)
    batches = [(jnp.asarray(rng.randn(8, 16, 16, 3).astype(np.float32)),
                jnp.asarray(rng.randint(0, 10, 8)))
               for _ in range(4)]
    return step, state0, batches


def _run_steps(step, state, mesh, batches):
    losses = []
    for x, y in batches:
        xs, ys = shard_batch(mesh, (x, y))
        state, loss = step(state, xs, ys)
        losses.append(float(loss))
    return state, losses


@pytest.mark.slow
def test_checkpoint_reshard_npz():
    """Train under a (4,2) mesh (wide head REALLY sharded over model),
    save the npz checkpoint, restore under an (8,1) mesh: the loss
    trajectory continues exactly as the uninterrupted run."""
    import tempfile

    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib

    step, state0, batches = _reshard_setup()
    mesh_a = make_mesh(4, 2)
    mesh_b = make_mesh(8, 1)

    # the wide layer is genuinely sharded under mesh A
    spec = param_sharding(mesh_a, state0.params)["wide"]["w"].spec
    assert tuple(spec)[-1] == "model"

    sa = _place(state0, mesh_a)
    sa, _ = _run_steps(step, sa, mesh_a, batches[:2])

    with tempfile.TemporaryDirectory() as d:
        ckpt_lib.save_checkpoint(d, int(sa.step), sa._asdict())

        # uninterrupted reference: continue under mesh A
        _, ref = _run_steps(step, sa, mesh_a, batches[2:])

        # resharded continuation: restore under mesh B
        template = jax.tree.map(np.asarray, state0._asdict())
        restored = ckpt_lib.restore_checkpoint(d, template)
        sb = _place(type(state0)(**restored), mesh_b)
        _, got = _run_steps(step, sb, mesh_b, batches[2:])

    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_checkpoint_reshard_orbax():
    """Same resharding contract through the Orbax backend: restore ONTO
    the new mesh's shardings directly (each host reads its own shards —
    the pod-scale path)."""
    pytest.importorskip("orbax.checkpoint")
    import tempfile

    from jax.sharding import NamedSharding, PartitionSpec as P

    from myconvnet_tpu.ckpt import orbax_io

    step, state0, batches = _reshard_setup()
    mesh_a = make_mesh(2, 4)   # heavier model axis: different layout
    mesh_b = make_mesh(8, 1)

    sa = _place(state0, mesh_a)
    sa, _ = _run_steps(step, sa, mesh_a, batches[:2])

    with tempfile.TemporaryDirectory() as d:
        orbax_io.save(d, int(sa.step), sa._asdict())
        _, ref = _run_steps(step, sa, mesh_a, batches[2:])

        # abstract target carrying mesh B shardings: orbax restores
        # each leaf directly onto its new sharding
        repl = NamedSharding(mesh_b, P())

        def abstract(leaf, sh):
            return jax.ShapeDtypeStruct(jnp.shape(leaf),
                                        jnp.asarray(leaf).dtype,
                                        sharding=sh)

        tmpl = state0._asdict()
        shardings = {
            "params": param_sharding(mesh_b, state0.params),
            "opt_state": param_sharding(mesh_b, state0.opt_state),
            "model_state": jax.tree.map(lambda _: repl,
                                        state0.model_state),
            "step": repl, "rng": repl,
        }
        target = jax.tree.map(abstract, tmpl, shardings)
        restored = orbax_io.restore(d, target)
        sb = type(state0)(**restored)
        for leaf in jax.tree.leaves(sb.params):
            assert leaf.sharding.mesh.shape == dict(mesh_b.shape)
        _, got = _run_steps(step, sb, mesh_b, batches[2:])

    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# -------------------------------------------------- ZeRO state sharding

def test_zero_state_sharding_rule():
    from myconvnet_tpu.parallel.mesh import zero_state_sharding
    mesh = make_mesh(8, 1)
    rule = zero_state_sharding(mesh, min_size=64)
    big = jnp.zeros((3, 3, 16, 64))     # 64 % 8 == 0 -> shard last dim
    spec = tuple(rule(big).spec)
    assert "data" in spec and spec[-1] == "data"
    small = jnp.zeros((4,))             # tiny -> replicated
    assert tuple(rule(small).spec) in ((), (None,))
    odd = jnp.zeros((129, 3, 3, 3))     # no divisible dim -> replicated
    assert "data" not in tuple(rule(odd).spec)


@pytest.mark.slow
def test_zero_sharded_training_matches_unsharded():
    """ZeRO optimizer-state sharding: identical loss trajectory, and
    each chip physically holds only 1/dp of the momentum."""
    from myconvnet_tpu.train import optim
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    from myconvnet_tpu.train.trainer import Trainer, init_train_state

    # the wide head (768x512 dense) clears zero_state_sharding's
    # min_size so its momentum really shards
    model = _wide_model()
    opt = optim.momentum(0.05, 0.9, weight_decay=1e-4)
    mesh = make_mesh(8, 1)

    def make(zero):
        t = Trainer(model=model, optimizer=opt,
                    loss_fn=softmax_cross_entropy, mesh=mesh,
                    zero_sharding=zero)
        t.logger.stdout = False
        s = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((16, 16, 16, 3)))
        return t, s

    rng = np.random.RandomState(0)
    batches = [(rng.rand(16, 16, 16, 3).astype(np.float32),
                rng.randint(0, 10, 16)) for _ in range(3)]

    def run(zero):
        t, s = make(zero)
        if zero:
            s = s._replace(opt_state=jax.tree.map(
                lambda x: jax.device_put(x, t._zero_rule(x)),
                s.opt_state))
        losses = []
        for x, y in batches:
            s, m = t._train_step(s, t.shard_batch(
                (jnp.asarray(x), jnp.asarray(y))))
            losses.append(float(m["loss"]))
        return s, losses

    s_ref, l_ref = run(False)
    s_z, l_z = run(True)
    np.testing.assert_allclose(l_z, l_ref, rtol=1e-5)
    # the big momentum leaves really shard: addressable shard < global
    sharded = [leaf for leaf in jax.tree.leaves(s_z.opt_state)
               if hasattr(leaf, "sharding")
               and "data" in str(leaf.sharding.spec)]
    assert sharded, "no optimizer-state leaf ended up sharded"
    for leaf in sharded:
        local = leaf.addressable_shards[0].data.size
        assert local * 8 == leaf.size, (local, leaf.size)
    # params agree too
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_detection_step_sharded_matches_single_device():
    """The fused SSD-style detection step (matching + multibox loss +
    hard-negative mining + update) under batch sharding must match the
    unsharded update — the fourth task family shards like the others."""
    from myconvnet_tpu import recipes

    # neg_pos_ratio large enough to mine EVERY negative: hard-negative
    # mining is an argsort cutoff, and at random init the per-anchor CE
    # values tie at float noise — sharded and unsharded programs fuse
    # differently, the knife-edge rank flips, and the comparison would
    # measure mining tie-breaks, not sharding correctness (mining's own
    # semantics are pinned in test_detection.py).  Saturating the cutoff
    # makes the compared step a continuous function.
    cfg = dict(task="detection", model="tinydet", dataset="voc",
               data_dir=None, num_classes=21, max_boxes=8, batch_size=8,
               total_steps=1, neg_pos_ratio=1000.0,
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=dict(kind="constant", lr=0.05)),
               augment=dict(flip=True), seed=0)

    ref_state, ref_step, _p, train_set, _v = recipes.build_detector(
        cfg, synthetic=True)
    batch = train_set.source.get_batch(np.arange(8))
    ref_out, ref_m = ref_step(ref_state, batch)
    ref_params = jax.tree.map(np.asarray, ref_out.params)

    mesh = make_mesh()
    sh_state, sh_step, predict, _t, val_set = recipes.build_detector(
        cfg, synthetic=True, mesh=mesh)
    sh_batch = shard_batch(mesh, batch)
    assert sh_batch[0].sharding.spec == P(DATA_AXIS)
    sh_out, sh_m = sh_step(sh_state, sh_batch)
    np.testing.assert_allclose(float(sh_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-4)
    # tolerance note: on a plain CPU client this comparison is BIT-EXACT
    # (verified standalone); under this environment's axon-sitecustomize
    # jax init the two programs' conv numerics jitter at ~5e-4 absolute
    # on first-step params (layout-dependent compiler noise, identical
    # diffs run-to-run).  1e-3 still catches any real sharding bug —
    # a wrong psum/mean diverges at 1e-1+.
    for scope in ref_params:
        for name in ref_params[scope]:
            np.testing.assert_allclose(
                np.asarray(sh_out.params[scope][name]),
                ref_params[scope][name], rtol=1e-3, atol=1e-3,
                err_msg=f"{scope}/{name}")

    # sharded eval path runs end-to-end
    ev = recipes.build_evaluator(cfg)
    score = recipes.evaluate_detection(sh_out, predict, val_set, 8, ev,
                                       mesh=mesh)
    assert 0.0 <= score <= 1.0
